"""Johansen-Colella star-domain Poisson problems 1-3.

Ports of /root/reference/BenchPhaseFlow/problems/scalar/johansenColella/
Problem1_PoissonConstant.jl, Problem2_PoissonVariable.jl and
Problem3_FlowerLaplace.jl (Johansen & Colella, JCP 1998):

- P1: -Delta(phi) = -7 r^2 cos(3 theta) inside the star
  r <= 0.30 + 0.15 cos(6 theta); exact phi = r^4 cos(3 theta).
- P2: same star with variable diffusivity D = 1 - r^2;
  f = -(7 r^2 - 15 r^4) cos(3 theta).
- P3: Laplace inside the flower r <= 0.25 + 0.05 cos(6 theta) with
  interface Dirichlet 1 — overshoot diagnostic (the discrete maximum
  principle on cut cells).
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

from benchmarks.phaseflow.harness import (convergence_study, ensure_cpu_f64,
                                          fit_order, write_csv)

ensure_cpu_f64()

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyMono

CENTER = (0.49, 0.5)


def _polar(x, y, c=CENTER):
    dx, dy = x - c[0], y - c[1]
    return dx * dx + dy * dy, jnp.arctan2(dy, dx)


def star_body(x, y):
    r2, th = _polar(x, y)
    return jnp.sqrt(r2) - (0.30 + 0.15 * jnp.cos(6 * th))


def exact_phi(x, y):
    r2, th = _polar(x, y)
    return r2 * r2 * jnp.cos(3 * th)


def _solve_star(n, source, diffusivity):
    mesh = pt.Mesh((n, n), (1.0, 1.0), (0.0, 0.0))
    cap = pt.compute_capacity(star_body, mesh)
    ops = pt.make_diffusion_ops(cap)
    bc0 = pt.Dirichlet(0.0)
    bc_b = pt.BorderConditions({k: bc0 for k in
                                ("left", "right", "top", "bottom")})
    phase = pt.Phase(cap, ops, source, diffusivity)
    s = DiffusionSteadyMono(phase, bc_b,
                            pt.Dirichlet(lambda x, y, z: exact_phi(x, y)))
    s.solve()
    _, _, g, f, c, e = pt.check_convergence(exact_phi, s, cap, 2,
                                            verbose=False)
    return 1.0 / n, {"all": g, "full": f, "cut": c, "empty": e}


def run_problem1(sizes=(16, 32, 64, 128), verbose=True):
    def src(x, y, z):
        r2, th = _polar(x, y)
        return -7.0 * r2 * jnp.cos(3 * th)

    return convergence_study("jc1_star_poisson",
                             lambda n: _solve_star(n, src, 1.0),
                             sizes, verbose)


def run_problem2(sizes=(16, 32, 64, 128), verbose=True):
    def src(x, y, z):
        r2, th = _polar(x, y)
        return -(7.0 * r2 - 15.0 * r2 * r2) * jnp.cos(3 * th)

    def D(x, y, z):
        r2, _ = _polar(x, y)
        return 1.0 - r2

    return convergence_study("jc2_star_poisson_variable",
                             lambda n: _solve_star(n, src, D),
                             sizes, verbose)


def flower_body(x, y):
    dx, dy = x - 0.5, y - 0.5
    r = jnp.sqrt(dx * dx + dy * dy)
    th = jnp.arctan2(dy, dx)
    return r - (0.25 + 0.05 * jnp.cos(6 * th))


def run_problem3(sizes=(32, 64, 128), verbose=True):
    """Flower Laplace: solution must stay in [0, 1]; report max overshoot
    over cut cells (Problem3_FlowerLaplace.jl logs overshoot stats)."""
    rows = []
    worst = 0.0
    for n in sizes:
        mesh = pt.Mesh((n, n), (1.0, 1.0), (0.0, 0.0))
        cap = pt.compute_capacity(flower_body, mesh)
        ops = pt.make_diffusion_ops(cap)
        bc0 = pt.Dirichlet(0.0)
        bc_b = pt.BorderConditions({k: bc0 for k in
                                    ("left", "right", "top", "bottom")})
        phase = pt.Phase(cap, ops, lambda x, y, z: 0.0, 1.0)
        s = DiffusionSteadyMono(phase, bc_b, pt.Dirichlet(1.0))
        s.solve()
        vals = np.asarray(s.x_omega)
        ct = np.asarray(cap.cell_types)
        cut = vals[ct == -1]
        inside = vals[ct != 0]
        over = float(max(inside.max() - 1.0, 0.0))
        under = float(max(-inside.min(), 0.0))
        # threshold ABOVE the Krylov tolerance floor: the solve stops at
        # its requested relative residual (~1e-10 -> solution error
        # ~1e-9), so a roundoff-level 1e-12 count threshold measures the
        # solver's stopping point, not the discretization's maximum
        # principle (the round-4 early-exit GMRES exposed this: the old
        # fixed-depth cycles oversolved to ~1e-12 by accident)
        pct = 100.0 * float((cut > 1.0 + 1e-7).sum()) / max(cut.size, 1)
        worst = max(worst, over, under)
        rows.append((n, float(inside.max()), float(inside.min()),
                     cut.size, pct))
        if verbose:
            print(f"jc3 n={n}: max={inside.max():.6f} min={inside.min():.6f}"
                  f" cut={cut.size} overshoot%={pct:.2f}")
    if verbose:  # tests run reduced sizes; don't clobber the full CSV
        write_csv("jc3_flower_laplace", rows,
                  ["n", "max", "min", "cut_cells", "overshoot_pct"])
    return {"worst_violation": worst, "rows": rows}


if __name__ == "__main__":
    r1 = run_problem1()
    r2 = run_problem2()
    r3 = run_problem3()
    assert r1["orders"]["all"] > 1.5, r1["orders"]
    assert r2["orders"]["all"] > 1.5, r2["orders"]
    assert r3["worst_violation"] < 0.05, r3["worst_violation"]
    print("OK")
