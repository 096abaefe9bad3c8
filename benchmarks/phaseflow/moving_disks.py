"""Schwartz-Colella prescribed-motion disk benchmarks + two-ring
connectivity.

Ports of /root/reference/BenchPhaseFlow/problems/scalar/PrescribedMotion/
SchwartzColella/{Expanding,Shrinking,Fixed}Disk.jl and
ConnectivityTwoCircles/TwoRingDiffusion.jl:

- Expanding/shrinking/fixed disk: heat equation on the moving domain
  r < 0.392 ± t (center (0.5,0.5)) with the manufactured Gaussian
  a(x,y,t) = 4/(5 pi (t+1)) exp(-(x²+y²)/(5(t+1))) — Dirichlet data and
  source from the exact solution, space-time slab capacities rebuilt per
  step inside jit; error at the final time against the final-radius
  capacity.
- Two-ring: transient diffusion on two DISCONNECTED regions (inner disk
  r < R1 plus the exterior of r > R2 inside the box), manufactured
  harmonic solution exp(-2 pi² t) sin(pi x) sin(pi y): exercises the
  multiply-connected masking.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

from benchmarks.phaseflow.harness import convergence_study, ensure_cpu_f64

ensure_cpu_f64()

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyMono
from penguin_tpu.solvers.moving_diffusion import MovingDiffusionUnsteadyMono

R0 = 0.392
CENTER = (0.5, 0.5)


def a_exact(x, y, t):
    r2 = x * x + y * y
    return 4.0 / (5 * np.pi * (t + 1)) * jnp.exp(-r2 / (5 * (t + 1)))


def a_source(x, y, z, t):
    r2 = x * x + y * y
    return (4.0 * (r2 - 5 * (t + 1)) / (125 * np.pi * (t + 1) ** 3)
            * jnp.exp(-r2 / (5 * (t + 1))))


def _run_disk(name, rate, sizes, t_end=0.1, verbose=True):
    """rate: +1 expanding, -1 shrinking, 0 fixed."""

    def body_st(x, y, t):
        r = jnp.sqrt((x - CENTER[0]) ** 2 + (y - CENTER[1]) ** 2)
        return r - (R0 + rate * t)

    def solve_one(n):
        mesh = pt.Mesh((n, n), (1.0, 1.0), (0.0, 0.0))
        dt = (1.0 / n) ** 2
        t_start = dt
        cap0 = pt.compute_capacity(lambda x, y: body_st(x, y, t_start), mesh)
        ops0 = pt.make_diffusion_ops(cap0)
        bc_ex = pt.Dirichlet(lambda x, y, z, t: a_exact(x, y, t))
        bc_b = pt.BorderConditions({k: bc_ex for k in
                                    ("left", "right", "top", "bottom")})
        phase = pt.Phase(cap0, ops0, a_source, 1.0)
        C = cap0.C_om
        u0 = (jnp.asarray(a_exact(C[..., 0], C[..., 1], t_start)),
              jnp.zeros(mesh.np_shape))
        s = MovingDiffusionUnsteadyMono(phase, bc_b, bc_ex, dt, u0, mesh,
                                        "BE")
        # p=8/s=2 (the static-capacity default): at n=64 the circle grazes
        # cell faces and p=6/s=1 slab quadrature mis-integrates those cut
        # cells by ~1e-3 relative, flooring the convergence (measured
        # 9.9e-4 -> 4.4e-5 L2 at n=64 from this one change)
        s.solve(body_st, t_start, t_end, p=8, s=2)
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        tf = t_start + (K + 1) * dt
        cap_f = pt.compute_capacity(lambda x, y: body_st(x, y, tf), mesh,
                                    compute_centroids=False)

        class V:  # check_convergence view of the final bulk field
            x_omega = s.x[0]

        _, _, g, f, c, e = pt.check_convergence(
            lambda x, y: a_exact(x, y, tf), V, cap_f, 2, verbose=False)
        return 1.0 / n, {"all": g, "full": f, "cut": c, "empty": e}

    return convergence_study(name, solve_one, sizes, verbose)


def run_expanding(sizes=(16, 32, 64), verbose=True):
    return _run_disk("sc_expanding_disk", +1.0, sizes, verbose=verbose)


def run_shrinking(sizes=(16, 32, 64), verbose=True):
    return _run_disk("sc_shrinking_disk", -1.0, sizes, verbose=verbose)


def run_fixed(sizes=(16, 32, 64), verbose=True):
    return _run_disk("sc_fixed_disk", 0.0, sizes, verbose=verbose)


def run_two_ring(sizes=(32, 64, 128), t_end=0.1, R1=0.31, R2=0.6,
                 verbose=True):
    def body(x, y):
        r = jnp.sqrt(x * x + y * y)
        return jnp.minimum(r - R1, R2 - r)

    def phi(x, y, t):
        return (jnp.exp(-2 * np.pi ** 2 * t) * jnp.sin(np.pi * x)
                * jnp.sin(np.pi * y))

    def solve_one(n):
        mesh = pt.Mesh((n, n), (2.0, 2.0), (-1.0, -1.0))
        cap = pt.compute_capacity(body, mesh)
        ops = pt.make_diffusion_ops(cap)
        bc_ex = pt.Dirichlet(lambda x, y, z, t: phi(x, y, t))
        bc_b = pt.BorderConditions({k: bc_ex for k in
                                    ("left", "right", "top", "bottom")})
        phase = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)
        C = cap.C_om
        u0 = (jnp.asarray(phi(C[..., 0], C[..., 1], 0.0)),
              jnp.zeros(mesh.np_shape))
        dt = 0.5 * (2.0 / n) ** 2
        s = DiffusionUnsteadyMono(phase, bc_b, bc_ex, dt, u0, "CN")
        s.solve(t_end, method="bicgstab", tol=1e-11, maxiter=2000)
        _, _, g, f, c, e = pt.check_convergence(
            lambda x, y: phi(x, y, t_end), s, cap, 2, verbose=False)
        return 2.0 / n, {"all": g, "full": f, "cut": c, "empty": e}

    return convergence_study("two_ring_diffusion", solve_one, sizes, verbose)


if __name__ == "__main__":
    from benchmarks.phaseflow.harness import fit_order

    re_ = run_expanding()
    rs = run_shrinking()
    rf = run_fixed()
    rt = run_two_ring()
    # Expanding disk: freshly-born cells carry an O(1) transient (the
    # reference's own BE fresh-cell closure, A_mono_unstead_diff_moving
    # block1 = Vn_1 + ..., has no mass row for Va=0 cells; its gate is
    # literally !isnan(order), ExpandingDisk.jl testset) — at n=64 the
    # final front sits 0.5h from the border and the last-born ring
    # dominates the L2.  Gate the converging 16->32 pair (order ~1.9) as
    # a strictly-stronger-than-reference check.
    o2 = fit_order(re_["h"][:2], re_["err"]["all"][:2])
    assert o2 > 0.9, (o2, re_["orders"])
    assert rs["orders"]["all"] > 0.9, rs["orders"]
    assert rf["orders"]["all"] > 0.9, rf["orders"]
    # two-ring: the O(h) border-center rows dominate the global norm
    # (domain [-1,1]^2, Dirichlet at cell centers); the cut-cell rows —
    # the connectivity machinery this case exists to exercise — converge
    # super-linearly (order ~2.3)
    assert rt["orders"]["all"] > 0.9, rt["orders"]
    assert rt["orders"]["cut"] > 1.5, rt["orders"]
    print("OK")
