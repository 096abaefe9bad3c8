"""Prescribed-motion literature cases (beyond the Schwartz-Colella disks).

Ports of /root/reference/BenchPhaseFlow/problems/scalar/PrescribedMotion/
Heat_1D_Moving_ConstantBC.jl, Heat_2D_Moving.jl and
JohansenColella/{FixedDirichlet,MovingDirichlet}.jl:

- 1D oscillating interval, u == 1 manufactured constant state: the moving
  space-time discretization must preserve it exactly.
- 2D oscillating circle R(t) = 1 + 0.5 sin(2 pi t), manufactured
  Phi = (1 + 0.5 sin(2 pi t)) cos(pi x) cos(pi y) with matching source.
- Johansen-Colella three-ellipse union on [-1.5,1.5]x[-1,1] with the
  Gaussian phi = 4/(5 pi (t+1)) exp(-r^2/(5(t+1))): fixed complement
  domain, and ellipses translating with per-ellipse velocities.
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


# ------------------------------------------------ 1D constant state

def run_heat1d_moving_constant(sizes=(16, 32, 64), t_end=0.1, verbose=True):
    """|x-0.5| < 0.25 + 0.05 sin(2 pi t / 0.2); u = 1 everywhere with
    Dirichlet 1 on border + interface must stay exactly 1."""
    r_mean, r_amp, period, center = 0.25, 0.05, 0.2, 0.5

    def body_st(x, t):
        return jnp.abs(x - center) - (r_mean
                                      + r_amp * jnp.sin(2 * np.pi * t
                                                        / period))

    rows = []
    worst = 0.0
    for n in sizes:
        h = 1.0 / n
        dt = 0.25 * h * h
        t_start = dt
        mesh = pt.Mesh((n,), (1.0,), (0.0,))
        cap0 = pt.compute_capacity(lambda x: body_st(x, t_start), mesh)
        ops0 = pt.make_diffusion_ops(cap0)
        bc1 = pt.Dirichlet(1.0)
        bc_b = pt.BorderConditions({"bottom": bc1, "top": bc1})
        phase = pt.Phase(cap0, ops0, 0.0, 1.0)
        u0 = (jnp.ones(mesh.np_shape), jnp.ones(mesh.np_shape))
        s = MovingDiffusionUnsteadyMono(phase, bc_b, bc1, dt, u0, mesh, "BE")
        s.solve(body_st, t_start, t_end)
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        tf = t_start + (K + 1) * dt
        cap_f = pt.compute_capacity(lambda x: body_st(x, tf), mesh,
                                    compute_centroids=False)
        V = np.asarray(cap_f.V)
        dev = float(np.abs(np.asarray(s.x[0])[V > 1e-12] - 1.0).max())
        worst = max(worst, dev)
        rows.append((n, dev))
        if verbose:
            print(f"pm_heat1d_constant n={n}: max|u-1|={dev:.3e}")
    return {"rows": rows, "worst": worst}


# ------------------------------------------- 2D oscillating circle

def run_heat2d_oscillating(sizes=(16, 32, 64), t_end=0.1, verbose=True):
    r_mean, r_amp, period = 1.0, 0.5, 1.0
    c, D = (2.0, 2.0), 1.0

    def radius(t):
        return r_mean + r_amp * jnp.sin(2 * np.pi * t / period)

    def body_st(x, y, t):
        return jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2) - radius(t)

    def phi(x, y, t):
        return ((1.0 + 0.5 * jnp.sin(2 * np.pi * t / period))
                * jnp.cos(np.pi * x) * jnp.cos(np.pi * y))

    def source(x, y, z, t):
        t1 = ((np.pi / period) * jnp.cos(2 * np.pi * t / period)
              * jnp.cos(np.pi * x) * jnp.cos(np.pi * y))
        t2 = 2 * np.pi ** 2 * D * phi(x, y, t)
        return t1 + t2

    def solve_one(n):
        h = 4.0 / n
        dt = 0.5 * h * h
        t_start = dt
        mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))
        cap0 = pt.compute_capacity(lambda x, y: body_st(x, y, t_start),
                                   mesh)
        ops0 = pt.make_diffusion_ops(cap0)
        bc0 = pt.Dirichlet(0.0)
        bc_i = pt.Dirichlet(lambda x, y, t: phi(x, y, t))
        bc_b = pt.BorderConditions({k: bc0 for k in
                                    ("left", "right", "top", "bottom")})
        phase = pt.Phase(cap0, ops0, source, D)
        C = cap0.C_om
        u0 = (jnp.asarray(phi(C[..., 0], C[..., 1], t_start)),
              jnp.zeros(mesh.np_shape))
        s = MovingDiffusionUnsteadyMono(phase, bc_b, bc_i, dt, u0, mesh,
                                        "BE")
        s.solve(body_st, t_start, t_end, p=8, s=2)
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        tf = t_start + (K + 1) * dt
        cap_f = pt.compute_capacity(lambda x, y: body_st(x, y, tf), mesh,
                                    compute_centroids=False)

        class V:
            x_omega = s.x[0]

        _, _, g, f, cc, e = pt.check_convergence(
            lambda x, y: phi(x, y, tf), V, cap_f, 2, verbose=False)
        return h, {"all": g, "full": f, "cut": cc, "empty": e}

    return convergence_study("pm_heat2d_oscillating", solve_one, sizes,
                             verbose)


# ------------------------------------- Johansen-Colella ellipse union

GAMMA = np.sqrt(2.0) / 15.0
ELLIPSES = ((-6 * GAMMA, -5 * GAMMA, 3 * GAMMA, 2 * GAMMA),
            (10 * GAMMA, -7 * GAMMA, 2 * GAMMA, 1 * GAMMA),
            (7 * GAMMA, 3 * GAMMA, 1.5 * GAMMA, 2 * GAMMA))
VELOCITIES = ((-0.10, 0.20), (-0.15, 0.15), (-0.20, 0.20))


def _union_level(x, y, t, moving):
    lvl = None
    for (px, qx, ax, bx), (vx, vy) in zip(ELLIPSES, VELOCITIES):
        if moving:
            px, qx = px + vx * t, qx + vy * t
        e = ((x - px) ** 2 / ax ** 2 + (y - qx) ** 2 / bx ** 2) - 1.0
        lvl = e if lvl is None else jnp.minimum(lvl, e)
    return lvl


def jc_exact(x, y, t):
    r2 = x * x + y * y
    return 4.0 / (5 * np.pi * (t + 1)) * jnp.exp(-r2 / (5 * (t + 1)))


def jc_source(x, y, z, t):
    r2 = x * x + y * y
    return (4.0 * (r2 - 5 * (t + 1)) / (125 * np.pi * (t + 1) ** 3)
            * jnp.exp(-r2 / (5 * (t + 1))))


def _jc_mesh(n):
    ny = max(2 * n // 3, 4)
    return pt.Mesh((n, ny), (3.0, 2.0), (-1.5, -1.0)), 2.0 / ny


def run_jc_fixed(sizes=(24, 48, 96), t_end=0.1, verbose=True):
    """Static complement-of-ellipses domain, Dirichlet data everywhere."""

    def solve_one(n):
        mesh, h = _jc_mesh(n)
        dt = 0.25 * h * h
        cap = pt.compute_capacity(
            lambda x, y: -_union_level(x, y, 0.0, False), mesh)
        ops = pt.make_diffusion_ops(cap)
        bc_ex = pt.Dirichlet(lambda x, y, t: jc_exact(x, y, t))
        bc_b = pt.BorderConditions({k: bc_ex for k in
                                    ("left", "right", "top", "bottom")})
        phase = pt.Phase(cap, ops, jc_source, 1.0)
        C = cap.C_om
        u0 = (jnp.asarray(jc_exact(C[..., 0], C[..., 1], 0.0)),
              jnp.zeros(mesh.np_shape))
        s = DiffusionUnsteadyMono(phase, bc_b, bc_ex, dt, u0, "CN")
        s.solve(t_end, method="bicgstab", tol=1e-11, maxiter=4000)
        _, _, g, f, c, e = pt.check_convergence(
            lambda x, y: jc_exact(x, y, t_end), s, cap, 2, verbose=False)
        return h, {"all": g, "full": f, "cut": c, "empty": e}

    return convergence_study("jc_fixed_dirichlet", solve_one, sizes,
                             verbose)


def run_jc_moving(sizes=(24, 48, 96), t_end=0.1, verbose=True):
    """Three translating ellipses (fluid inside them), Dirichlet data from
    the Gaussian exact solution; space-time capacities per step."""

    def body_st(x, y, t):
        return _union_level(x, y, t, True)

    def solve_one(n):
        mesh, h = _jc_mesh(n)
        dt = 0.75 * h * h
        t_start = dt
        cap0 = pt.compute_capacity(lambda x, y: body_st(x, y, t_start),
                                   mesh)
        ops0 = pt.make_diffusion_ops(cap0)
        bc_ex = pt.Dirichlet(lambda x, y, t: jc_exact(x, y, t))
        bc_b = pt.BorderConditions({k: bc_ex for k in
                                    ("left", "right", "top", "bottom")})
        phase = pt.Phase(cap0, ops0, jc_source, 1.0)
        C = cap0.C_om
        u0 = (jnp.asarray(jc_exact(C[..., 0], C[..., 1], t_start)),
              jnp.zeros(mesh.np_shape))
        s = MovingDiffusionUnsteadyMono(phase, bc_b, bc_ex, dt, u0, mesh,
                                        "BE")
        s.solve(body_st, t_start, t_end, p=8, s=2)
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        tf = t_start + (K + 1) * dt
        cap_f = pt.compute_capacity(lambda x, y: body_st(x, y, tf), mesh,
                                    compute_centroids=False)

        class V:
            x_omega = s.x[0]

        _, _, g, f, c, e = pt.check_convergence(
            lambda x, y: jc_exact(x, y, tf), V, cap_f, 2, verbose=False)
        return h, {"all": g, "full": f, "cut": c, "empty": e}

    return convergence_study("jc_moving_dirichlet", solve_one, sizes,
                             verbose)


if __name__ == "__main__":
    r1 = run_heat1d_moving_constant()
    rosc = run_heat2d_oscillating()
    rf = run_jc_fixed()
    rm = run_jc_moving()
    # constant state held to slab-quadrature tolerance, improving fast
    # under refinement (2.4e-5 -> 8.8e-9 over 16..64)
    assert r1["worst"] < 1e-4, r1
    devs = [d for _, d in r1["rows"]]
    assert all(devs[i + 1] < devs[i] for i in range(len(devs) - 1)), r1
    # 1.4 over 16->32, settling to ~1.05 with 64 included: the oscillating
    # front crosses cell faces every few steps and the slab reconstruction
    # is first-order there (the reference's own gate is !isnan(order))
    assert rosc["orders"]["all"] > 0.9, rosc["orders"]
    eo = rosc["err"]["all"]
    assert all(eo[i + 1] < eo[i] for i in range(len(eo) - 1)), eo
    # outer-border Dirichlet rows sit at cell centers (reference grid
    # semantics) -> O(h) global bias; the cut rows converge at 2nd order
    assert rf["orders"]["all"] > 0.8, rf["orders"]
    assert rf["orders"]["cut"] > 1.2, rf["orders"]
    e = rm["err"]["all"]
    assert e[-1] < e[0], e
    assert rm["orders"]["all"] > 0.8, rm["orders"]
    print("prescribed-motion suite green")
