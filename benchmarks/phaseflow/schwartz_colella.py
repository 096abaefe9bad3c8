"""Schwartz-Colella 3D sphere problems (Johansen-Colella problems 4-5).

Ports of /root/reference/BenchPhaseFlow/problems/scalar/johansenColella/
Problem4_SchwartzColella_Poisson3D.jl and Problem5_SchwartzColella_Heat3D.jl
(Schwartz, Barad, Colella & Ligocki, JCP 2006):

- P4: -Delta(phi) = 14 sin(x) sin(2y) sin(3z) inside a sphere of radius
  0.392 centered in the unit cube; exact phi = sin(x) sin(2y) sin(3z),
  Dirichlet on the embedded sphere.
- P5: transient heat with the self-similar Gaussian
  phi = 4/(5 pi (t+1)) exp(-r^2 / (5 (t+1))), source
  S = dphi/dt - Delta(phi), CN to Tend = 0.1 with dt = 0.25 dx^2.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

from benchmarks.phaseflow.harness import convergence_study, ensure_cpu_f64

ensure_cpu_f64()

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyMono, DiffusionUnsteadyMono

RADIUS = 0.392
CENTER = (0.5, 0.5, 0.5)


def sphere_body(x, y, z):
    return jnp.sqrt((x - CENTER[0]) ** 2 + (y - CENTER[1]) ** 2
                    + (z - CENTER[2]) ** 2) - RADIUS


def p4_exact(x, y, z):
    return jnp.sin(x) * jnp.sin(2 * y) * jnp.sin(3 * z)


def run_problem4(sizes=(16, 24, 32), verbose=True):
    def solve_one(n):
        mesh = pt.Mesh((n, n, n), (1.0, 1.0, 1.0), (0.0, 0.0, 0.0))
        cap = pt.compute_capacity(sphere_body, mesh)
        ops = pt.make_diffusion_ops(cap)
        bc0 = pt.Dirichlet(0.0)
        bc_b = pt.BorderConditions({k: bc0 for k in
                                    ("left", "right", "top", "bottom",
                                     "forward", "backward")})
        phase = pt.Phase(cap, ops,
                         lambda x, y, z: 14.0 * p4_exact(x, y, z), 1.0)
        s = DiffusionSteadyMono(phase, bc_b, pt.Dirichlet(
            lambda x, y, z: p4_exact(x, y, z)))
        s.solve(method="bicgstab", tol=1e-10, maxiter=4000)
        _, _, g, f, c, e = pt.check_convergence(p4_exact, s, cap, 2,
                                                verbose=False)
        return 1.0 / n, {"all": g, "full": f, "cut": c, "empty": e}

    return convergence_study("sc4_poisson3d_sphere", solve_one, sizes,
                             verbose)


def p5_exact(x, y, z, t):
    r2 = x * x + y * y + z * z
    return 4.0 / (5 * np.pi * (t + 1)) * jnp.exp(-r2 / (5 * (t + 1)))


def p5_source(x, y, z, t):
    r2 = x * x + y * y + z * z
    return (4.0 * (r2 + 5 * (t + 1)) / (125 * np.pi * (t + 1) ** 3)
            * jnp.exp(-r2 / (5 * (t + 1))))


def run_problem5(sizes=(16, 24, 32), t_end=0.1, verbose=True):
    def solve_one(n):
        mesh = pt.Mesh((n, n, n), (1.0, 1.0, 1.0), (0.0, 0.0, 0.0))
        cap = pt.compute_capacity(sphere_body, mesh)
        ops = pt.make_diffusion_ops(cap)
        bc_ex = pt.Dirichlet(lambda x, y, z, t: p5_exact(x, y, z, t))
        bc_b = pt.BorderConditions({k: bc_ex for k in
                                    ("left", "right", "top", "bottom",
                                     "forward", "backward")})
        phase = pt.Phase(cap, ops,
                         lambda x, y, z, t: p5_source(x, y, z, t), 1.0)
        C = cap.C_om
        u0w = p5_exact(C[..., 0], C[..., 1], C[..., 2], 0.0)
        u0 = (jnp.asarray(u0w), jnp.zeros(mesh.np_shape))
        dt = 0.25 / n ** 2
        s = DiffusionUnsteadyMono(phase, bc_b, bc_ex, dt, u0, "CN")
        s.solve(t_end, method="bicgstab", tol=1e-11, maxiter=2000)

        def u_ana(x, y, z):
            return p5_exact(x, y, z, t_end)

        _, _, g, f, c, e = pt.check_convergence(u_ana, s, cap, 2,
                                                verbose=False)
        return 1.0 / n, {"all": g, "full": f, "cut": c, "empty": e}

    return convergence_study("sc5_heat3d_sphere", solve_one, sizes, verbose)


if __name__ == "__main__":
    r4 = run_problem4()
    r5 = run_problem5()
    # P4's fitted order is ~1.4 over n=16..32 (pre-asymptotic: the cut-cell
    # error dominates and the sphere has O(10) cells across at n=16); the
    # reference's own gate for these cases is only !isnan(order).  Gate
    # super-linear convergence + monotone error decrease.
    assert r4["orders"]["all"] > 1.2, r4["orders"]
    assert r5["orders"]["all"] > 1.2, r5["orders"]
    for r in (r4, r5):
        e = r["err"]["all"]
        assert all(e[i + 1] < e[i] for i in range(len(e) - 1)), e
    print("OK")
