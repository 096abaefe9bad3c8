"""Schwartz-Colella 3D prescribed-motion spheres.

Ports of /root/reference/BenchPhaseFlow/problems/scalar/PrescribedMotion/
SchwartzColella3D/{Expanding,Fixed,Shrinking}Sphere.jl: the 3D analogue
of the moving-disk suite — a sphere of initial radius 0.392 centered at
(0.5, 0.5, 0.5) whose radius grows/stays/shrinks at unit rate, with the
radial Gaussian a(x,t) = 4/(5 pi (t+1)) exp(-r^2/(5(t+1))) imposed as
Dirichlet data on the moving boundary and the matching source; errors
measured at Tend = 0.1 against the analytic field on the final geometry.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

from benchmarks.phaseflow.harness import convergence_study, ensure_cpu_f64

ensure_cpu_f64()

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_diffusion import MovingDiffusionUnsteadyMono

R0 = 0.392
CENTER = (0.5, 0.5, 0.5)


def a_exact(x, y, z, t):
    r2 = x * x + y * y + z * z
    return 4.0 / (5 * np.pi * (t + 1)) * jnp.exp(-r2 / (5 * (t + 1)))


def a_source(x, y, z, t):
    r2 = x * x + y * y + z * z
    return (4.0 * (r2 + 5 * (t + 1)) / (125 * np.pi * (t + 1) ** 3)
            * jnp.exp(-r2 / (5 * (t + 1))))


def _run_sphere(name, rate, sizes, t_end=0.1, verbose=True):
    def body_st(x, y, z, t):
        r = jnp.sqrt((x - CENTER[0]) ** 2 + (y - CENTER[1]) ** 2
                     + (z - CENTER[2]) ** 2)
        return r - (R0 + rate * t)

    def solve_one(n):
        mesh = pt.Mesh((n, n, n), (1.0, 1.0, 1.0), (0.0, 0.0, 0.0))
        h = 1.0 / n
        dt = h * h
        t_start = dt
        cap0 = pt.compute_capacity(
            lambda x, y, z: body_st(x, y, z, t_start), mesh)
        ops0 = pt.make_diffusion_ops(cap0)
        bc_ex = pt.Dirichlet(lambda x, y, z, t: a_exact(x, y, z, t))
        bc_b = pt.BorderConditions({k: bc_ex for k in
                                    ("left", "right", "top", "bottom",
                                     "forward", "backward")})
        phase = pt.Phase(cap0, ops0, a_source, 1.0)
        C = cap0.C_om
        u0 = (jnp.asarray(a_exact(C[..., 0], C[..., 1], C[..., 2],
                                  t_start)),
              jnp.zeros(mesh.np_shape))
        s = MovingDiffusionUnsteadyMono(phase, bc_b, bc_ex, dt, u0, mesh,
                                        "BE")
        s.solve(body_st, t_start, t_end, p=6, s=2)
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        tf = t_start + (K + 1) * dt
        cap_f = pt.compute_capacity(
            lambda x, y, z: body_st(x, y, z, tf), mesh,
            compute_centroids=False)

        class V:
            x_omega = s.x[0]

        _, _, g, f, c, e = pt.check_convergence(
            lambda x, y, z: a_exact(x, y, z, tf), V, cap_f, 2,
            verbose=False)
        return h, {"all": g, "full": f, "cut": c, "empty": e}

    return convergence_study(name, solve_one, sizes, verbose)


def run_expanding(sizes=(8, 12, 16), verbose=True):
    return _run_sphere("sc3d_expanding_sphere", +1.0, sizes,
                       verbose=verbose)


def run_shrinking(sizes=(8, 12, 16), verbose=True):
    return _run_sphere("sc3d_shrinking_sphere", -1.0, sizes,
                       verbose=verbose)


def run_fixed(sizes=(8, 12, 16), verbose=True):
    return _run_sphere("sc3d_fixed_sphere", 0.0, sizes, verbose=verbose)


if __name__ == "__main__":
    for run in (run_expanding, run_shrinking, run_fixed):
        r = run()
        e = r["err"]["all"]
        assert e[-1] < e[0], (run.__name__, e)
        assert r["orders"]["all"] > 0.8, (run.__name__, r["orders"])
    print("SchwartzColella3D sphere suite green")
