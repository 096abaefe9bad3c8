"""Neumann mass-conservation literature case — reference
BenchPhaseFlow/problems/scalar/Scalar_2D_Diffusion_Heat_NeumannMass.jl.

Transient diffusion inside a circle with homogeneous Neumann on the
immersed boundary and the outer box, u0 == 1, f == 0.  The volume
integral of u must stay constant to the Krylov floor at every BE step
(the all-Neumann operator's null space makes this a sensitive
conservation test of the divergence-form assembly), and the constant
state itself must be preserved.  (The companion moving constant-BC case
Heat_1D_Moving_ConstantBC.jl is ported in prescribed_motion.py as
run_heat1d_moving_constant.)

Run:  python benchmarks/phaseflow/conservation.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

from benchmarks.phaseflow.harness import ensure_cpu_f64, write_csv

ensure_cpu_f64()

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyMono


def run_neumann_mass_2d(n=64, radius=0.31, center=(0.51, 0.52), t_end=0.1,
                        verbose=True):
    """Returns (relative mass drift over the run, max |u - 1| at t_end)."""
    lx = ly = 1.0
    mesh = pt.Mesh((n, n), (lx, ly), (0.0, 0.0))
    body = pt.geometry.circle(center, radius)
    cap = pt.compute_capacity(body, mesh, p=4, s=1)
    ops = pt.make_diffusion_ops(cap)
    phase = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)

    nz = pt.Neumann(0.0)
    bc_b = pt.BorderConditions({k: nz for k in
                                ("left", "right", "top", "bottom")})
    ones = jnp.ones(mesh.np_shape)
    dt = 0.25 * (lx / n) ** 2
    s = DiffusionUnsteadyMono(phase, bc_b, nz, dt, (ones, ones), "BE")
    s.solve(t_end, method="bicgstab", tol=1e-12, keep_states=True)

    V = np.asarray(cap.V)
    masses = [float((V * np.asarray(st[0])).sum()) for st in s.states]
    m0 = masses[0]
    drift = max(abs(m - m0) for m in masses) / abs(m0)
    dev = float(np.abs(np.asarray(s.x_omega) - 1.0)[V > 1e-14].max())
    if verbose:
        print(f"neumann_mass_2d n={n}: steps={len(masses)} mass0={m0:.6e} "
              f"rel_drift={drift:.3e} max|u-1|={dev:.3e}")
        rows = [(k * dt, m, (m - m0) / m0) for k, m in enumerate(masses)]
        write_csv("neumann_mass_2d", rows, ["t", "mass", "rel_drift"])
    return drift, dev


if __name__ == "__main__":
    drift, dev = run_neumann_mass_2d()
    assert drift < 1e-9, drift
    assert dev < 1e-9, dev
    print("neumann mass conservation OK")
