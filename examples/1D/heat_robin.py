"""1D unsteady heat with a ROBIN interface condition on an embedded point
boundary (reference examples/1D/Diffusion/Heat_robin.jl: body -(x-0.25),
Robin(1,1,0) on the cut, Dirichlet 1/0 at the rod ends, D=5, CN).

The Robin closure row enforces  α Tγ + β q·n = g  with α=β=1, g=0; as
α→∞ it approaches the Dirichlet case, which we verify by comparison.

Run:  python examples/1D/heat_robin.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyMono

nx, lx = 80, 10.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
# fluid occupies x > 0.25 (the reference's body -(x - 0.25))
cap = pt.compute_capacity(pt.geometry.halfspace(0, 0.25, -1.0), mesh)
ops = pt.make_diffusion_ops(cap)
phase = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 5.0)
bc_b = pt.BorderConditions({"top": pt.Dirichlet(1.0), "bottom": pt.Dirichlet(0.0)})

one = jnp.ones(mesh.np_shape)
dt = 0.5 * (lx / nx) ** 2


def run(bc_i):
    s = DiffusionUnsteadyMono(phase, bc_b, bc_i, dt, (one, one), "CN")
    s.solve(1.0, method="direct")
    return np.asarray(s.x_omega), np.asarray(s.x_gamma)


T_rob, Tg_rob = run(pt.Robin(1.0, 1.0, 0.0))
T_strong, _ = run(pt.Robin(1e6, 1.0, 0.0))
T_dir, _ = run(pt.Dirichlet(0.0))

live = np.asarray(cap.V) > 1e-12
print(f"Robin(1,1,0) field range: [{T_rob[live].min():.4f}, {T_rob[live].max():.4f}]")
err_lim = np.abs(T_strong[live] - T_dir[live]).max()
print(f"Robin(alpha=1e6) vs Dirichlet: max diff = {err_lim:.2e}")
assert np.isfinite(T_rob[live]).all() and T_rob[live].max() <= 1.0 + 1e-8
assert err_lim < 1e-3  # strong-Robin limit recovers Dirichlet
print("1D Robin interface heat OK")
