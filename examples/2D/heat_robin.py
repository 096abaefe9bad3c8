"""2D unsteady heat with a ROBIN condition on an embedded circle
(reference examples/2D/Diffusion/Heat_robin.jl): α Tγ + β q·n = g on the
cut.  The Robin resistance slows the boundary exchange; as α→∞ the
solution approaches the Dirichlet case — both verified.

Run:  python examples/2D/heat_robin.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyMono

nx = ny = 48
lx = ly = 4.0
mesh = pt.Mesh((nx, ny), (lx, ly), (0.0, 0.0))
circle = pt.geometry.circle((2.01, 2.01), 1.0)
cap = pt.compute_capacity(circle, mesh)
ops = pt.make_diffusion_ops(cap)
phase = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)
bc0 = pt.Dirichlet(0.0)
bc_b = pt.BorderConditions({k: bc0 for k in ("left", "right", "top", "bottom")})

one = jnp.ones(mesh.np_shape)
z = jnp.zeros(mesh.np_shape)
dt = 0.5 * (lx / nx) ** 2
live = np.asarray(cap.V) > 1e-12


def run(bc_i):
    s = DiffusionUnsteadyMono(phase, bc_b, bc_i, dt,
                              (one * live, z), "BE")
    s.solve(0.25, method="bicgstab")
    return np.asarray(s.x_omega)


# hot disk cooling through a Robin boundary (heat-transfer coefficient 1)
T_rob = run(pt.Robin(1.0, 1.0, 0.0))
T_strong = run(pt.Robin(1e6, 1.0, 0.0))
T_dir = run(pt.Dirichlet(0.0))

mean_rob = T_rob[live].mean()
mean_dir = T_dir[live].mean()
lim = np.abs(T_strong[live] - T_dir[live]).max()
print(f"mean T after cooling: Robin {mean_rob:.4f} vs Dirichlet {mean_dir:.4f}")
print(f"strong-Robin limit vs Dirichlet: max diff = {lim:.2e}")
assert mean_rob > mean_dir + 0.05   # Robin resistance retains heat
assert lim < 1e-3                   # α→∞ recovers Dirichlet
assert np.isfinite(T_rob[live]).all() and T_rob[live].max() <= 1.0 + 1e-8
print("2D Robin heat OK")
