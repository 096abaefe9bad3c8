"""3D unsteady heat diffusion inside an embedded sphere, backward Euler —
reference examples/3D/Diffusion/Heat.jl.

Run:  python examples/3D/heat_sphere.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyMono

n = 24
L = 4.0
mesh = pt.Mesh((n, n, n), (L, L, L), (0.0, 0.0, 0.0))
sphere = pt.geometry.sphere((L / 2 + 0.01,) * 3, L / 4)

cap = pt.compute_capacity(sphere, mesh, p=4, s=1)
ops = pt.make_diffusion_ops(cap)
bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0) for k in
                            ("left", "right", "top", "bottom",
                             "backward", "forward")})
phase = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)
zv = jnp.zeros(mesh.np_shape)
dt = 0.25 * (L / n) ** 2
solver = DiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(1.0), dt, (zv, zv), "BE")
solver.solve(8 * dt, method="bicgstab")
T = np.asarray(solver.x_omega)
wet = np.asarray(cap.V) > 0
print(f"fluid cells: {wet.sum()},  max T: {T[wet].max():.4f} "
      f"(heating toward the interface value 1)")
assert 0.0 < T[wet].max() <= 1.0 + 1e-9
