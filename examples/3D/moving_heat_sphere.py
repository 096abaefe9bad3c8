"""3D prescribed-motion diffusion: sphere translating through the domain,
space-time capacities rebuilt on device each slab — reference
examples/3D/SolidMoving/MovingHeat.jl.

Run:  python examples/3D/moving_heat_sphere.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_diffusion import MovingDiffusionUnsteadyMono

n, L = 16, 4.0
mesh = pt.Mesh((n, n, n), (L, L, L), (0.0, 0.0, 0.0))
v, R = 1.0, 1.0
body_st = lambda x, y, z, t: -(jnp.sqrt((x - 1.4 - v * t) ** 2
                                        + (y - 2.0) ** 2
                                        + (z - 2.0) ** 2) - R)

cap0 = pt.compute_capacity(lambda x, y, z: body_st(x, y, z, 0.0), mesh,
                           p=4, s=1)
phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0), lambda x, y, z, t: 0.0, 1.0)
keys = ("left", "right", "top", "bottom", "backward", "forward")
bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0) for k in keys})
T0 = jnp.zeros(mesh.np_shape)
solver = MovingDiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(1.0), 0.05,
                                     (T0, jnp.zeros(mesh.np_shape)), mesh,
                                     "BE")
solver.solve(body_st, 0.0, 0.5, p=4, s=1)

T = np.asarray(solver.x[0])
capT = pt.compute_capacity(lambda x, y, z: body_st(x, y, z, 0.5), mesh,
                           p=4, s=1)
inside = np.asarray(capT.V) > 1e-10
print(f"3D moving sphere: field range inside [{T[inside].min():.4f}, "
      f"{T[inside].max():.4f}], Krylov relres max "
      f"{np.asarray(solver.krylov_relres).max():.1e}")
assert np.isfinite(T).all()
assert T[inside].max() > 0.5  # heated toward the moving-wall value 1
