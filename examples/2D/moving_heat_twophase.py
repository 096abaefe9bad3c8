"""2D prescribed-motion diphasic diffusion: a disk translating through a
conducting matrix, both phases solved with jump conditions at the moving
interface — reference examples/2D/SolidMoving/MovingHeat_2ph.jl.

Run:  python examples/2D/moving_heat_twophase.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_diffusion import MovingDiffusionUnsteadyDiph

n, L = 32, 4.0
mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
v, R = 0.5, 1.0
body_st = lambda x, y, t: -(jnp.sqrt((x - 1.6 - v * t) ** 2 + (y - 2.0) ** 2) - R)
body_c_st = lambda x, y, t: -body_st(x, y, t)

cap1 = pt.compute_capacity(lambda x, y: body_st(x, y, 0.0), mesh, p=4, s=1)
cap2 = pt.compute_capacity(lambda x, y: body_c_st(x, y, 0.0), mesh, p=4, s=1)
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z, t: 0.0, 1.0)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z, t: 0.0, 0.2)
bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                            for k in ("left", "right", "top", "bottom")})
# continuous temperature and flux across the moving interface
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(1.0, 0.2, 0.0))
z = jnp.zeros(mesh.np_shape)
u0 = (jnp.ones(mesh.np_shape), z, jnp.zeros(mesh.np_shape), z)  # hot disk
solver = MovingDiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, 0.02, u0, mesh, "BE")
solver.solve(body_st, body_c_st, 0.0, 0.4, p=4, s=1)

T1 = np.asarray(solver.x[0]); T2 = np.asarray(solver.x[2])
capT = pt.compute_capacity(lambda x, y: body_st(x, y, 0.4), mesh, p=4, s=1)
inside = np.asarray(capT.V) > 1e-10
print(f"hot disk after translating 0.2: inner range "
      f"[{T1[inside].min():.3f}, {T1[inside].max():.3f}] (cooling from 1)")
print(f"matrix warmed to max {T2.max():.3f};  Krylov relres max "
      f"{np.asarray(solver.krylov_relres).max():.1e}")
assert np.isfinite(T1).all() and np.isfinite(T2).all()
assert 0 < T1[inside].max() < 1.0 and T2.max() > 0.01
