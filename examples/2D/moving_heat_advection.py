"""2D prescribed-motion advection-diffusion: scalar transported by a bulk
velocity while a disk sweeps through the domain — reference
examples/2D/SolidMoving/MovingHeat_Adv.jl.

Run:  python examples/2D/moving_heat_advection.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_diffusion import MovingAdvDiffusionUnsteadyMono

n, L = 32, 4.0
mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
v, R = 0.5, 1.0
u_adv, D = 0.6, 0.15  # cell Peclet u*h/D ~ 0.5 (central flux form)
# fluid OUTSIDE a disk crossing the domain (negative = fluid)
body_st = lambda x, y, t: R - jnp.sqrt((x - 1.2 - v * t) ** 2 + (y - 2.0) ** 2)

cap0 = pt.compute_capacity(lambda x, y: body_st(x, y, 0.0), mesh, p=4, s=1)
phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0), lambda x, y, z, t: 0.0,
                 D)
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(1.0),  # hot inflow at x=0
                            "top": pt.Dirichlet(0.0),
                            "left": pt.Neumann(0.0), "right": pt.Neumann(0.0)})
u_bulk = (jnp.full(mesh.np_shape, u_adv), jnp.zeros(mesh.np_shape))
u_gamma = jnp.zeros(mesh.np_shape)
T0 = jnp.zeros(mesh.np_shape)
solver = MovingAdvDiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(0.0), 0.02,
                                        (T0, jnp.zeros(mesh.np_shape)),
                                        mesh, "BE")
solver.solve(body_st, 0.0, 0.6, u_bulk, u_gamma, p=4, s=1)

T = np.asarray(solver.x[0])
capT = pt.compute_capacity(lambda x, y: body_st(x, y, 0.6), mesh, p=4, s=1)
wet = np.asarray(capT.V) > 1e-10
print(f"advected field range: [{T[wet].min():.3f}, {T[wet].max():.3f}] "
      f"(hot front entering from x=0, cold obstacle wake)")
print(f"max Krylov relres {np.asarray(solver.krylov_relres).max():.1e}")
assert np.isfinite(T).all()
assert 0.5 < T[wet].max() < 1.1  # hot front advected in, bounded
assert T[wet].min() > -0.05
