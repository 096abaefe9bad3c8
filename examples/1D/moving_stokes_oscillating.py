"""1D prescribed-motion Stokes: piston wall oscillating through the channel
(space-time slab capacities in the momentum/continuity blocks) — reference
examples/1D/SolidMoving/MovingStokesOscillating.jl.

Run:  python examples/1D/moving_stokes_oscillating.py
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
bc_u = pt.BorderConditions({"bottom": pt.Dirichlet(0.0), "top": pt.Dirichlet(0.0)})

# fluid occupies x > s(t), wall at s(t) = 0.25 + 0.05 sin(2π t)
amp, om = 0.05, 2 * np.pi
body_st = lambda x, tau, params: x - (0.25 + amp * jnp.sin(om * (params[0] + tau)))

# the fluid at the moving wall follows the piston: u_γ = ds/dt
piston_v = lambda x, y, z, t: amp * om * jnp.cos(om * t)
solver = MovingStokesMono(fluid, (bc_u,), PinPressureGauge(),
                          pt.Dirichlet(piston_v))
solver.solve(body_st, 0.02, 0.0, 0.2, scheme="BE", p=4, s=1)

u = np.asarray(solver.velocity(0))
print(f"velocity range after 10 slabs: [{u.min():+.4f}, {u.max():+.4f}]")
assert np.isfinite(u).all() and np.abs(u).max() > 1e-3
print("moving-wall 1D Stokes OK")
