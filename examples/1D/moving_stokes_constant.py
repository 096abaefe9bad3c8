"""1D prescribed-motion Stokes with a CONSTANT-velocity piston — reference
examples/1D/SolidMoving/MovingStokesConstantVelocity.jl.

The wall at s(t) = s0 + U t pushes the incompressible 1D column ahead of
it: continuity forces du/dx = 0, so the exact solution is PLUG flow
u(x, t) = U in the whole wet column at every instant.  Asserts the plug
value to discretization accuracy — a sharp Galilean-consistency check of
the space-time slab capacities (the oscillating-piston companion only
checks boundedness).

Run:  python examples/1D/moving_stokes_constant.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_stokes import MovingStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

n, L = 64, 1.0
d = L / n
U, s0 = 0.3, 0.2
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
# fluid occupies x > s(t); the far end is an open outflow so the column
# can actually translate (a second Dirichlet wall would contradict plug
# flow and produce a pressure spike instead)
bc_u = pt.BorderConditions({"bottom": pt.Dirichlet(0.0),
                            "top": pt.Outflow()})
# negative = fluid: the column AHEAD of the piston, x > s(t)
body_st = lambda x, tau, params: (s0 + U * (params[0] + tau)) - x
wall_v = lambda x, y, z, t: U

solver = MovingStokesMono(fluid, (bc_u,), PinPressureGauge(),
                          pt.Dirichlet(wall_v))
solver.solve(body_st, 0.02, 0.0, 0.5, scheme="BE", p=4, s=1)

u = np.asarray(solver.velocity(0))
x_u = np.asarray(mesh_u.nodes[0])[: u.shape[0]]
s_end = s0 + U * 0.5
wet = (x_u > s_end + 2 * d) & (x_u < L - 2 * d)
dev = np.abs(u[wet] - U).max()
print(f"wall at {s_end:.2f}; plug deviation max|u - U| = {dev:.2e} "
      f"over {int(wet.sum())} wet nodes (U = {U})")
assert np.isfinite(u).all()
assert dev < 5e-3 * U
print("constant-velocity moving piston OK")
