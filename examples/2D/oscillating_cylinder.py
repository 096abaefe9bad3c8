"""2D prescribed-motion Stokes: cylinder oscillating horizontally in a box
(space-time slab capacities on all three staggered meshes) — reference
examples/2D/SolidMoving/MovingStokesOscillatingCylinder.jl.

Run:  python examples/2D/oscillating_cylinder.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_stokes import MovingStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

n, L = 24, 2.0
d = L / n
R, amp, om = 0.4, 0.1, 2 * np.pi
mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
body0 = lambda x, y: jnp.sqrt((x - 1.0) ** 2 + (y - 1.0) ** 2) - R  # fluid outside
caps = [pt.compute_capacity(body0, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=0.1, rho=1.0,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)
noslip = pt.Dirichlet(0.0)
bc0 = pt.BorderConditions({k: noslip for k in ("left", "right", "bottom", "top")})

# cylinder center c(t) = 1 + amp sin(om t); fluid outside
def body_st(x, y, tau, params):
    t = params[0] + tau
    return jnp.sqrt((x - 1.0 - amp * jnp.sin(om * t)) ** 2 + (y - 1.0) ** 2) - R

# fluid on the cylinder surface moves with it: u_x = dc/dt, u_y = 0
wall_u = pt.Dirichlet(lambda x, y, z, t: amp * om * jnp.cos(om * t))
solver = MovingStokesMono(fluid, (bc0, bc0), PinPressureGauge(), wall_u)
solver.solve(body_st, 0.05, 0.0, 0.5, scheme="BE", p=4, s=1)

ux = np.asarray(solver.velocity(0))
print(f"velocity field after half a period: max |u| = {np.abs(ux).max():.4f} "
      f"(piston speed scale {amp * om:.3f})")
assert np.isfinite(ux).all()
assert np.abs(ux).max() > 0.1 * amp * om
print("oscillating-cylinder moving Stokes OK")
