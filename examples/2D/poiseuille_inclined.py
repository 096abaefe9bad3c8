"""Poiseuille flow in an INCLINED embedded channel (walls cut the grid at
an angle) — reference examples/2D/Stokes/poiseuille_2d_cut_inclined.jl.

The channel midline runs at angle theta to the grid; a body force G acts
along the channel axis.  Exact solution in wall-normal coordinate s
(distance from the midline): u_t(s) = G/(2 mu) (W^2/4 - s^2), velocity
purely tangential.  This exercises the cut-cell Stokes rows in the
genuinely non-grid-aligned regime.

Run:  python examples/2D/poiseuille_inclined.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import StokesMono, PinPressureGauge

n, L, mu = 48, 1.0, 1.0
theta = np.deg2rad(20.0)
W = 0.5                     # channel width
G = 8.0 * mu / W**2         # -> peak velocity 0.25
tx, ty = np.cos(theta), np.sin(theta)     # channel tangent
nxn, nyn = -np.sin(theta), np.cos(theta)  # channel normal

d = L / n
mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))


def channel(x, y):
    # signed wall-normal distance from the midline through the domain center
    s = (x - 0.5) * nxn + (y - 0.5) * nyn
    return jnp.abs(s) - W / 2   # negative inside the channel


caps = [pt.compute_capacity(channel, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=mu, rho=1.0,
    f_u=(lambda x, y, z: G * tx, lambda x, y, z: G * ty),
    f_p=lambda x, y, z: 0.0,
)
# border rows see the exact tangential profile (the channel crosses the
# domain boundary obliquely, so uniform Dirichlet would be wrong there)


def u_exact(x, y, comp):
    s = (x - 0.5) * nxn + (y - 0.5) * nyn
    ut = G / (2 * mu) * jnp.maximum(W**2 / 4 - s**2, 0.0)
    return ut * (tx if comp == 0 else ty)


bc_ux = pt.BorderConditions(
    {k: pt.Dirichlet(lambda x, y, z=0.0: u_exact(x, y, 0))
     for k in ("left", "right", "bottom", "top")})
bc_uy = pt.BorderConditions(
    {k: pt.Dirichlet(lambda x, y, z=0.0: u_exact(x, y, 1))
     for k in ("left", "right", "bottom", "top")})
solver = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                    pt.Dirichlet(0.0))
solver.solve(method="schur_gmres", tol=1e-10)

ux = np.asarray(solver.velocity(0))
uy = np.asarray(solver.velocity(1))
Cx = np.asarray(caps[0].C_om)
Cy = np.asarray(caps[1].C_om)
live_x = np.asarray(caps[0].V)[:n, :n] > 1e-10
live_y = np.asarray(caps[1].V)[:n, :n] > 1e-10

uex = np.asarray(u_exact(Cx[..., 0], Cx[..., 1], 0))[:n, :n]
uey = np.asarray(u_exact(Cy[..., 0], Cy[..., 1], 1))[:n, :n]
# compare away from the cut rim (first-order cut rows dominate there)
sx = np.abs((Cx[..., 0] - 0.5) * nxn + (Cx[..., 1] - 0.5) * nyn)[:n, :n]
interior_x = live_x & (sx < 0.4 * W / 2 + 1e-12)
err = np.abs(ux[:n, :n] - uex)[interior_x].max()
peak = G * W**2 / (8 * mu)
print(f"inclined channel ({np.rad2deg(theta):.0f} deg): core max err = "
      f"{err:.2e} (peak u_t = {peak})")

# tangentiality: velocity in the channel core is parallel to the axis
cross = (ux[:n, :n] * ty - uy[:n, :n] * tx)
cross_err = np.abs(cross[interior_x]).max()
print(f"max |u x t| in the core = {cross_err:.2e} (flow is axis-aligned)")
assert err < 0.05 * peak
assert cross_err < 0.05 * peak
print("inclined cut Poiseuille OK")
