"""Poiseuille channel with a PRESSURE-LEVEL-pinned open outlet — reference
examples/2D/Stokes/poiseuille_2d_pressure.jl (the reference drives with
the body force G equivalent to the head gradient and studies the pressure
field; same here, plus the Outflow(pressure=p_out) closure pins the
absolute pressure level at the outlet instead of an arbitrary gauge).

Exact (discrete): u(y) = G/(2 mu) (y - dy/2)(Ly - dy/2 - y), v = 0 — the
staggered border rows put the walls at the first/last ux node; the
pressure is FLAT in x (the body force carries the head) and equals p_out
at the open end.

Run:  python examples/2D/poiseuille_pressure_driven.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import StokesMono

nx, ny = 32, 32
Lx, Ly = 2.0, 1.0
mu = 1.0
G = 2.0           # body force (head gradient equivalent) -> Umax = 0.25
p_out = 0.7      # prescribed outlet pressure level

dx = Lx / nx
mesh_p = pt.Mesh((nx, ny), (Lx, Ly), (0.0, 0.0))
mesh_ux = pt.Mesh((nx, ny), (Lx, Ly), (-0.5 * dx, 0.0))
mesh_uy = pt.Mesh((nx, ny), (Lx, Ly), (0.0, -0.5 * (Ly / ny)))
body = pt.geometry.full_domain(2)
caps = [pt.compute_capacity(body, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=mu, rho=1.0,
    f_u=(lambda x, y, z: G, lambda x, y, z: 0.0),
    f_p=lambda x, y, z: 0.0,
)


# the staggered border rows put the ux walls at the first/last y-node
# (y = dy/2 and Ly - dy/2, cf. examples/2D/periodic_channel.py): the
# discrete channel is one cell narrower, and the exact solution of the
# DISCRETE problem is the parabola through those effective walls.  An
# inlet prescribing the continuous parabola would carry ~dy/Ly more flux
# than the discrete profile and show up as a spurious pressure gradient.
dy_ = Ly / ny
y_w0, y_w1 = 0.5 * dy_, Ly - 0.5 * dy_


def u_in(x, y, z=0.0):
    return G / (2 * mu) * np.maximum((y - y_w0) * (y_w1 - y), 0.0)


noslip = pt.Dirichlet(0.0)
bc_ux = pt.BorderConditions({
    "left": pt.Dirichlet(u_in), "right": pt.Outflow(pressure=p_out),
    "bottom": noslip, "top": noslip})
bc_uy = pt.BorderConditions({
    "left": noslip, "right": noslip, "bottom": noslip, "top": noslip})
solver = StokesMono(fluid, (bc_ux, bc_uy), None, pt.Dirichlet(0.0))
solver.solve(method="schur_gmres", tol=1e-10)

ux = np.asarray(solver.velocity(0))
p = np.asarray(solver.pressure)
ys = np.asarray(mesh_ux.nodes[1])[:ny]
u_exact = G / (2 * mu) * np.maximum((ys - y_w0) * (y_w1 - ys), 0.0)
u_mid = ux[nx // 2, :ny]
err = np.abs(u_mid - u_exact).max()
print(f"centerline profile vs exact parabola: max err = {err:.2e} "
      f"(Umax exact {u_exact.max():.4f}, sim {u_mid.max():.4f})")

# the body force carries the head: the pressure field is FLAT in x and
# pinned to p_out at the open outlet (state stores p = -p_physical)
pc = -p[2:nx - 1, ny // 2]
print(f"pressure along the channel: mean {pc.mean():+.4f}, spread "
      f"{pc.max() - pc.min():.2e} (pinned p_out = {p_out})")

assert err < 0.02 * u_exact.max()
assert pc.max() - pc.min() < 0.02 * abs(G * Lx)  # flat
assert abs(pc.mean() - p_out) < 0.05             # level pinned by Outflow
print("body-force Poiseuille with pinned outlet pressure OK")
