"""Creeping (Stokes) flow around a circular cylinder in a channel —
reference examples/2D/Stokes/flow_around_circle_2d.jl.

No inertia: the flow field is fore-aft symmetric around the body (the
kinematic reversibility of Stokes flow), in contrast to the NS wake of
examples/2D/flow_around_cylinder.py.  Asserts the symmetry, a positive
drag, zero net lift, and mass conservation across the body section.

Run:  python examples/2D/stokes_flow_around_cylinder.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import StokesMono, PinPressureGauge

nx, ny = 64, 32
Lx, Ly = 4.0, 2.0
R, cx, cy = 0.25, 2.0, 1.0
mu, U = 1.0, 1.0
dx = Lx / nx
mesh_p = pt.Mesh((nx, ny), (Lx, Ly), (0.0, 0.0))
mesh_ux = pt.Mesh((nx, ny), (Lx, Ly), (-0.5 * dx, 0.0))
mesh_uy = pt.Mesh((nx, ny), (Lx, Ly), (0.0, -0.5 * (Ly / ny)))
body = pt.geometry.complement(pt.geometry.circle((cx, cy), R))
caps = [pt.compute_capacity(body, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=mu, rho=1.0,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)
inlet = pt.Dirichlet(U)
noslip = pt.Dirichlet(0.0)
bc_ux = pt.BorderConditions({"left": inlet, "right": pt.Outflow(),
                             "bottom": inlet, "top": inlet})
bc_uy = pt.BorderConditions({"left": noslip, "right": noslip,
                             "bottom": noslip, "top": noslip})
solver = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                    pt.Dirichlet(0.0))
solver.solve(method="schur_gmres", tol=1e-10)

ux = np.asarray(solver.velocity(0))
fx, fy = solver.interface_force()
fx, fy = -fx, -fy
print(f"Stokes drag = {fx:+.4f}, lift = {fy:+.4f}")

# top-bottom symmetry holds for the CONTINUOUS problem, but not exactly
# for the discretization: the uy mesh is staggered by -dy/2, so the wall
# and cut rows seen above/below the body are not mirror images.  The
# volume-weighted L2 asymmetry converges at O(h): 0.151 at 64x32, 0.080
# at 128x64.  Gate the measured first-order quantity, not machine zero.
# Fore-aft symmetry is only asymptotic — 2D Stokes disturbances decay
# logarithmically, so the inlet-Dirichlet / outlet-Outflow imbalance
# reaches the body; an NS wake at Re=20 would break it at O(1).
i_c = int(cx / dx)
j_c = int(cy / (Ly / ny))
V = np.asarray(caps[0].V)
A = ux[:, 1:j_c]
B = ux[:, 2 * j_c - 1:j_c:-1]
w = np.minimum(V[:ux.shape[0], 1:j_c], V[:ux.shape[0], 2 * j_c - 1:j_c:-1])
tb_err = float(np.sqrt(((A - B) ** 2 * w).sum()
                       / ((0.25 * (A + B) ** 2 * w).sum() + 1e-300)))
print(f"top-bottom asymmetry (weighted L2, rel): {tb_err:.2e} "
      "(O(h) from the staggered wall/cut rows)")
span = int(1.2 * R / dx) + 2
sym_err = 0.0
for s in range(2, span):
    sym_err = max(sym_err,
                  np.abs(ux[i_c - s, :ny] - ux[i_c + s, :ny]).max())
print(f"fore-aft asymmetry within 1.2R: {sym_err:.2e} "
      "(creeping-flow reversibility, limited by the open outlet)")

# mass conservation: flux through the inlet == flux through the body plane
dy = Ly / ny
q_in = ux[2, :ny].sum() * dy
q_body = np.nan_to_num(ux[i_c, :ny]).sum() * dy
print(f"flux: inlet {q_in:.4f} vs body section {q_body:.4f}")

assert np.isfinite(ux[np.asarray(caps[0].V)[:nx + 1, :ny + 1] > 0]).all()
assert fx > 0 and abs(fy) < 0.05 * fx
assert tb_err < 0.25  # measured 0.151 at 64x32, O(h)
assert sym_err < 0.2 * U
assert abs(q_in - q_body) < 0.03 * abs(q_in)
print("creeping flow around the cylinder OK")
