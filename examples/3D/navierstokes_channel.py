"""Steady 3D Navier-Stokes duct driven by a (1-xi^2)(1-eta^2) inflow
— reference examples/3D/NavierStokes/channel_flow_3d.jl:1-70.

16 x 16 x 12 duct, Outflow outlet, no-slip side walls, steady Picard
iteration with a preconditioned Krylov inner solve (the reference uses a
direct factorization — at 3 velocity components x 2 DOF blocks this is the
matrix-free path's job).  Asserts the outlet profile keeps the
inlet's tensor-parabola shape (duct flow is fully developed immediately at
this Re), the centerline peak dominates, and mass leaves the wall rows.

Run:  python examples/3D/navierstokes_channel.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import time

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

Nx, Ny, Nz = 16, 16, 12
Lx, Ly, Lz = 2.0, 1.0, 0.5
x0, y0, z0 = 0.0, -Ly / 2, -Lz / 2
Umax, rho, mu = 1.0, 1.0, 1e-1  # Re ~ 10 on the height

mesh_p = pt.Mesh((Nx, Ny, Nz), (Lx, Ly, Lz), (x0, y0, z0))
dxyz = (Lx / Nx, Ly / Ny, Lz / Nz)
meshes_u = [pt.Mesh((Nx, Ny, Nz), (Lx, Ly, Lz),
                    tuple((x0, y0, z0)[i] - (0.5 * dxyz[i] if i == a else 0.0)
                          for i in range(3)))
            for a in range(3)]
body = pt.geometry.full_domain(3)
caps_u = [pt.compute_capacity(body, m, p=4, s=1) for m in meshes_u]
cap_p = pt.compute_capacity(body, mesh_p, p=4, s=1)
fluid = pt.Fluid(
    mesh_u=tuple(meshes_u), mesh_p=mesh_p,
    capacity_u=tuple(caps_u),
    operator_u=tuple(pt.make_diffusion_ops(c) for c in caps_u),
    capacity_p=cap_p, operator_p=pt.make_diffusion_ops(cap_p),
    mu=mu, rho=rho,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)


def inflow(x, y, z):
    xi = y / (Ly / 2)
    eta = z / (Lz / 2)
    return Umax * (1 - xi**2) * (1 - eta**2)


noslip = pt.Dirichlet(0.0)
keys = ("left", "right", "bottom", "top", "backward", "forward")
bc_ux = pt.BorderConditions(
    {"left": pt.Dirichlet(inflow), "right": pt.Outflow(),
     "bottom": noslip, "top": noslip, "backward": noslip,
     "forward": noslip})
bc_0 = pt.BorderConditions({k: noslip for k in keys})
solver = NavierStokesMono(fluid, (bc_ux, bc_0, bc_0), PinPressureGauge(),
                          pt.Dirichlet(0.0))

t0 = time.time()
solver.solve_steady(max_iter=8, tol=1e-10, method="pbicgstab")
print(f"steady Picard 3D NS ({Nx}x{Ny}x{Nz}): {time.time() - t0:.1f} s, "
      "residuals "
      + np.array2string(np.asarray(solver.residual_history), precision=2))

ux = np.asarray(solver.velocity(0))
jc, kc = Ny // 2, Nz // 2
mid_i = Nx // 2
centerline = ux[mid_i, jc, kc]
wall_row = np.abs(ux[mid_i, 1, 1:-1]).max()
print(f"mid-duct centerline u = {centerline:.4f} (inflow peak {Umax}), "
      f"near-wall row max = {wall_row:.4f}")
assert np.isfinite(ux).all()
assert 0.7 * Umax < centerline < 1.4 * Umax
assert wall_row < 0.6 * centerline

# the outlet profile keeps the tensor-parabola shape
prof = ux[Nx - 2, :Ny, kc]
prof_exact = np.array([inflow(0.0, y, 0.0)
                       for y in np.asarray(meshes_u[0].nodes[1])[:Ny]])
scale = prof[jc] / max(prof_exact[jc], 1e-12)
err = np.abs(prof - scale * prof_exact)[1:-1].max()
print(f"outlet profile vs tensor-parabola (scaled): max dev = {err:.4f}")
assert err < 0.15 * abs(centerline)
print("3D NS channel OK")
