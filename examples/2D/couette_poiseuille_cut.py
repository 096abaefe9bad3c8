"""2D Couette-Poiseuille flow in a CUT channel (steady NS) — reference
examples/2D/NavierStokes/couette_poiseuille_cut.jl.

The channel's top wall sits INSIDE the box as a cut interface
(phi = y - y_top, fluid below) and MOVES at U_top, imposed through the
interface Dirichlet; the Poiseuille branch is driven by a body force
f = -G (periodic in x, so f plays the role of the imposed pressure
gradient G).  The steady profile is the superposition

    u(y) = U_top * y/h - (G / 2 mu) * y * (h - y),   v = 0

and since u = u(y), v = 0 the convection term vanishes — the steady NS
solve must reproduce the analytic profile to cut-cell accuracy (the
quadratic is in the stencil's exact space away from the cut row).

Run:  python examples/2D/couette_poiseuille_cut.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

nx, ny = 64, 64
Lx, Ly = 2.0, 1.0
y_top, U_top, G, mu = 0.8, 1.0, -2.0, 1.0
h = y_top


def u_exact(y):
    xi = np.clip(y, 0.0, h)
    return U_top * xi / h - (G / (2.0 * mu)) * xi * (h - xi)


dx, dy = Lx / nx, Ly / ny
mesh_p = pt.Mesh((nx, ny), (Lx, Ly), (0.0, 0.0))
mesh_ux = pt.Mesh((nx, ny), (Lx, Ly), (-0.5 * dx, 0.0))
mesh_uy = pt.Mesh((nx, ny), (Lx, Ly), (0.0, -0.5 * dy))
body = lambda x, y: y - y_top        # fluid below the cut top wall
caps = [pt.compute_capacity(body, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
per = (True, False)
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0], periodic=per),
                pt.make_diffusion_ops(caps[1], periodic=per)),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2],
                                                         periodic=per),
    mu=mu, rho=1.0,
    f_u=(lambda x, y, z: -G, lambda x, y, z: 0.0),
    f_p=lambda x, y, z: 0.0,
)

noslip = pt.Dirichlet(0.0)
bc_ux = pt.BorderConditions({"left": pt.Periodic(), "right": pt.Periodic(),
                             "bottom": noslip, "top": noslip})
bc_uy = pt.BorderConditions({"left": pt.Periodic(), "right": pt.Periodic(),
                             "bottom": noslip, "top": noslip})
# moving cut wall: u_gamma = (U_top, 0) on the interface
# ghost wall rows put the bottom no-slip at the wall FACE (O(h^2));
# center rows bias the whole profile by ~u'(0) h/2 (docs/BENCHMARKS.md)
solver = NavierStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                          (pt.Dirichlet(U_top), pt.Dirichlet(0.0)),
                          wall_row="ghost")
solver.solve_steady_newton_krylov(max_iter=8, tol=1e-10)

ux = np.asarray(solver.velocity(0))
yc = np.asarray(caps[0].C_om[..., 1])[nx // 2, :ny]
num = ux[nx // 2, :ny]
live = (yc > 1.5 * dy) & (yc < y_top - 1.5 * dy)   # skip wall/cut rows
err = np.abs(num[live] - u_exact(yc[live])).max()
print(f"Couette-Poiseuille cut channel: max|u-exact| = {err:.2e}, "
      f"u_max {num[live].max():.4f} (analytic peak "
      f"{u_exact(np.linspace(0, h, 200)).max():.4f})")
assert err < 2e-2, err
# both branches present: wall-driven shear near the cut AND the
# pressure-driven bulge above the pure-Couette line in midchannel
mid = np.argmin(np.abs(yc - 0.5 * h))
assert num[mid] > U_top * 0.5 + 0.05
print("OK")
