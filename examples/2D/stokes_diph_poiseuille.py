"""Two-phase Stokes: stratified Poiseuille flow with a viscosity jump —
reference examples/2D/Stokes/stokes_diph_poiseuille.jl.

As in the reference, the analytic two-layer parabolic profile is imposed
at the inlet/outlet borders; the interface rows (velocity + shear-stress
continuity) must reproduce it in the interior, kink and all.

Analytic profile (body-force 1, layers [0,h] mu1 / [h,1] mu2):
  u1 = (-y^2/2 + A y)/mu1,  u2 = (-y^2/2 + A y + C)/mu2,
  A from stress+velocity continuity, C = 1/2 - A.

Run:  python examples/2D/stokes_diph_poiseuille.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.stokes_diph import StokesDiph

n, L = 16, 1.0
h = 0.5 + 0.011
mu1, mu2 = 1.0, 0.25
# continuity algebra: r*(-h^2/2 + A h) = -h^2/2 + A h + 1/2 - A
#   => A (r h - h + 1) = -h^2/2 + r h^2/2 + 1/2
r = mu2 / mu1
A = (-(h**2) / 2 + r * h**2 / 2 + 0.5) / (r * h - h + 1)
C = 0.5 - A
u1_exact = lambda y: (-(y**2) / 2 + A * y) / mu1
u2_exact = lambda y: (-(y**2) / 2 + A * y + C) / mu2


def phase_fluid(body, mu):
    d = L / n
    # shift origins -d/2 so the cell boxes span [0, L] and the ghost wall
    # rows impose no-slip exactly at y = 0 and y = L, where the analytic
    # two-layer profile vanishes (mesh.py box convention)
    mesh_p = pt.Mesh((n, n), (L, L), (-0.5 * d, -0.5 * d))
    mesh_ux = pt.Mesh((n, n), (L, L), (-d, -0.5 * d))
    mesh_uy = pt.Mesh((n, n), (L, L), (-0.5 * d, -d))
    caps = [pt.compute_capacity(body, m, p=6, s=1)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    return pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=mu, rho=1.0,
        f_u=lambda x, y, z: 1.0, f_p=lambda x, y, z: 0.0,
    )


fa = phase_fluid(pt.geometry.halfspace(1, h), mu1)
fb = phase_fluid(pt.geometry.halfspace(1, h, -1.0), mu2)
noslip = pt.Dirichlet(0.0)
in1 = pt.Dirichlet(lambda x, y, z: u1_exact(y))
in2 = pt.Dirichlet(lambda x, y, z: u2_exact(y))
bc_a = (pt.BorderConditions({"left": in1, "right": in1, "bottom": noslip}),
        pt.BorderConditions({"left": noslip, "right": noslip, "bottom": noslip}))
bc_b = (pt.BorderConditions({"left": in2, "right": in2, "top": noslip}),
        pt.BorderConditions({"left": noslip, "right": noslip, "top": noslip}))
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(1.0, 1.0, 0.0))
solver = StokesDiph(fa, fb, bc_a, bc_b, ic, wall_row="ghost")
solver.solve(method="lstsq")

ux1 = np.asarray(solver.velocity(0, 0))
ux2 = np.asarray(solver.velocity(1, 0))
y = np.asarray(fa.capacity_u[0].C_om[..., 1])
mid = n // 2
sel1 = y[mid, :n] < h - L / n
sel2 = y[mid, :n] > h + L / n
e1 = np.abs(ux1[mid, :n] - u1_exact(y[mid, :n]))[sel1].max()
e2 = np.abs(ux2[mid, :n] - u2_exact(y[mid, :n]))[sel2].max()
umax = u2_exact(A)  # analytic max sits in the less viscous layer
print(f"two-layer Poiseuille: interior err lower {e1:.2e}, upper {e2:.2e} "
      f"(u_max analytic {umax:.3f}; first-order at the viscosity kink)")
assert e1 < 0.2 * umax and e2 < 0.2 * umax
# the interface ties the two phases: same u_gamma on cut cells
ug1 = np.asarray(solver.velocity(0, 0, gamma=True))
ug2 = np.asarray(solver.velocity(1, 0, gamma=True))
cut = np.asarray(fa.capacity_u[0].cell_types) == -1
cut[0, :] = cut[n - 1, :] = cut[-1, :] = False  # border/wall columns
dj = np.abs(ug1[cut] - ug2[cut]).max()
print(f"interface velocity continuity (interior cut cells): "
      f"max jump {dj:.2e}")
assert dj < 1e-6
