"""1D unsteady Navier-Stokes (mono): impulsively started flow relaxing to
the steady force balance — reference
examples/1D/NavierStokes/navierstokes_mono_1d.jl.

Run:  python examples/1D/navierstokes_channel.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

n, L = 64, 1.0
d = L / n
mesh_p = pt.Mesh((n,), (L,), (0.0,))
mesh_u = pt.Mesh((n,), (L,), (-0.5 * d,))
body = pt.geometry.full_domain(1)
cap_u = pt.compute_capacity(body, mesh_u, p=4, s=1)
cap_p = pt.compute_capacity(body, mesh_p, p=4, s=1)
fluid = pt.Fluid(
    mesh_u=(mesh_u,), mesh_p=mesh_p,
    capacity_u=(cap_u,), operator_u=(pt.make_diffusion_ops(cap_u),),
    capacity_p=cap_p, operator_p=pt.make_diffusion_ops(cap_p),
    mu=1.0, rho=1.0,
    f_u=lambda x, y, z: 1.0, f_p=lambda x, y, z: 0.0,
)
bc_u = pt.BorderConditions({"bottom": pt.Dirichlet(0.0), "top": pt.Dirichlet(0.0)})
solver = NavierStokesMono(fluid, (bc_u,), PinPressureGauge(), pt.Dirichlet(0.0))
solver.solve_unsteady(0.01, 0.5, scheme="CN", method="direct")

u = np.asarray(solver.velocity(0))
p = np.asarray(solver.pressure)
dp = np.diff(p[1:n - 1]) / d
print(f"1D NS steady balance: interior |dp/dx| = {abs(dp.mean()):.4f} "
      f"(body force 1.0), u interior std {u[2:n-2].std():.2e}")
assert abs(abs(dp.mean()) - 1.0) < 1e-6
assert u[2:n-2].std() < 1e-6
