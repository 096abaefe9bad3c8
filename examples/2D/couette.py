"""2D Couette flow: moving lid over a no-slip base, linear profile —
reference examples/2D/Stokes/couette_2d.jl.

Run:  python examples/2D/couette.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import StokesMono, PinPressureGauge

n, L, U = 32, 1.0, 1.0
d = L / n
mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
body = pt.geometry.full_domain(2)
caps = [pt.compute_capacity(body, m, p=4, s=1) for m in (mesh_ux, mesh_uy, mesh_p)]
per = (True, False)
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0], periodic=per),
                pt.make_diffusion_ops(caps[1], periodic=per)),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2], periodic=per),
    mu=1.0, rho=1.0,
    f_u=(lambda x, y, z: 0.0, lambda x, y, z: 0.0),
    f_p=lambda x, y, z: 0.0,
)
noslip, lid = pt.Dirichlet(0.0), pt.Dirichlet(U)
bc_ux = pt.BorderConditions({"left": pt.Periodic(), "right": pt.Periodic(),
                             "bottom": noslip, "top": lid})
bc_uy = pt.BorderConditions({"left": pt.Periodic(), "right": pt.Periodic(),
                             "bottom": noslip, "top": noslip})
solver = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(), pt.Dirichlet(0.0))
solver.solve(method="lstsq")

ux = np.asarray(solver.velocity(0))
y = np.asarray(caps[0].C_om[..., 1])[n // 2, :n]
prof = ux[n // 2, :n]
# walls sit at the first/last u-node rows: linear between their y's
y0, y1 = y[0], y[-1]
exact = U * (y - y0) / (y1 - y0)
err = np.abs(prof - exact).max()
print(f"Couette linear profile: max error {err:.2e} (discrete-exact gate 1e-10)")
assert err < 1e-8
