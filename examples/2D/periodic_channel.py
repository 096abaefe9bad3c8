"""Body-force-driven streamwise-periodic channel (periodic Stokes
operators): the discrete solution is the exact parabola through the
staggered wall cells.

Run:  python examples/2D/periodic_channel.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import PinPressureGauge, StokesMono

n, L, mu = 32, 1.0, 1.0
mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
d = L / n
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
    mu=mu, rho=1.0,
    f_u=(lambda x, y, z: 1.0, lambda x, y, z: 0.0),
    f_p=lambda x, y, z: 0.0,
)
wall = pt.Dirichlet(0.0)
bc = pt.BorderConditions({"left": pt.Periodic(), "right": pt.Periodic(),
                          "bottom": wall, "top": wall})
solver = StokesMono(fluid, (bc, bc), PinPressureGauge(), pt.Dirichlet(0.0))
solver.solve(method="lstsq")
ux = np.asarray(solver.velocity(0))[:n, :n]
h = L / n
u_num = ux[n // 2].max()
u_ref = ((L - h) / 2) ** 2 / (2 * mu)
print(f"centerline u: {u_num:.6f}  "
      f"analytic (walls at cell centers): {u_ref:.6f}")
assert abs(u_num - u_ref) / u_ref < 0.01, (u_num, u_ref)
