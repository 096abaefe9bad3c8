"""2D Stokes Poiseuille flow between EMBEDDED walls (the channel walls cut
through the cells, off the mesh lines) — reference
examples/2D/Stokes/poiseuille_2d_cut.jl.

The parabolic profile between the embedded walls is enforced by the
interface Dirichlet rows, not the border rows.

Run:  python examples/2D/poiseuille_cut.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import StokesMono, PinPressureGauge

n, L, mu = 32, 1.0, 1.0
d = L / n
y_lo, y_hi = 0.18, 0.82  # embedded channel walls (off-grid)
mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
channel = lambda x, y: jnp.maximum(y_lo - y, y - y_hi)  # negative (fluid) inside
caps = [pt.compute_capacity(channel, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
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

ux = np.asarray(solver.velocity(0))
Cy = np.asarray(caps[0].C_om[..., 1])
mid = n // 2
prof, y = ux[mid, :], Cy[mid, :]
exact = np.where((y > y_lo) & (y < y_hi),
                 (y - y_lo) * (y_hi - y) / (2 * mu), 0.0)
sel = (y > y_lo + 2 * d) & (y < y_hi - 2 * d)
err = np.abs(prof - exact)[sel].max() / exact.max()
print(f"embedded-wall Poiseuille: u_max {prof.max():.5f} "
      f"(analytic {(y_hi - y_lo)**2 / (8 * mu):.5f}), interior rel err {err:.2e}")
assert err < 0.05
