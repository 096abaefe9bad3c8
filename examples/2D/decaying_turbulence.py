"""2D decaying turbulence in a doubly-periodic box (NS, CN) — reference
examples/2D/NavierStokes/decaying_turbulence_2d.jl.

Energy decays monotonically; enstrophy decays faster (selective decay).

Run:  python examples/2D/decaying_turbulence.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import MeanPressureGauge

n, L, nu = 48, 2 * np.pi, 2e-2
d = L / n
mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
body = pt.geometry.full_domain(2)
caps = [pt.compute_capacity(body, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
per = (True, True)
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0], periodic=per),
                pt.make_diffusion_ops(caps[1], periodic=per)),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2], periodic=per),
    mu=nu, rho=1.0,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)
P = pt.Periodic()
bc = pt.BorderConditions({k: P for k in ("left", "right", "bottom", "top")})
solver = NavierStokesMono(fluid, (bc, bc), MeanPressureGauge(), pt.Dirichlet(0.0))

# random-ish smooth initial field: a few Taylor-Green-like modes
Cx = np.asarray(caps[0].C_om); Cy = np.asarray(caps[1].C_om)
ux0 = (np.sin(Cx[..., 0]) * np.cos(Cx[..., 1])
       - 0.5 * np.sin(2 * Cx[..., 1]) * np.cos(3 * Cx[..., 0]))
uy0 = (-np.cos(Cy[..., 0]) * np.sin(Cy[..., 1])
       + 0.3 * np.sin(3 * Cy[..., 0]) * np.cos(2 * Cy[..., 1]))
x0 = list(solver.zero_state())
x0[0] = jnp.asarray(ux0); x0[2] = jnp.asarray(uy0)
x0 = tuple(x0)

dt = 0.02


def energy(s):
    ux = np.asarray(s.velocity(0))[:n, :n]
    uy = np.asarray(s.velocity(1))[:n, :n]
    return float((ux**2 + uy**2).sum()) * d * d


solver.solve_unsteady(dt, 1.0, scheme="CN", method="pbicgstab", x0=x0)
e1 = energy(solver)
x_mid = solver.x
solver.solve_unsteady(dt, 1.0, scheme="CN", method="pbicgstab", x0=x_mid)
e2 = energy(solver)
ux00 = np.asarray(x0[0])[:n, :n]; uy00 = np.asarray(x0[2])[:n, :n]
e0 = float((ux00**2 + uy00**2).sum()) * d * d
print(f"kinetic energy: {e0:.4f} -> {e1:.4f} -> {e2:.4f} (monotone decay)")
assert e0 > e1 > e2 > 0
print("decaying turbulence OK")
