"""Differentially heated cavity: Navier-Stokes + temperature with
Boussinesq buoyancy (NS-scalar coupling) — reference
examples/2D/NavierStokesCoupled.

Run:  python examples/2D/buoyant_cavity.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.ns_scalar import (NavierStokesScalarCoupler,
                                           PicardCoupling)
from penguin_tpu.solvers.stokes import PinPressureGauge

n, L = 20, 1.0
mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
d = L / n
mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
body = pt.geometry.full_domain(2)
caps = [pt.compute_capacity(body, m, p=4, s=1) for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=1e-2, rho=1.0,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)
noslip = pt.Dirichlet(0.0)
bc0 = pt.BorderConditions({k: noslip for k in ("left", "right", "bottom", "top")})
mom = NavierStokesMono(fluid, (bc0, bc0), PinPressureGauge(), pt.Dirichlet(0.0))

cap_T = caps[2]
ops_T = pt.make_diffusion_ops(cap_T)
# scalar border keys follow the reference's classification
# (solver.jl:379-409): "bottom"/"top" = x-min/x-max planes -> hot vertical
# wall at x=0, cold at x=1, adiabatic floor/ceiling
bc_T = pt.BorderConditions({
    "bottom": pt.Dirichlet(1.0), "top": pt.Dirichlet(0.0),
    "left": pt.Neumann(0.0), "right": pt.Neumann(0.0),
})
C = np.asarray(cap_T.C_om)
T0w = jnp.asarray(np.clip(1.0 - C[..., 0], 0.0, 1.0) * (np.asarray(cap_T.V) > 0))
coupler = NavierStokesScalarCoupler(
    mom, cap_T, ops_T, kappa=1e-2,
    scalar_source=lambda x, y, z, t: 0.0,
    bc_scalar=bc_T, bc_scalar_cut=pt.Dirichlet(0.0),
    strategy=PicardCoupling(), beta=10.0, gravity=(0.0, -1.0),
    T_ref=0.5, T0=(T0w, T0w),
)
coupler.run(dt=0.01, t_end=0.05)
uy = np.asarray(coupler.x[2])
up = uy[1:4, 1:n-1].mean()
down = uy[n-4:n-1, 1:n-1].mean()
print(f"hot-wall updraft: {up:+.5f}   cold-wall downdraft: {down:+.5f}")
assert up > 0.02 and down < -0.02, (up, down)      # buoyant circulation
assert abs(up + down) < 0.2 * abs(up), (up, down)  # near-antisymmetric
