"""Rayleigh-Benard instability: fluid heated from below with Boussinesq
buoyancy starts convection rolls above the critical Rayleigh number —
reference examples/2D/NavierStokesCoupled/rayleigh_benard_instability.jl.

Run:  python examples/2D/rayleigh_benard.py
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

nx, ny = 24, 12
Lx, Ly = 2.0, 1.0
nu = kappa = 1e-2
Ra = 1e5  # well above critical (1708)
beta_g = Ra * nu * kappa / Ly**3

mesh_p = pt.Mesh((nx, ny), (Lx, Ly), (0.0, 0.0))
dx = Lx / nx
mesh_ux = pt.Mesh((nx, ny), (Lx, Ly), (-0.5 * dx, 0.0))
mesh_uy = pt.Mesh((nx, ny), (Lx, Ly), (0.0, -0.5 * dx))
body = pt.geometry.full_domain(2)
caps = [pt.compute_capacity(body, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=nu, rho=1.0,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)
noslip = pt.Dirichlet(0.0)
bc0 = pt.BorderConditions({k: noslip for k in ("left", "right", "bottom", "top")})
mom = NavierStokesMono(fluid, (bc0, bc0), PinPressureGauge(), pt.Dirichlet(0.0))

cap_T = caps[2]
ops_T = pt.make_diffusion_ops(cap_T)
# scalar border keys: left/right = y extremes -> hot floor at y=0 is 'left'
bc_T = pt.BorderConditions({
    "left": pt.Dirichlet(1.0), "right": pt.Dirichlet(0.0),
    "bottom": pt.Neumann(0.0), "top": pt.Neumann(0.0),
})
C = np.asarray(cap_T.C_om)
# conductive profile + a small sinusoidal perturbation to trigger the rolls
T0np = (1.0 - C[..., 1] / Ly
        + 0.1 * np.sin(2 * np.pi * C[..., 0] / Lx)
        * np.sin(np.pi * C[..., 1] / Ly))
T0w = jnp.asarray(T0np * (np.asarray(cap_T.V) > 0))
coupler = NavierStokesScalarCoupler(
    mom, cap_T, ops_T, kappa=kappa,
    scalar_source=lambda x, y, z, t: 0.0,
    bc_scalar=bc_T, bc_scalar_cut=pt.Dirichlet(0.0),
    strategy=PicardCoupling(), beta=beta_g, gravity=(0.0, -1.0),
    T_ref=0.5, T0=(T0w, T0w),
)
coupler.run(dt=5e-3, t_end=0.025)
ke_half = float((np.asarray(coupler.x[2])[:nx, :ny] ** 2).sum())
coupler.run(dt=5e-3, t_end=0.05)
uy = np.asarray(coupler.x[2])
ke = float((uy[:nx, :ny] ** 2).sum())
print(f"Ra = {Ra:.0e}: roll kinetic energy {ke_half:.3e} -> {ke:.3e} "
      f"(growing from the perturbation seed)")
print(f"max |v|: {np.abs(uy).max():.4f}")
assert np.isfinite(uy).all()
assert ke > 0 and ke > ke_half  # convective instability grows
