"""NS-scalar coupling sanity benchmarks — reference
benchmark/navierstokes_coupled/hydrostatic_stratification.jl and
pure_conduction.jl.

1. Hydrostatic stratification: a stably stratified linear T(y) with
   buoyancy ON.  The pressure must absorb the buoyancy force exactly:
   velocity stays at the solver floor and the stratification does not
   drift (T(y) linear between the Dirichlet plates is the steady
   conduction state).
2. Pure conduction: buoyancy OFF (beta = 0), differentially heated
   cavity.  Velocity stays identically zero and the coupler's scalar
   reproduces the standalone conduction solver bit-for-bit (the
   convection term is exactly zero at u = 0).

Run:  python benchmarks/ns_coupled_sanity.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyMono
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.ns_scalar import (NavierStokesScalarCoupler,
                                           PicardCoupling)
from penguin_tpu.solvers.stokes import PinPressureGauge

n, L = 24, 1.0  # the coupler's default path is a dense solve per step
kappa, mu = 1e-2, 1e-2
dt, t_end = 0.01, 0.05

mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
d = L / n
mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
body = pt.geometry.full_domain(2)
caps = [pt.compute_capacity(body, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]


def make_mom():
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0]),
                    pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=mu, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    noslip = pt.Dirichlet(0.0)
    bc0 = pt.BorderConditions({k: noslip
                               for k in ("left", "right", "bottom", "top")})
    return NavierStokesMono(fluid, (bc0, bc0), PinPressureGauge(),
                            pt.Dirichlet(0.0))


cap_T = caps[2]
ops_T = pt.make_diffusion_ops(cap_T)
C = np.asarray(cap_T.C_om)

# ---- 1. hydrostatic stratification (buoyancy on, gravity -y) -------------
# scalar border keys: "left"/"right" are the y-min/y-max planes
bc_T_strat = pt.BorderConditions({
    "left": pt.Dirichlet(0.0), "right": pt.Dirichlet(1.0),
    "bottom": pt.Neumann(0.0), "top": pt.Neumann(0.0),
})
# the DISCRETE steady conduction profile (the continuous linear ramp is
# off by the O(h) wall placement of the border rows and would drift)
from penguin_tpu.solvers import DiffusionSteadyMono

_steady = DiffusionSteadyMono(
    pt.Phase(cap_T, ops_T, lambda x, y, z: 0.0, kappa),
    bc_T_strat, pt.Dirichlet(0.0))
_steady.solve(method="direct")
T_lin = jnp.asarray(_steady.x_omega)
coupler = NavierStokesScalarCoupler(
    make_mom(), cap_T, ops_T, kappa=kappa,
    scalar_source=lambda x, y, z, t: 0.0,
    bc_scalar=bc_T_strat, bc_scalar_cut=pt.Dirichlet(0.0),
    strategy=PicardCoupling(), beta=10.0, gravity=(0.0, -1.0),
    T_ref=0.5, T0=(T_lin, T_lin),
)
coupler.run(dt=dt, t_end=t_end)
ux = np.asarray(coupler.x[0])[:n, :n]
uy = np.asarray(coupler.x[2])[:n, :n]
u2 = float(np.sqrt((ux ** 2 + uy ** 2).mean()))
T_fin = np.asarray(coupler.T[0])
dT = np.abs(T_fin - np.asarray(T_lin))[1:n, 1:n].max()
print(f"hydrostatic stratification: ||u||_rms = {u2:.2e}  "
      f"stratification drift = {dT:.2e}")
assert u2 < 1e-10
assert dT < 1e-9

# ---- 2. pure conduction (beta = 0): coupler == standalone diffusion ------
bc_T_cond = pt.BorderConditions({
    "bottom": pt.Dirichlet(1.0), "top": pt.Dirichlet(0.0),
    "left": pt.Neumann(0.0), "right": pt.Neumann(0.0),
})
z = jnp.zeros(mesh_p.np_shape)
coupler2 = NavierStokesScalarCoupler(
    make_mom(), cap_T, ops_T, kappa=kappa,
    scalar_source=lambda x, y, z, t: 0.0,
    bc_scalar=bc_T_cond, bc_scalar_cut=pt.Dirichlet(0.0),
    strategy=PicardCoupling(), beta=0.0, gravity=(0.0, -1.0),
    T_ref=0.0, T0=(z, z),
)
coupler2.run(dt=dt, t_end=t_end)
ux = np.asarray(coupler2.x[0])
uy = np.asarray(coupler2.x[2])
umax = max(np.abs(ux).max(), np.abs(uy).max())

phase = pt.Phase(cap_T, ops_T, lambda x, y, z, t: 0.0, kappa)
ref = DiffusionUnsteadyMono(phase, bc_T_cond, pt.Dirichlet(0.0), dt,
                            (z, z), "BE")
# the diffusion driver mirrors the reference's "initial solve at t=0 +
# march" (one extra BE application vs the coupler's plain stepping):
# align the application counts
ref.solve(t_end - dt, method="direct")
dTc = np.abs(np.asarray(coupler2.T[0]) - np.asarray(ref.x_omega)).max()
print(f"pure conduction: max|u| = {umax:.2e}  "
      f"coupler-vs-diffusion deviation = {dTc:.2e}")
assert umax < 1e-11
assert dTc < 1e-9
print("NS-coupled sanity OK")
