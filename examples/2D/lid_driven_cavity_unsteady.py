"""Unsteady Stokes lid-driven cavity: start from rest, march CN to the
steady state — reference
examples/2D/Stokes/lid_driven_cavity_unsteady_2d.jl:1-177.

The reference advances CN and prints sanity diagnostics; here the time
march is gated against the STEADY monolithic solve of the same cavity:
Stokes flow has no convective time scale, so by t = 1 (≈ L²ρ/μ) the
transient must have relaxed onto the steady solution.  Also gated: the
centerline profile is lid-antisymmetric-ish (u crosses zero below the
lid) and the divergence stays at solver tolerance throughout.

Run:  python examples/2D/lid_driven_cavity_unsteady.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import (PinPressureGauge, StokesMono,
                                        stokes_divergence)

n = 32
L = 1.0
d = L / n
mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
body = pt.geometry.full_domain(2)
caps = [pt.compute_capacity(body, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]),
                pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=1.0, rho=1.0, f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0)
noslip, lid = pt.Dirichlet(0.0), pt.Dirichlet(1.0)
bc_ux = pt.BorderConditions({"left": noslip, "right": noslip,
                             "bottom": noslip, "top": lid})
bc_uy = pt.BorderConditions({k: noslip
                             for k in ("left", "right", "bottom", "top")})

unsteady = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                      pt.Dirichlet(0.0))
unsteady.solve_unsteady(dt=0.01, t_end=1.0, scheme="CN")
x_t = unsteady.x

steady = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                    pt.Dirichlet(0.0))
steady.solve()

ux_t = np.asarray(x_t[0])
ux_s = np.asarray(steady.x[0])
diff = np.abs(ux_t[:n, :n] - ux_s[:n, :n]).max()
print(f"max |u_x(t=1) - u_x(steady)| = {diff:.2e}")
assert diff < 2e-3, diff  # transient relaxed onto the steady cavity flow

center = ux_t[n // 2, :n]
print(f"centerline u: min {center.min():+.4f}, at lid {center[-1]:+.4f}")
assert center[-1] > 0.5 and center.min() < -0.05, center

div = np.asarray(stokes_divergence(fluid, x_t[0:4:2], x_t[1:4:2]))
wet = np.asarray(steady.p_active)
print(f"max |div u| on active cells = {np.abs(div[wet]).max():.2e}")
assert np.abs(div[wet]).max() < 1e-8
print("OK")
