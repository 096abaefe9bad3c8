"""UNSTEADY Stokes Poiseuille start-up: from rest, CN relaxation to the
parabola, gated against the analytic Fourier transient — reference
examples/2D/Stokes/poiseuille_unsteady_2d.jl (the reference compares only
the final profile; the transient gate here is strictly stronger).

Streamwise-periodic operators + body force G; the staggered border rows
put the walls at the first/last ux node (y = dy/2, Ly - dy/2), so the
channel the DISCRETE problem solves has width W = Ly - dy and

  u(y,t) = G/(2mu) (y-y0)(y1-y)
         - sum_{k odd} 4 G W^2/(mu pi^3 k^3) sin(k pi (y-y0)/W)
           exp(-k^2 pi^2 nu t / W^2).

Run:  python examples/2D/poiseuille_unsteady.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import StokesMono, PinPressureGauge

nx, ny = 32, 32
Lx, Ly = 2.0, 1.0
mu = rho = 1.0
G = 2.0

dx, dy = Lx / nx, Ly / ny
mesh_p = pt.Mesh((nx, ny), (Lx, Ly), (0.0, 0.0))
mesh_ux = pt.Mesh((nx, ny), (Lx, Ly), (-0.5 * dx, 0.0))
mesh_uy = pt.Mesh((nx, ny), (Lx, Ly), (0.0, -0.5 * dy))
body = pt.geometry.full_domain(2)
caps = [pt.compute_capacity(body, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
per_ax = (True, False)
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0], periodic=per_ax),
                pt.make_diffusion_ops(caps[1], periodic=per_ax)),
    capacity_p=caps[2],
    operator_p=pt.make_diffusion_ops(caps[2], periodic=per_ax),
    mu=mu, rho=rho,
    f_u=(lambda x, y, z: G, lambda x, y, z: 0.0),
    f_p=lambda x, y, z: 0.0,
)
per, ns = pt.Periodic(), pt.Dirichlet(0.0)
bc_ux = pt.BorderConditions({"left": per, "right": per,
                             "bottom": ns, "top": ns})
bc_uy = pt.BorderConditions({"left": per, "right": per,
                             "bottom": ns, "top": ns})

y0_w, y1_w = 0.5 * dy, Ly - 0.5 * dy
W = y1_w - y0_w
nu = mu / rho
ys = np.asarray(mesh_ux.nodes[1])[:ny]


def u_exact(t):
    u = G / (2 * mu) * np.maximum((ys - y0_w) * (y1_w - ys), 0.0)
    for k in range(1, 40, 2):
        u = u - (4 * G * W**2 / (mu * np.pi**3 * k**3)
                 * np.sin(k * np.pi * np.clip((ys - y0_w) / W, 0, 1))
                 * np.exp(-k**2 * np.pi**2 * nu * t / W**2))
    return u


dt = 2e-3
x = None
errs = {}
t_now = 0.0
s = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(), pt.Dirichlet(0.0))
for t_target in (0.01, 0.03, 0.08, 0.3):
    # BCs and forcing are time-independent, so each segment just
    # continues from the previous state for the remaining duration
    x = s.solve_unsteady(dt, t_target - t_now, scheme="CN",
                         method="pbicgstab", tol=1e-10, x0=x)
    t_now = t_target
    u_mid = np.asarray(s.velocity(0))[nx // 2, :ny]
    ue = u_exact(t_target)
    errs[t_target] = np.abs(u_mid - ue).max()
    print(f"t = {t_target:5.3f}: max|u - analytic| = {errs[t_target]:.2e} "
          f"(u_mid {u_mid.max():.4f} vs exact {ue.max():.4f})")

u_inf = G / (8 * mu) * W**2
for t, e in errs.items():
    assert e < 0.02 * u_inf, (t, e)      # 2% of the steady peak, ALL times
assert errs[0.3] < 2e-4                  # fully relaxed: discrete-exact
print("unsteady Poiseuille start-up OK")
