"""Oscillatory (Womersley) channel flow vs the analytic profile — reference
benchmark/navierstokes/oscillatory_channel.jl.

Body force f(t) = F cos(om t); after the transient the velocity is
u(y,t) = Re[ (F/(i om)) (1 - cosh(k(y-H/2))/cosh(kH/2)) e^{i om t} ],
k = sqrt(i om / nu).  Writes oscillatory_channel.csv.

Run:  python benchmarks/oscillatory_channel.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import csv

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

n, L, nu, F, om = 32, 1.0, 0.1, 1.0, 2 * np.pi
d = L / n
mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
body = pt.geometry.full_domain(2)
caps = [pt.compute_capacity(body, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
per = (True, False)
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0], periodic=per),
                pt.make_diffusion_ops(caps[1], periodic=per)),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2], periodic=per),
    mu=nu, rho=1.0,
    f_u=(lambda x, y, z, t=0.0: F * jnp.cos(om * t), lambda x, y, z, t=0.0: 0.0),
    f_p=lambda x, y, z: 0.0,
)
wall = pt.Dirichlet(0.0)
bc = pt.BorderConditions({"left": pt.Periodic(), "right": pt.Periodic(),
                          "bottom": wall, "top": wall})
solver = NavierStokesMono(fluid, (bc, bc), PinPressureGauge(), pt.Dirichlet(0.0))

# two periods to kill the transient, CN
T_per = 2 * np.pi / om
dt = T_per / 80
solver.solve_unsteady(dt, 2 * T_per, scheme="CN", method="auto")

ux = np.asarray(solver.velocity(0))
y = np.asarray(caps[0].C_om[..., 1])[n // 2, :n]
t_end = 2 * T_per

k = np.sqrt(1j * om / nu)
H = L - d  # walls at the first/last u-rows (cell centers)
yy = y - y[0]
u_c = (F / (1j * om)) * (1 - np.cosh(k * (yy - H / 2)) / np.cosh(k * H / 2))
exact = np.real(u_c * np.exp(1j * om * t_end))
got = ux[n // 2, :n]
err = np.abs(got - exact).max() / np.abs(u_c).max()
print(f"Womersley channel (alpha = {np.sqrt(om/nu)*H/2:.2f}): "
      f"rel err {err:.3f}")
out = _os.path.join(_os.path.dirname(__file__), "oscillatory_channel.csv")
with open(out, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["y", "u_computed", "u_exact"])
    w.writerows(zip(y, got, exact))
print(f"wrote {out}")
assert err < 0.1
