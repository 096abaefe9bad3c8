"""Graetz problem: thermal entrance region of a channel with prescribed
Poiseuille velocity (steady advection-diffusion) — reference
examples/2D/AdvectionDiffusion/AdvDiff_Graetz.jl and
benchmark/navierstokes_coupled/graetz_channel.jl.

The mixed-mean temperature must decay exponentially downstream; the decay
rate approaches the leading Graetz eigenvalue.

Run:  python examples/2D/graetz_channel.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import AdvectionDiffusionUnsteadyMono

nx, ny = 96, 32
Lx, Ly = 6.0, 1.0
Pe = 10.0
mesh = pt.Mesh((nx, ny), (Lx, Ly), (0.0, 0.0))
cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh)
C = np.asarray(cap.C_om)
X, Y = C[..., 0], C[..., 1]
u_pois = 6.0 * Y * (Ly - Y) / Ly**2  # mean 1
u_bulk = (jnp.asarray(u_pois), jnp.zeros(mesh.np_shape))
conv = pt.make_convection_ops(cap, u_bulk, jnp.zeros(mesh.np_shape))
bc_b = pt.BorderConditions({
    "bottom": pt.Dirichlet(1.0),   # inlet (x=0): hot
    "top": pt.Outflow(),           # outlet
    "left": pt.Dirichlet(0.0),     # cold walls (y=0, y=Ly)
    "right": pt.Dirichlet(0.0),
})
phase = pt.Phase(cap, conv, lambda x, y, z, t: 0.0, 1.0 / Pe)
u0 = jnp.zeros(mesh.np_shape)
dt = 0.5 * (Lx / nx)
solver = AdvectionDiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(0.0), dt,
                                        (u0, u0), "BE")
solver.solve(12.0, method="pgmres")  # march to steady state

T = np.asarray(solver.x_omega)
# mixed-mean temperature Tm(x) = ∫ u T dy / ∫ u dy
Tm = (T * u_pois).sum(axis=1) / np.maximum(u_pois.sum(axis=1), 1e-12)
xs = X[:, 0]
sel = (xs > 2.0) & (xs < 5.0) & (Tm > 1e-8)
fit = np.polyfit(xs[sel], np.log(Tm[sel]), 1)
print(f"mixed-mean decay rate: {-fit[0]:.4f} 1/x "
      f"(Graetz leading mode for Pe={Pe:.0f}: ~{7.541/ (4*Pe) * 4:.3f})")
assert np.isfinite(T).all() and Tm[5] > Tm[-5] > 0
assert -fit[0] > 0.1  # clear exponential decay downstream
