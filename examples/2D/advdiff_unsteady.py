"""2D unsteady advection-diffusion: Gaussian blob in rigid-body rotation —
reference examples/2D/AdvectionDiffusion/AdvDiff_unsteady.jl.

After a half rotation the blob must sit diametrically opposite, spread by
diffusion, with mass conserved.

Run:  python examples/2D/advdiff_unsteady.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import AdvectionDiffusionUnsteadyMono

n, L = 64, 4.0
c = (2.0, 2.0)
D = 2e-3
mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh)
C = np.asarray(cap.C_om)
X, Y = C[..., 0], C[..., 1]
om = 1.0
u_bulk = (jnp.asarray(-om * (Y - c[1])), jnp.asarray(om * (X - c[0])))
conv = pt.make_convection_ops(cap, u_bulk, jnp.zeros(mesh.np_shape))
bcd = pt.Dirichlet(0.0)
bc_b = pt.BorderConditions({k: bcd for k in ("left", "right", "top", "bottom")})
phase = pt.Phase(cap, conv, lambda x, y, z, t: 0.0, D)

x0, y0, sig = 3.0, 2.0, 0.18
u0 = jnp.asarray(np.exp(-((X - x0) ** 2 + (Y - y0) ** 2) / (2 * sig**2)))
dt = 0.25 * (L / n)
solver = AdvectionDiffusionUnsteadyMono(phase, bc_b, bcd, dt, (u0, u0), "CN")
t_end = np.pi  # half rotation
solver.solve(t_end, method="bicgstab")

u = np.asarray(solver.x_omega)
i, j = np.unravel_index(np.argmax(u), u.shape)
print(f"blob center after half turn: ({X[i,j]:.2f}, {Y[i,j]:.2f})  "
      f"expect near (1.0, 2.0)")
m0, m1 = float(u0.sum()), u.sum()
print(f"mass ratio: {m1/m0:.4f}")
assert abs(X[i, j] - 1.0) < 0.3 and abs(Y[i, j] - 2.0) < 0.3
assert abs(m1 / m0 - 1.0) < 0.05
