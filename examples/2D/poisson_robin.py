"""2D Poisson in an embedded circle with Dirichlet and Robin interface
conditions — reference examples/2D/Diffusion/Poisson.jl and Poisson_robin.jl.

Dirichlet gate: -ΔT = 4 in a circle of radius R, T=0 on the circle
=> T(r) = R² - r².

Run:  python examples/2D/poisson_robin.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyMono

n, L, R = 64, 4.0, 1.0
c = (2.0, 2.0)
mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
cap = pt.compute_capacity(pt.geometry.circle(c, R), mesh)
ops = pt.make_diffusion_ops(cap)
phase = pt.Phase(cap, ops, lambda x, y, z: 4.0, 1.0)
bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                            for k in ("left", "right", "top", "bottom")})

solver = DiffusionSteadyMono(phase, bc_b, pt.Dirichlet(0.0))
solver.solve(method="direct")
C = np.asarray(cap.C_om)
r2 = (C[..., 0] - c[0]) ** 2 + (C[..., 1] - c[1]) ** 2
exact = np.maximum(R**2 - r2, 0.0)
u = np.asarray(solver.x[0])
sel = np.asarray(cap.cell_types) == 1  # full cells
err = np.abs(u - exact)[sel].max()
print(f"Poisson-in-circle (Dirichlet): max full-cell error {err:.2e} (gate < 1e-2)")
assert err < 1e-2

# Robin interface alpha T + beta dT/dn = 0: analytic T(r) = R²-r² + 2R/α·β
alpha, beta = 2.0, 1.0
rob = DiffusionSteadyMono(phase, bc_b, pt.Robin(alpha, beta, 0.0))
rob.solve(method="direct")
ur = np.asarray(rob.x[0])
exact_r = exact + 2 * R * beta / alpha
err_r = np.abs(ur - exact_r)[sel].max()
print(f"Poisson-in-circle (Robin α=2): max full-cell error {err_r:.2e} (gate < 5e-2)")
assert err_r < 5e-2
