"""Darcy pressure solve + face velocities around an embedded disk —
reference examples/2D/Darcy.

Run:  python examples/2D/darcy_flow.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.darcy import DarcyFlow, solve_darcy_velocity

n = 48
mesh = pt.Mesh((n, n), (1.0, 1.0), (0.0, 0.0))
_disk = pt.geometry.circle((0.5, 0.5), 0.2)
disk = lambda x, y: -_disk(x, y)  # solid inclusion: fluid outside the disk
cap = pt.compute_capacity(disk, mesh, p=4, s=1)
ops = pt.make_diffusion_ops(cap)

lin = pt.Dirichlet(lambda x, y, z: 1.0 - x)  # drive left -> right
bc_b = pt.BorderConditions({k: lin for k in ("left", "right", "top", "bottom")})
phase = pt.Phase(cap, ops, lambda x, y, z: 0.0, 1.0)
solver = DarcyFlow(phase, bc_b, pt.Neumann(0.0))
solver.solve(method="direct")
u = solve_darcy_velocity(solver, phase)
ux = np.asarray(u[0])
wet = (np.asarray(cap.W[0]) > 0) & np.isfinite(ux)
mean_ux = ux[wet].mean()
print(f"mean Darcy u_x over wet faces: {mean_ux:.4f} "
      f"(impermeable inclusion slows the unit base flow)")
assert 0.6 < mean_ux < 1.0, mean_ux  # unit base flow, slowed by the inclusion
