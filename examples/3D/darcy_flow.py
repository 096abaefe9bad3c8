"""3D Darcy flow through a box with a pressure drop — reference
examples/3D/Darcy/DarcyFlow.jl.

Linear pressure field and uniform Darcy velocity (exact for constant
permeability).

Run:  python examples/3D/darcy_flow.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.darcy import DarcyFlow, solve_darcy_velocity

n, L = 16, 1.0
mesh = pt.Mesh((n, n, n), (L, L, L), (0.0, 0.0, 0.0))
cap = pt.compute_capacity(pt.geometry.full_domain(3), mesh, p=4, s=1)
ops = pt.make_diffusion_ops(cap)
K = 2.0  # permeability / viscosity
phase = pt.Phase(cap, ops, lambda x, y, z: 0.0, K)
# pressure drop along x: bottom/top are the x extremes in the scalar
# border-key convention
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(1.0),
                            "top": pt.Dirichlet(0.0)})
solver = DarcyFlow(phase, bc_b, pt.Dirichlet(0.0))
solver.solve(method="pgmres", tol=1e-11)

p = np.asarray(solver.x_omega)
q = solve_darcy_velocity(solver, phase)
qx = np.asarray(q[0])
interior = slice(2, n - 2)
dpdx = (p[3, n // 2, n // 2] - p[2, n // 2, n // 2]) / (L / n)
qm = qx[interior, interior, interior].mean()
qs = qx[interior, interior, interior].std()
print(f"pressure gradient along x: {dpdx:+.4f} "
      f"(-1/(L-h) = {-1/(L - L/n):.4f} with Dirichlet at the border cells)")
print(f"Darcy velocity u = -grad p (reference convention, darcy.jl:26-40): "
      f"interior mean {qm:+.4f} = |dp/dx|, std {qs:.2e}")
assert abs(dpdx + 1 / (L - L / n)) < 0.02
assert abs(qm + dpdx) < 0.02 and qs < 0.05
