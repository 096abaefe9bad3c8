"""3D steady Poisson inside an embedded sphere — reference
examples/3D/Diffusion/Poisson.jl (30³ grid, sphere R=ly/3, unit source,
Dirichlet interface), with the analytic gate the reference leaves to
its convergence checker: -ΔT = 1 in a sphere, T=0 on r=R
=> T(r) = (R² - r²)/6.

Also exercises the VTK export path like the reference script does.

Run:  python examples/3D/poisson.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import tempfile

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyMono
from penguin_tpu.vtk import write_vtk

n, L = 30, 4.0
R = L / 3.0
c = (L / 2, L / 2, L / 2)
mesh = pt.Mesh((n, n, n), (L, L, L), (0.0, 0.0, 0.0))
cap = pt.compute_capacity(pt.geometry.sphere(c, R), mesh)
ops = pt.make_diffusion_ops(cap)
phase = pt.Phase(cap, ops, lambda x, y, z: 1.0, 1.0)
bc = pt.Dirichlet(1.0)  # far border value (inactive: the sphere is interior)
bc_b = pt.BorderConditions({k: bc for k in
                            ("left", "right", "top", "bottom", "front", "back")})

solver = DiffusionSteadyMono(phase, bc_b, pt.Dirichlet(0.0))
solver.solve()

C = np.asarray(cap.C_om)
r2 = sum((C[..., d] - c[d]) ** 2 for d in range(3))
exact = np.maximum(R**2 - r2, 0.0) / 6.0
u = np.asarray(solver.x[0])
sel = np.asarray(cap.cell_types) == 1  # full cells
err = np.abs(u - exact)[sel].max()
print(f"3D Poisson-in-sphere: max full-cell error {err:.2e} (gate < 5e-3)")
assert err < 5e-3

out = _os.path.join(tempfile.mkdtemp(), "poisson_3d")
fn = write_vtk(out, mesh, solver)
print(f"VTK written: {fn}")
