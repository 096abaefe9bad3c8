"""3D two-phase steady diffusion across an embedded sphere (Henry jump) —
reference examples/3D/Diffusion/Poisson_2ph.jl.

Run:  python examples/3D/poisson_twophase.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyDiph

n, L, R = 20, 4.0, 1.0
c = (L / 2 + 0.013,) * 3
mesh = pt.Mesh((n, n, n), (L, L, L), (0.0, 0.0, 0.0))
sph = pt.geometry.sphere(c, R)
cap1 = pt.compute_capacity(sph, mesh, p=4, s=1)
cap2 = pt.compute_capacity(pt.geometry.complement(sph), mesh, p=4, s=1)
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z: 1.0, 1.0)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z: 0.0, 2.0)
bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0) for k in
                            ("left", "right", "top", "bottom",
                             "backward", "forward")})
He = 0.5
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, He, 0.0),
                            pt.FluxJump(1.0, 1.0, 0.0))
solver = DiffusionSteadyDiph(ph1, ph2, bc_b, ic)
solver.solve(method="pgmres", tol=1e-11)

T1g = np.asarray(solver.x[1]); T2g = np.asarray(solver.x[3])
cut = np.asarray(cap1.cell_types) == -1
ratio = T1g[cut] / T2g[cut]
print(f"3D sphere Henry jump on cut cells: T1γ/T2γ mean {ratio.mean():.4f} "
      f"(He={He}), spread {np.abs(ratio - He).max():.1e}")
T1 = np.asarray(solver.x[0])
inside = np.asarray(cap1.cell_types) == 1
print(f"source-heated inner phase: max T = {T1[inside].max():.4f} > interface")
assert np.abs(ratio - He).max() < 1e-5
assert T1[inside].max() > T1g[cut].max() - 1e-9
