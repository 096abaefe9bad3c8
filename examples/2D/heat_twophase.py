"""2D two-phase unsteady diffusion across an embedded circle with a Henry
jump — reference examples/2D/Diffusion/Heat_2ph.jl.

Run:  python examples/2D/heat_twophase.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyDiph

n, L, R = 48, 4.0, 1.0
c = (2.0, 2.0)
mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
cap1 = pt.compute_capacity(pt.geometry.circle(c, R), mesh)          # inside
cap2 = pt.compute_capacity(pt.geometry.complement(pt.geometry.circle(c, R)), mesh)
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z, t: 0.0, 1.0)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z, t: 0.0, 2.0)
bc_b = pt.BorderConditions({k: pt.Dirichlet(1.0)
                            for k in ("left", "right", "top", "bottom")})
# Henry jump: T1 = 0.5 T2 at the interface, flux continuous
He = 0.5
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, He, 0.0),
                            pt.FluxJump(1.0, 1.0, 0.0))
z = jnp.zeros(mesh.np_shape)
u0 = (z, z, jnp.ones(mesh.np_shape), jnp.ones(mesh.np_shape))
dt = 0.25 * (L / n) ** 2
solver = DiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, dt, u0, "BE")
solver.solve(0.1, method="direct")

T1g = np.asarray(solver.x[1]); T2g = np.asarray(solver.x[3])
sel = np.abs(T2g) > 1e-12
ratio = T1g[sel] / T2g[sel]
print(f"interface jump ratio T1γ/T2γ: mean {ratio.mean():.4f} "
      f"(Henry He = {He}), spread {ratio.std():.1e}")
assert np.abs(ratio - He).max() < 1e-8
T1 = np.asarray(solver.x[0])
inside = np.asarray(cap1.cell_types) == 1
print(f"inner-phase range: [{T1[inside].min():.3f}, {T1[inside].max():.3f}] "
      f"(relaxing from 0 toward {He})")
