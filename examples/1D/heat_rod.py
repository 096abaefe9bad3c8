"""1D two-phase diffusion across an embedded interface (Henry-type jump) —
reference examples/1D/Diffusion.

Run:  python examples/1D/heat_rod.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyDiph

nx, lx = 80, 8.0
xint = 4.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
cap1 = pt.compute_capacity(pt.geometry.halfspace(0, xint), mesh)
cap2 = pt.compute_capacity(pt.geometry.halfspace(0, xint, -1.0), mesh)
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z, t: 0.0, 1.0)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z, t: 0.0, 2.0)
bc_b = pt.BorderConditions({"top": pt.Dirichlet(0.0), "bottom": pt.Dirichlet(1.0)})
# Henry jump: T1 = 0.5 T2 at the interface, flux continuous
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 0.5, 0.0),
                            pt.FluxJump(1.0, 1.0, 0.0))
z = jnp.zeros(mesh.np_shape)
u0 = (jnp.ones(mesh.np_shape), jnp.ones(mesh.np_shape), z, z)
dt = 0.5 * (lx / nx) ** 2
solver = DiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, dt, u0, "BE")
solver.solve(0.5, method="direct")
T1 = np.asarray(solver.x[0])
T2 = np.asarray(solver.x[2])
g1 = np.asarray(solver.x[1]); g2 = np.asarray(solver.x[3])
i1 = np.abs(g1) > 0
ratio = g1[i1][0] / g2[np.abs(g2) > 0][0]
print(f"interface values: T1_gamma={g1[i1][:1]}, T2_gamma={g2[np.abs(g2)>0][:1]} "
      f"(jump ratio {ratio:.3f}, expect 0.5)")
assert abs(ratio - 0.5) < 0.01, ratio  # ScalarJump alpha ratio enforced discretely
