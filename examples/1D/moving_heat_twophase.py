"""1D prescribed-motion TWO-PHASE diffusion: the interface between two
phases translates at constant velocity; space-time slab capacities for
both phases are rebuilt inside the jitted scan (reference
examples/1D/SolidMoving/MovingHeat_2ph.jl).

A Henry-type jump (T1 = 0.5 T2) is enforced on the moving interface.

Run:  python examples/1D/moving_heat_twophase.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_diffusion import MovingDiffusionUnsteadyDiph

nx, lx = 80, 8.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
v = 1.0
# phase 1 occupies x < s(t) = 3 + v t;  phase 2 the rest
body1_st = lambda x, t: x - (3.0 + v * t)
body2_st = lambda x, t: -(x - (3.0 + v * t))

cap1 = pt.compute_capacity(lambda x: body1_st(x, 0.0), mesh)
cap2 = pt.compute_capacity(lambda x: body2_st(x, 0.0), mesh)
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z, t: 0.0, 1.0)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z, t: 0.0, 2.0)
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(1.0), "top": pt.Dirichlet(0.0)})
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 0.5, 0.0),
                            pt.FluxJump(1.0, 1.0, 0.0))

z = jnp.zeros(mesh.np_shape)
u0 = (jnp.ones(mesh.np_shape), z, z, z)
solver = MovingDiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, 5e-3, u0, mesh, "BE")
solver.solve(body1_st, body2_st, 0.0, 0.5, p=6, s=1)

T1 = np.asarray(solver.x[0])
T2 = np.asarray(solver.x[2])
cap1T = pt.compute_capacity(lambda x: body1_st(x, 0.5), mesh)
cap2T = pt.compute_capacity(lambda x: body2_st(x, 0.5), mesh)
m1 = np.asarray(cap1T.V) > 1e-10
m2 = np.asarray(cap2T.V) > 1e-10
g1 = np.asarray(solver.x[1])
g2 = np.asarray(solver.x[3])
i1 = np.abs(g1) > 1e-12
i2 = np.abs(g2) > 1e-12
ratio = g1[i1][-1] / g2[i2][-1]
print(f"phase-1 range: [{T1[m1].min():.4f}, {T1[m1].max():.4f}]  "
      f"phase-2 range: [{T2[m2].min():.4f}, {T2[m2].max():.4f}]")
print(f"moving-interface jump ratio T1g/T2g = {ratio:.3f} (expect 0.5)")
assert np.isfinite(T1[m1]).all() and np.isfinite(T2[m2]).all()
assert abs(ratio - 0.5) < 0.05
print("1D moving two-phase heat OK")
