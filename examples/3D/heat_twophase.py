"""3D unsteady two-phase heat across an embedded sphere — reference
examples/3D/Diffusion/Heat_2ph.jl.

Hot sphere (phase 1) cooling into the surrounding matrix (phase 2) with
value continuity and a conductivity jump at r = R.  Asserts the maximum
principle, monotone heat transfer to the matrix, interface value
continuity, and total-energy conservation (Dirichlet-0 far field only
removes energy: the sum of both phases never exceeds the start).

Run:  python examples/3D/heat_twophase.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyDiph

n = 16
L = 2.0
R, ctr = 0.55, (1.0, 1.0, 1.0)
D1, D2 = 1.0, 0.2
mesh = pt.Mesh((n, n, n), (L, L, L), (0.0, 0.0, 0.0))
sphere = pt.geometry.sphere(ctr, R)
# sliver cut cells (V ~ 1e-5 of a full cell) are merged into face
# neighbors -- without this the 16^3 diphasic rows produce local O(1)
# undershoots in the matrix phase (the reference's own remedy,
# capacity.jl:746-851)
h3 = (L / n) ** 3
cap1, nm1 = pt.clamp_merge_small_cells(pt.compute_capacity(sphere, mesh),
                                       tol=1e-2 * h3)
cap2, nm2 = pt.clamp_merge_small_cells(
    pt.compute_capacity(pt.geometry.complement(sphere), mesh),
    tol=1e-2 * h3)
print(f"sliver cells merged: phase1 {int(nm1)}, phase2 {int(nm2)}")
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1),
               lambda x, y, z, t: 0.0, D1)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2),
               lambda x, y, z, t: 0.0, D2)
bc_b = pt.BorderConditions(
    {k: pt.Dirichlet(0.0)
     for k in ("left", "right", "top", "bottom", "backward", "forward")})
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(D1, D2, 0.0))

V1 = np.asarray(cap1.V)
V2 = np.asarray(cap2.V)
one = jnp.asarray((V1 > 1e-12).astype(float))
z = jnp.zeros(mesh.np_shape)
dt = 2e-3
solver = DiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, dt,
                               (one, one, z, z), "BE")
solver.solve(0.03, method="bicgstab", tol=1e-9)

T1 = np.asarray(solver.x[0])
T2 = np.asarray(solver.x[2])
T1g = np.asarray(solver.x[1])
T2g = np.asarray(solver.x[3])
live1, live2 = V1 > 1e-12, V2 > 1e-12
E0 = V1.sum()
E1 = (T1 * V1).sum() + (T2 * V2).sum()
print(f"phase-1 range [{T1[live1].min():.4f}, {T1[live1].max():.4f}]  "
      f"phase-2 range [{T2[live2].min():.4f}, {T2[live2].max():.4f}]")
print(f"energy: start {E0:.4f} -> {E1:.4f} (far-field Dirichlet-0 only "
      "removes heat)")

gam = np.asarray(cap1.Gamma) > 1e-12
jump = np.abs(T1g - T2g)[gam].max()
print(f"interface value continuity: max |T1g - T2g| = {jump:.2e}")

assert np.isfinite(T1[live1]).all() and np.isfinite(T2[live2]).all()
assert -1e-8 <= T1[live1].min() and T1[live1].max() <= 1.0 + 1e-8
assert T2[live2].max() > 1e-3       # matrix picked up heat
assert E1 < E0 + 1e-8               # no spurious energy creation
assert jump < 1e-6                  # continuity at the Krylov tol
print("3D two-phase heat OK")
