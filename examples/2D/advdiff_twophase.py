"""2D steady two-phase advection-diffusion across an embedded circle —
reference examples/2D/AdvectionDiffusion/AdvDiff_2ph.jl.

A uniform flow sweeps a two-phase scalar with a Henry jump at the
interface; the jump ratio must hold exactly at every cut cell.

Run:  python examples/2D/advdiff_twophase.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import AdvectionDiffusionSteadyDiph

n, L, R = 40, 4.0, 1.0
c = (2.0, 2.0)
mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
inner = pt.geometry.circle(c, R)
outer = pt.geometry.complement(inner)
cap1 = pt.compute_capacity(inner, mesh, p=4, s=1)
cap2 = pt.compute_capacity(outer, mesh, p=4, s=1)
u_bulk = (jnp.full(mesh.np_shape, 0.5), jnp.zeros(mesh.np_shape))
zg = jnp.zeros(mesh.np_shape)
conv1 = pt.make_convection_ops(cap1, u_bulk, zg)
conv2 = pt.make_convection_ops(cap2, u_bulk, zg)
ph1 = pt.Phase(cap1, conv1, lambda x, y, z: 1.0, 1.0)   # inner source
ph2 = pt.Phase(cap2, conv2, lambda x, y, z: 0.0, 2.0)
bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                            for k in ("left", "right", "top", "bottom")})
He = 0.5
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, He, 0.0),
                            pt.FluxJump(1.0, 2.0, 0.0))
solver = AdvectionDiffusionSteadyDiph(ph1, ph2, bc_b, ic)
solver.solve(method="pgmres", tol=1e-11)

T1g = np.asarray(solver.x[1]); T2g = np.asarray(solver.x[3])
cut = np.asarray(cap1.cell_types) == -1
ratio = T1g[cut] / T2g[cut]
T1 = np.asarray(solver.x[0]); T2 = np.asarray(solver.x[2])
print(f"advective Henry jump: T1γ/T2γ dev {np.abs(ratio - He).max():.1e} "
      f"on {cut.sum()} cut cells (He = {He})")
# advection skews the outer plume downstream: compare wake vs upwind side
i_up, i_dn = int((c[0] - 1.5 * R) / (L / n)), int((c[0] + 1.5 * R) / (L / n))
jmid = n // 2
print(f"outer field: upwind {T2[i_up, jmid]:.4f} < downstream "
      f"{T2[i_dn, jmid]:.4f} (plume advected)")
assert np.abs(ratio - He).max() < 1e-6
assert T2[i_dn, jmid] > T2[i_up, jmid] > 0
