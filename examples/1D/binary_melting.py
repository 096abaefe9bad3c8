"""1D binary alloy (coupled T + C, liquidus + partition closures) —
reference examples/1D/BinaryMelting/Binary2ph.jl.

Run:  python examples/1D/binary_melting.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.binary import DiffusionUnsteadyBinary

nx, lx, xint = 48, 8.0, 4.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
body = lambda x, t: x - xint
body_c = lambda x, t: -(x - xint)
cap = pt.compute_capacity(pt.geometry.halfspace(0, xint), mesh)
ops = pt.make_diffusion_ops(cap)
mk = lambda D: pt.Phase(cap, ops, lambda x, y, z, t: 0.0, D)
bc_T = pt.BorderConditions({"bottom": pt.Dirichlet(-0.5), "top": pt.Dirichlet(0.5)})
bc_C = pt.BorderConditions({"bottom": pt.Dirichlet(0.2), "top": pt.Dirichlet(0.8)})
z = jnp.zeros(mesh.np_shape)
u0 = tuple(z for _ in range(8))
Tm, m_liq, k_part = 0.1, -0.5, 0.6
solver = DiffusionUnsteadyBinary(mk(1.0), mk(1.0), mk(0.1), mk(0.1),
                                 bc_T, bc_C, 2e-3, u0, mesh, "BE",
                                 Tm=Tm, m_liq=m_liq, k_part=k_part)
solver.solve(body, body_c, 0.0, 0.02, method="direct")

T1w, T1g, T2w, T2g, C1w, C1g, C2w, C2g = [np.asarray(v) for v in solver.x]
ct = np.asarray(cap.cell_types)
sel = ct == -1
liq_err = np.abs(T1g[sel] - (Tm + m_liq * C1g[sel])).max()
part_err = np.abs(C2g[sel] - k_part * C1g[sel]).max()
print(f"liquidus closure |T1γ - (Tm + m C1γ)| = {liq_err:.2e}")
print(f"partition closure |C2γ - k C1γ|      = {part_err:.2e}")
assert liq_err < 1e-8 and part_err < 1e-8
