"""Binary alloy solidification: coupled temperature/concentration with
liquidus slope and solute partition at the interface — reference
examples/2D/BinaryMelting.

Run:  python examples/2D/binary_melting.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.binary import DiffusionUnsteadyBinary

nx, lx = 48, 8.0
xint = 4.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
body = lambda x, t: x - xint
body_c = lambda x, t: -(x - xint)

def mk():
    cap = pt.compute_capacity(pt.geometry.halfspace(0, xint), mesh)
    return pt.Phase(cap, pt.make_diffusion_ops(cap),
                    lambda x, y, z, t: 0.0, 1.0)

bc_T = pt.BorderConditions({"bottom": pt.Dirichlet(0.2), "top": pt.Dirichlet(-0.1)})
bc_C = pt.BorderConditions({"bottom": pt.Dirichlet(0.1), "top": pt.Dirichlet(0.5)})
zv = jnp.zeros(mesh.np_shape)
hv = 0.3 * jnp.ones(mesh.np_shape)
u0 = (zv, zv, zv, zv, hv, hv, hv, hv)
dt = 2e-3
solver = DiffusionUnsteadyBinary(mk(), mk(), mk(), mk(), bc_T, bc_C,
                                 dt, u0, mesh, "BE", Tm=0.0, m_liq=-0.5,
                                 k_part=0.8)
solver.solve(body, body_c, 0.0, 10 * dt, method="direct")
T1, T1g, T2, T2g, C1, C1g, C2, C2g = [np.asarray(v) for v in solver.x]
g = np.asarray(solver.x[1]) != 0
Tg = T1g[np.abs(T1g) > 0][0]
C1v = C1g[np.abs(C1g) > 0][0]
C2v = C2g[np.abs(C2g) > 0][0]
print(f"interface: T_gamma={Tg:.6f}, C1_gamma={C1v:.6f}, C2_gamma={C2v:.6f} "
      f"(partition C2=k C1, liquidus T=Tm+m C1)")
assert abs(C2v - 0.8 * C1v) < 1e-6, (C1v, C2v)          # partition row
assert abs(Tg - (0.0 - 0.5 * C1v)) < 1e-6, (Tg, C1v)    # liquidus row
