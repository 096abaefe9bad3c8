"""1D two-phase concentration diffusion with a moving interface pinned at
the saturation concentration — reference examples/1D/Concentration/Conc.jl.

Run:  python examples/1D/concentration.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.concentration import DiffusionUnsteadyConcentration

nx, lx, xint = 64, 8.0, 4.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
body = lambda x, t: x - xint
body_c = lambda x, t: -(x - xint)
cap = pt.compute_capacity(pt.geometry.halfspace(0, xint), mesh)
ops = pt.make_diffusion_ops(cap)
ph1 = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)
ph2 = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 0.5)
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(0.0), "top": pt.Dirichlet(1.0)})
Cm = 0.5  # saturation concentration at the front
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, Cm), pt.FluxJump(1.0, 1.0, 0.0))
z = jnp.zeros(mesh.np_shape)
u0 = (z, z, jnp.ones(mesh.np_shape), jnp.ones(mesh.np_shape))
solver = DiffusionUnsteadyConcentration(ph1, ph2, bc_b, ic, 2e-3, u0, mesh)
solver.solve(body, body_c, 0.0, 0.05, method="direct")

C1, C1g, C2, C2g = [np.asarray(v) for v in solver.x]
print(f"interface pinned at Cm={Cm}: C1γ={C1g[np.abs(C1g) > 0][:1]}, "
      f"C2γ={C2g[np.abs(C2g) > 0][:1]}")
print(f"phase-1 range [{C1[1:nx//2].min():.3f}, {C1[1:nx//2].max():.3f}] "
      f"(expect within [0, {Cm}])")
assert abs(C1g[np.abs(C1g) > 0][0] - Cm) < 1e-8
assert C1[1:nx//2].max() < Cm + 1e-6
