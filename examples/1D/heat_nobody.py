"""1D unsteady heat with NO embedded body (full domain) — the reference's
no-interface sanity case (examples/1D/Diffusion/Heat_Nobody.jl: body
-1 everywhere, source f=1, mixed Dirichlet borders).  With no cut cells
every row is a plain finite-volume stencil; the long-time field must match
the exact steady solution of  -T'' = 1,  T(0)=10, T(L)=0.

Run:  python examples/1D/heat_nobody.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyMono

nx, lx = 40, 4.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
cap = pt.compute_capacity(pt.geometry.full_domain(1), mesh)
ops = pt.make_diffusion_ops(cap)
phase = pt.Phase(cap, ops, lambda x, y, z, t: 1.0, 1.0)
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(10.0), "top": pt.Dirichlet(0.0)})

z = jnp.zeros(mesh.np_shape)
dt = 0.01
solver = DiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(0.0), dt, (z, z), "CN")
solver.solve(20.0, method="direct")

T = np.asarray(solver.x_omega)[:nx]
x = np.asarray(cap.C_om[..., 0])[:nx]
# steady:  T'' = -1 with the border Dirichlet rows imposed at the border
# CELL CENTERS a = h/2, b = L - h/2 (the staggered border-row convention):
# T = A + B x - x^2/2 with T(a)=10, T(b)=0
a, b = x[0], x[-1]
B = (0.0 - 10.0 + (b**2 - a**2) / 2) / (b - a)
A = 10.0 - B * a + a**2 / 2
T_exact = A + B * x - x**2 / 2
err = np.abs(T - T_exact).max()
print(f"max |T - steady exact| = {err:.2e}")
assert err < 1e-3, err
print("1D no-body heat matches the exact steady profile")
