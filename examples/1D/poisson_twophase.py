"""1D steady two-phase Poisson across an embedded interface (reference
examples/1D/Diffusion/Poisson_2ph.jl): phases with different conductivity
meet at x=4 with continuous value and flux; piecewise-linear exact
solution between Dirichlet ends.

Exact: with T(0)=1, T(L)=0, flux continuity gives a single kink at the
interface:  q = (T0 - TL) / (x_i/D1 + (L - x_i)/D2).

Run:  python examples/1D/poisson_twophase.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyDiph

nx, lx = 80, 8.0
xint = 4.0
D1, D2 = 1.0, 2.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
cap1 = pt.compute_capacity(pt.geometry.halfspace(0, xint), mesh)
cap2 = pt.compute_capacity(pt.geometry.halfspace(0, xint, -1.0), mesh)
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z: 0.0, D1)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z: 0.0, D2)
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(1.0), "top": pt.Dirichlet(0.0)})
# [[beta grad T . n]] = 0 with beta = D expresses PHYSICAL flux
# continuity (the reference's flux row carries beta only, not D —
# A_diph_stead_diff, src/solver/diffusion.jl:108,137-143)
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(D1, D2, 0.0))

solver = DiffusionSteadyDiph(ph1, ph2, bc_b, ic)
solver.solve(method="direct")

T1 = np.asarray(solver.x[0])
T2 = np.asarray(solver.x[2])
x1 = np.asarray(cap1.C_om[..., 0])
x2 = np.asarray(cap2.C_om[..., 0])
m1 = np.asarray(cap1.V) > 1e-12
m2 = np.asarray(cap2.V) > 1e-12

# the border Dirichlet rows impose the values at the border CELL CENTERS
a, b = x1[m1].min(), x2[m2].max()
q = (1.0 - 0.0) / ((xint - a) / D1 + (b - xint) / D2)
Ti = 1.0 - q * (xint - a) / D1  # interface temperature
ex1 = 1.0 - q * (x1 - a) / D1
ex2 = Ti - q * (x2 - xint) / D2
err = max(np.abs(T1[m1] - ex1[m1]).max(), np.abs(T2[m2] - ex2[m2]).max())
print(f"interface T exact = {Ti:.4f}; max error vs piecewise-linear exact = {err:.2e}")
assert err < 1e-8, err
print("1D two-phase Poisson is discretely exact")
