"""1D UNSTEADY diphasic heat with a Henry jump at a static interface,
validated against the analytic two-sided erfc profile — reference
examples/1D/Diffusion/Heat_2ph.jl (the CI-grade gate lives in
tests/test_diffusion_unsteady.py; this is the runnable example view).

A step in concentration diffuses across x = x_int where T1 = He * T2 and
flux is continuous:  T1 = -He/(1 + He sqrt(D1/D2)) (erfc(xi_1) - 2),
T2 = 1 - He/(1 + He sqrt(D1/D2)) erfc(xi_2).

Run:  python examples/1D/heat_twophase_unsteady.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp
from scipy.special import erfc

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyDiph

nx, lx, xint = 100, 8.0, 4.0
He, D1, D2 = 0.5, 1.0, 1.0
t_end = 0.5
mesh = pt.Mesh((nx,), (lx,), (0.0,))
body = pt.geometry.halfspace(0, xint)           # phase 1: x < xint
body_c = pt.geometry.halfspace(0, xint, -1.0)   # phase 2: x > xint
cap1 = pt.compute_capacity(body, mesh)
cap2 = pt.compute_capacity(body_c, mesh)
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z, t: 0.0, D1)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z, t: 0.0, D2)
bc_b = pt.BorderConditions({"top": pt.Dirichlet(1.0),
                            "bottom": pt.Dirichlet(0.0)})
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, He, 0.0),
                            pt.FluxJump(1.0, 1.0, 0.0))
z = jnp.zeros(mesh.np_shape)
u0 = (z, z, jnp.ones(mesh.np_shape), jnp.ones(mesh.np_shape))
dt = 0.5 * (lx / nx) ** 2
solver = DiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, dt, u0, "BE")
solver.solve(t_end, method="direct")

lam = -He / (1 + He * np.sqrt(D1 / D2))
T1e = lambda x: lam * (erfc((x - xint) / (2 * np.sqrt(D1 * t_end))) - 2)
T2e = lambda x: lam * erfc((x - xint) / (2 * np.sqrt(D2 * t_end))) + 1

xs = np.asarray(cap1.C_om)[..., 0]
T1 = np.asarray(solver.x[0])
T2 = np.asarray(solver.x[2])
V1 = np.asarray(cap1.V)
V2 = np.asarray(cap2.V)
# the reference CI gate is the volume-weighted GLOBAL L2 error
# (convergence_test.jl); the max-norm sits at the cut cell and is larger
e1 = float(np.sqrt((((T1 - T1e(xs)) ** 2) * V1).sum() / V1.sum()))
e2 = float(np.sqrt((((T2 - T2e(xs)) ** 2) * V2).sum() / V2.sum()))
T1g = np.asarray(solver.x[1])
T2g = np.asarray(solver.x[3])
cut = np.asarray(cap1.cell_types) == -1
jump = (T1g[cut] / T2g[cut])
print(f"phase errors vs erfc: e1 = {e1:.2e}, e2 = {e2:.2e} @ n={nx}")
print(f"interface: T1γ/T2γ = {jump.mean():.6f} (He = {He})")
assert e1 < 1e-2 and e2 < 1e-2       # the reference CI tolerance
assert np.abs(jump - He).max() < 1e-8
print("1D diphasic Henry diffusion OK")
