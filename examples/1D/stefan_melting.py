"""1D one-phase Stefan melting vs the analytic similarity solution
(reference benchmark/Stefan_1d_1ph.jl).

Run:  python examples/1D/stefan_melting.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))) if "examples" in __file__ else _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from scipy.special import erf

import penguin_tpu as pt
from penguin_tpu.solvers.stefan1d import (
    MovingLiquidDiffusionUnsteadyMono,
    find_lambda_stefan,
    stefan_interface_position,
)

T0, k, St = 1.0, 1.0, 1.0
lam = find_lambda_stefan(St)
nx, lx = 96, 2.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
dt = 5e-4
t_start, t_end = 0.05, 0.15
xf0 = stefan_interface_position(t_start, k, lam)

cap0 = pt.compute_capacity(pt.geometry.halfspace(0, xf0), mesh)
C = np.asarray(cap0.C_om[..., 0])
Tw0 = jnp.asarray(np.maximum(T0 - T0 / erf(lam) * erf(C / (2 * np.sqrt(k * t_start))), 0.0))

phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0), lambda x, y, z, t: 0.0, k)
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(T0), "top": pt.Dirichlet(0.0)})
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0), pt.FluxJump(1.0, 1.0, 1.0 / St))

solver = MovingLiquidDiffusionUnsteadyMono(
    phase, bc_b, pt.Dirichlet(0.0), dt, (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE"
)
solver.solve(xf0, t_start, t_end, ic, newton_params=(200, 1e-10, 1e-10, 1.0))

n = len(solver.xf_log)
t_eff = t_start + n * dt
xf_exact = stefan_interface_position(t_eff, k, lam)
print(f"front: {solver.xf:.5f}  analytic: {xf_exact:.5f}")
assert abs(solver.xf - xf_exact) / xf_exact < 0.05, (solver.xf, xf_exact)
