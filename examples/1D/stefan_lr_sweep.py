"""1D Stefan: learning-rate strategy sweep for the front-update fixed-point
iteration (fixed / Barzilai-Borwein / RMSProp) — reference
examples/1D/LiquidMoving/stefan_learning_rates.jl and stefan_lr_sweep.jl.

All strategies must converge to the same front; they differ in iteration
count per time step.

Run:  python examples/1D/stefan_lr_sweep.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp
from scipy.special import erf

import penguin_tpu as pt
from penguin_tpu.solvers.stefan1d import (
    MovingLiquidDiffusionUnsteadyMono,
    find_lambda_stefan,
    stefan_interface_position,
)

T0, k = 1.0, 1.0
lam = find_lambda_stefan(1.0)
nx, lx = 64, 2.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
dt, t_start = 1e-3, 0.05
t_end = t_start + 20 * dt
xf0 = stefan_interface_position(t_start, k, lam)
cap0 = pt.compute_capacity(pt.geometry.halfspace(0, xf0), mesh)
Cc = np.asarray(cap0.C_om[..., 0])
Tw0 = jnp.asarray(np.maximum(
    T0 - T0 / erf(lam) * erf(Cc / (2 * np.sqrt(k * t_start))), 0.0))
phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0), lambda x, y, z, t: 0.0, k)
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(T0), "top": pt.Dirichlet(0.0)})
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(1.0, 1.0, 1.0))

print(f"{'strategy':12s} {'front':>8s} {'err':>9s} {'iters/step':>11s}")
for strat in ("fixed", "bb", "rmsprop"):
    s = MovingLiquidDiffusionUnsteadyMono(
        phase, bc_b, pt.Dirichlet(0.0), dt,
        (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE")
    s.solve(xf0, t_start, t_end, ic,
            newton_params=(200, 1e-10, 1e-10, 1.0), lr_strategy=strat)
    n = len(s.xf_log)
    s_exact = stefan_interface_position(t_start + n * dt, k, lam)
    print(f"{strat:12s} {s.xf:8.4f} {abs(s.xf - s_exact):9.2e} "
          f"{np.asarray(s.newton_iters).mean():11.1f}")
    assert abs(s.xf - s_exact) < 0.02
