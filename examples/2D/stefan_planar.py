"""2D Stefan with the height-function front: planar solidification driven
by a hot wall, matching the 1D similarity solution column-by-column —
reference examples/2D/LiquidMoving/stefan_planar.jl.

Run:  python examples/2D/stefan_planar.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp
from scipy.special import erf

import penguin_tpu as pt
from penguin_tpu.solvers.stefan2d_height import MovingLiquidDiffusionUnsteadyMono2D
from penguin_tpu.solvers.stefan1d import (find_lambda_stefan,
                                          stefan_interface_position)

T0, k, St = 1.0, 1.0, 1.0
rhoL = 1.0 / St
lam = find_lambda_stefan(St)
nx, ny, lx, ly = 16, 48, 0.8, 2.0
mesh = pt.Mesh((nx, ny), (lx, ly), (0.0, 0.0))
dt, t_start, t_end = 2e-3, 0.05, 0.09
hf0 = stefan_interface_position(t_start, k, lam)

cap0 = pt.compute_capacity(pt.geometry.halfspace(1, hf0), mesh, p=4, s=1)
C = np.asarray(cap0.C_om)
Tw0 = jnp.asarray(np.maximum(T0 - T0 / erf(lam)
                             * erf(C[..., 1] / (2 * np.sqrt(k * t_start))), 0.0))
phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0), lambda x, y, z, t: 0.0, k)
# scalar border keys: left/right = y-axis walls; hot wall at y=0 -> 'left'
bc_b = pt.BorderConditions({"left": pt.Dirichlet(T0), "right": pt.Dirichlet(0.0)})
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(1.0, 1.0, rhoL))
solver = MovingLiquidDiffusionUnsteadyMono2D(
    phase, bc_b, pt.Dirichlet(0.0), dt, (Tw0, jnp.zeros(mesh.np_shape)),
    mesh, "BE")
h0 = jnp.full(nx, hf0)
solver.solve(h0, 0.0, t_end - t_start - dt / 2, ic,
             newton_params=(60, 1e-9, 1e-9, 1.0), p=4, s=1)

h = np.asarray(solver.heights)
n_steps = len(solver.height_log)
s_exact = stefan_interface_position(t_start + n_steps * dt, k, lam)
print(f"front height: mean {h.mean():.4f} ± {h.std():.2e} "
      f"(planar => flat), analytic {s_exact:.4f}")
assert h.std() < 1e-6, "front must stay planar"
assert abs(h.mean() - s_exact) < 0.02
