"""2D Stefan with height-function front: a Gaussian bump in the initial
front smooths out as it solidifies (curvature-free height dynamics damp
the perturbation) — reference examples/2D/LiquidMoving/stefan_gaussian.jl.

Run:  python examples/2D/stefan_gaussian.py
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

T0, k = 1.0, 1.0
lam = find_lambda_stefan(1.0)
nx, ny, lx, ly = 24, 40, 1.2, 2.0
mesh = pt.Mesh((nx, ny), (lx, ly), (0.0, 0.0))
dt, t_start = 2e-3, 0.05
hf0 = stefan_interface_position(t_start, k, lam)

xs = np.linspace(0, lx, nx, endpoint=False) + lx / nx / 2
bump = 0.08 * np.exp(-((xs - lx / 2) ** 2) / (2 * 0.02))
h0 = jnp.asarray(hf0 + bump)

# capacity from the bumped front (fluid below the height line)
def body0(x, y):
    b = 0.08 * jnp.exp(-((x - lx / 2) ** 2) / (2 * 0.02))
    return y - (hf0 + b)

cap0 = pt.compute_capacity(body0, mesh, p=4, s=1)
C = np.asarray(cap0.C_om)
Tw0 = jnp.asarray(np.maximum(
    T0 - T0 / erf(lam) * erf(C[..., 1] / (2 * np.sqrt(k * t_start))), 0.0))
phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0), lambda x, y, z, t: 0.0, k)
bc_b = pt.BorderConditions({"left": pt.Dirichlet(T0), "right": pt.Dirichlet(0.0)})
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(1.0, 1.0, 1.0))
solver = MovingLiquidDiffusionUnsteadyMono2D(
    phase, bc_b, pt.Dirichlet(0.0), dt, (Tw0, jnp.zeros(mesh.np_shape)),
    mesh, "BE")
solver.solve(h0, 0.0, 30 * dt, ic, newton_params=(60, 1e-9, 1e-9, 1.0),
             p=4, s=1)

h = np.asarray(solver.heights)
amp0 = float(bump.max() - bump.min())
amp = float(h.max() - h.min())
print(f"front roughness: initial {amp0:.4f} -> final {amp:.4f} "
      f"(diffusive front smooths the bump)")
print(f"mean height {h.mean():.4f} > initial {hf0:.4f} (front advanced)")
assert amp < 0.8 * amp0
assert h.mean() > hf0 + 0.01
