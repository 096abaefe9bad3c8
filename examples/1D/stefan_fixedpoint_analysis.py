"""1D Stefan fixed-point iteration analysis (reference
examples/1D/LiquidMoving/fixedpointanalysis/{fixedpoint,fixedpoint_analysis,
fixedpoint_cells}.jl): how the per-step interface fixed-point iteration
xf <- xf + alpha*res converges as a function of the relaxation factor and
where the front sits inside a cell.

For each relaxation alpha we run ONE time step of the similarity problem
and report the Newton iteration count; the contraction-style sweep over
the front's sub-cell position checks the iteration cost is insensitive to
where the front cuts the cell (the reference's 'cells' study).

Run:  python examples/1D/stefan_fixedpoint_analysis.py
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

T0, k, St = 1.0, 1.0, 1.0
lam = find_lambda_stefan(St)
nx, lx = 64, 2.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
dt = 1e-3
t_start = 0.05


def one_step(xf0, alpha):
    cap0 = pt.compute_capacity(pt.geometry.halfspace(0, xf0), mesh)
    C = np.asarray(cap0.C_om[..., 0])
    Tw0 = jnp.asarray(np.maximum(
        T0 - T0 / erf(lam) * erf(C / (2 * np.sqrt(k * t_start))), 0.0))
    phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0),
                     lambda x, y, z, t: 0.0, k)
    bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(T0),
                                "top": pt.Dirichlet(0.0)})
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, 1.0 / St))
    s = MovingLiquidDiffusionUnsteadyMono(
        phase, bc_b, pt.Dirichlet(0.0), dt,
        (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE")
    s.solve(xf0, t_start, t_start + dt, ic,
            newton_params=(500, 1e-10, 1e-10, alpha))
    return int(s.newton_iters[0]), float(s.xf)


xf0 = stefan_interface_position(t_start, k, lam)
print("relaxation sweep (one step, fixed-point iterations to 1e-10):")
its_by_alpha = {}
for alpha in (0.5, 0.8, 1.0, 1.2):
    its, xf1 = one_step(xf0, alpha)
    its_by_alpha[alpha] = its
    print(f"  alpha={alpha:4.1f}  iters={its:4d}  xf1={xf1:.6f}")

# sub-cell position sweep at alpha=1 (the reference's 'cells' study)
h = lx / nx
print("front sub-cell position sweep (alpha=1):")
cell_iters = []
for frac in (0.1, 0.3, 0.5, 0.7, 0.9):
    base = np.floor(xf0 / h) * h
    its, _ = one_step(base + frac * h, 1.0)
    cell_iters.append(its)
    print(f"  xf0 = cell + {frac:.1f}h  iters={its:4d}")

assert its_by_alpha[1.0] <= its_by_alpha[0.5]  # under-relaxation is slower
assert max(cell_iters) <= 3 * max(min(cell_iters), 1)  # cut position is benign
print("fixed-point behavior matches the reference study: relaxation ~1 is "
      "optimal and the iteration count is insensitive to the cut position")
