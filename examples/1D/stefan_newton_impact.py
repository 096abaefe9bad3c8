"""1D Stefan: impact of the per-step Newton iteration budget on front
accuracy — reference examples/1D/LiquidMoving/stefan_impact.jl
(analyze_newton_iterations_impact).

Runs the melting similarity problem over a fixed horizon with the
interface Newton capped at 1, 2, 5 and 20 iterations per step, comparing
the final front position against the analytic x_f = 2 lambda sqrt(k t).
Gates: truncating the Newton at 1 iteration costs measurable accuracy,
and the error saturates once the inner loop converges (5 vs 20 equal).

Run:  python examples/1D/stefan_newton_impact.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

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
nx, lx = 160, 2.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
# the budget only matters when the front moves a meaningful fraction of a
# cell per step — large dt makes the per-step Newton genuinely nonlinear
dt = 5e-3
t_start, t_end = 0.05, 0.15


def run(max_iter):
    xf0 = stefan_interface_position(t_start, k, lam)
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
    s.solve(xf0, t_start, t_end, ic,
            newton_params=(max_iter, 1e-12, 1e-12, 1.0))
    iters = np.asarray(s.newton_iters)
    return float(s.xf), float(iters.mean())


# the reference compares each truncated run against a CONVERGED reference
# solution (its reference_nx run), isolating the Newton-truncation error
# from the spatial discretization floor
xf_ref, _ = run(50)
errs = {}
for m in (1, 2, 5, 20):
    xf_m, mean_it = run(m)
    errs[m] = abs(xf_m - xf_ref)
    print(f"max_iter={m:3d}: |xf - converged| = {errs[m]:.3e} "
          f"(mean iters used {mean_it:.1f})")

xf_exact = stefan_interface_position(t_end, k, lam)
print(f"converged front {xf_ref:.5f} vs analytic {xf_exact:.5f}")

# one Newton iteration per step visibly lags the converged front
assert errs[1] > 5.0 * max(errs[5], 1e-12), errs
# the budget saturates: 20 == 50 to rounding
assert errs[20] < 1e-8, errs
# sanity only: at this deliberately coarse dt the O(dt) BE front lag is
# ~1.5e-2 (the accuracy studies live in stefan1d_convergence.py)
assert abs(xf_ref - xf_exact) < 0.03, (xf_ref, xf_exact)
print("Newton-budget study matches the reference: accuracy saturates once "
      "the per-step interface Newton converges")
