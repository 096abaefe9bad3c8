"""1D Stefan fixed-point MAP analysis — reference
examples/1D/LiquidMoving/fixedpointanalysis/fixedpoint_analysis.jl:1-400.

The per-step interface update is the fixed-point iteration
``xf <- Phi(xf) = xf + res(xf)`` where ``res`` is the Stefan height/flux
residual of the slab solved with the candidate front.  The reference
study samples Phi over a range of candidate positions, locates the fixed
point by the sign change of ``Phi(x) - x``, and simulates the iteration
trajectory.  Here the map is evaluated in a single vmapped sweep (the
slab capacity takes the candidate front as a TRACED parameter — no
per-sample recompilation, unlike the reference's per-sample assembly).

Gates: the located fixed point matches the analytic similarity front
after one dt to a fraction of a cell; |Phi'| < 1 near the fixed point
(contraction — why plain relaxation alpha=1 converges); the simulated
iteration reaches the fixed point in a handful of steps.

Run:  python examples/1D/stefan_fixedpoint_map.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import erf

import penguin_tpu as pt
from penguin_tpu.capacity import compute_capacity_spacetime
from penguin_tpu.solvers.stefan1d import (
    _direct_solve,
    _interp_body_1d,
    build_moving_mono_system,
    find_lambda_stefan,
    interface_flux_1d,
    stefan_interface_position,
)
from penguin_tpu.assembly import border_info

T0, k, St = 1.0, 1.0, 1.0
lam = find_lambda_stefan(St)
nx, lx = 64, 2.0
h = lx / nx
mesh = pt.Mesh((nx,), (lx,), (0.0,))
dt = 1e-3
t_start = 0.05
rhoL = 1.0 / St

xf_prev = stefan_interface_position(t_start, k, lam)
xf_next_exact = stefan_interface_position(t_start + dt, k, lam)

cap0 = pt.compute_capacity(pt.geometry.halfspace(0, xf_prev), mesh)
C = np.asarray(cap0.C_om[..., 0])
Told = (jnp.asarray(np.maximum(
    T0 - T0 / erf(lam) * erf(C / (2 * np.sqrt(k * t_start))), 0.0)),
    jnp.zeros(mesh.np_shape))

bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(T0),
                            "top": pt.Dirichlet(0.0)})
border = border_info(mesh, bc_b)
bc_i = pt.Dirichlet(0.0)


def phi(xf_b):
    """One fixed-point map evaluation: solve the slab with the candidate
    future front xf_b (previous front fixed at xf_prev), return
    xf_b + res."""
    cap = compute_capacity_spacetime(
        _interp_body_1d, mesh, 0.0, dt, p=6, s=1,
        params=(jnp.asarray(xf_prev), xf_b, dt))
    apply_fn, rhs_fn = build_moving_mono_system(
        cap, k, lambda *a: 0.0, bc_i, border, t_start, dt, "BE")
    T = _direct_solve(apply_fn, rhs_fn(Told))
    flux, Va, Vb = interface_flux_1d(cap, k, T[0], T[1])
    res = jnp.sum(Va) - jnp.sum(Vb) - flux / rhoL
    return xf_b + res


# --- sample the map over ~5 cells around the previous front -------------
xs = jnp.linspace(xf_prev - 2.0 * h, xf_prev + 3.0 * h, 161)
phis = jax.jit(jax.vmap(phi))(xs)
g = np.asarray(phis) - np.asarray(xs)
sign_change = np.where(np.diff(np.sign(g)) != 0)[0]
assert sign_change.size >= 1, "no fixed point located in the sampled range"
i0 = int(sign_change[0])
# linear interpolation of the crossing
x_star = float(xs[i0] - g[i0] * (xs[i0 + 1] - xs[i0]) / (g[i0 + 1] - g[i0]))
print(f"fixed point x* = {x_star:.6f}; analytic front(t+dt) = "
      f"{xf_next_exact:.6f}  (diff {abs(x_star - xf_next_exact)/h:.3f} h)")
assert abs(x_star - xf_next_exact) < 0.5 * h, (x_star, xf_next_exact)

# --- contraction factor near the fixed point ----------------------------
eps = 0.05 * h
dphi = float((phi(jnp.asarray(x_star + eps))
              - phi(jnp.asarray(x_star - eps))) / (2 * eps))
print(f"|Phi'(x*)| = {abs(dphi):.4f}  (contraction: < 1)")
assert abs(dphi) < 1.0, dphi

# --- simulate the iteration from the previous front ---------------------
xk = float(xf_prev)
traj = [xk]
for _ in range(50):
    xk = float(phi(jnp.asarray(xk)))
    traj.append(xk)
    if abs(traj[-1] - traj[-2]) < 1e-12:
        break
print(f"iteration trajectory: {len(traj) - 1} steps, "
      f"final {traj[-1]:.8f} (|final - x*| = {abs(traj[-1] - x_star):.2e})")
assert abs(traj[-1] - x_star) < 1e-5, (traj[-1], x_star)
assert len(traj) - 1 <= 50
print("OK")
