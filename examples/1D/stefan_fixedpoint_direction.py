"""1D Stefan fixed-point map: left-vs-right interface motion — reference
examples/1D/LiquidMoving/fixedpointanalysis/fixedpoint_cells.jl:1-873.

The reference's 'cells' study asks whether the per-step fixed-point
iteration behaves differently when the interface must move LEFT vs RIGHT
from its starting guess (crossing cell boundaries in either direction),
and whether the map stays contractive across a multi-cell displacement
range.  Here: the map Phi is built once (candidate front is a traced
parameter), sampled over a +-0.2 window around the base front, and the
iteration is started from guesses displaced left and right by several
cells.

Gates: both directions converge to the SAME fixed point; iteration
counts are comparable (no directional pathology); the map is contractive
over the whole sampled window.

Run:  python examples/1D/stefan_fixedpoint_direction.py
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
    stefan_interface_position,
    interface_flux_1d,
)
from penguin_tpu.assembly import border_info

T0, k, St = 1.0, 1.0, 1.0
lam = find_lambda_stefan(St)
nx, lx = 80, 1.0
h = lx / nx
mesh = pt.Mesh((nx,), (lx,), (0.0,))
dt = 1e-3
t_start = 0.05
rhoL = 1.0 / St
xf_base = stefan_interface_position(t_start, k, lam)  # ~0.28

cap0 = pt.compute_capacity(pt.geometry.halfspace(0, xf_base), mesh)
C = np.asarray(cap0.C_om[..., 0])
Told = (jnp.asarray(np.maximum(
    T0 - T0 / erf(lam) * erf(C / (2 * np.sqrt(k * t_start))), 0.0)),
    jnp.zeros(mesh.np_shape))
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(T0),
                            "top": pt.Dirichlet(0.0)})
border = border_info(mesh, bc_b)


@jax.jit
def phi(xf_b):
    cap = compute_capacity_spacetime(
        _interp_body_1d, mesh, 0.0, dt, p=6, s=1,
        params=(jnp.asarray(xf_base), xf_b, dt))
    apply_fn, rhs_fn = build_moving_mono_system(
        cap, k, lambda *a: 0.0, pt.Dirichlet(0.0), border, t_start, dt,
        "BE")
    T = _direct_solve(apply_fn, rhs_fn(Told))
    flux, Va, Vb = interface_flux_1d(cap, k, T[0], T[1])
    return xf_b + (jnp.sum(Va) - jnp.sum(Vb) - flux / rhoL)


def iterate(x0, tol=1e-12, max_iter=80):
    xk = float(x0)
    for it in range(max_iter):
        xn = float(phi(jnp.asarray(xk)))
        if abs(xn - xk) < tol:
            return xn, it + 1
        xk = xn
    return xk, max_iter


disp = 0.2  # ~16 cells
x_left, n_left = iterate(xf_base - disp)
x_right, n_right = iterate(xf_base + disp)
print(f"from the LEFT  (start {xf_base - disp:.3f}): fixed point "
      f"{x_left:.6f} in {n_left} iterations")
print(f"from the RIGHT (start {xf_base + disp:.3f}): fixed point "
      f"{x_right:.6f} in {n_right} iterations")
assert abs(x_left - x_right) < 1e-8, (x_left, x_right)
assert max(n_left, n_right) <= 4 * max(min(n_left, n_right), 1), \
    (n_left, n_right)

# contraction across the whole displacement window (multi-cell crossings)
xs = jnp.linspace(xf_base - disp, xf_base + disp, 81)
phis = np.asarray(jax.vmap(phi)(xs))
slopes = np.diff(phis) / np.diff(np.asarray(xs))
print(f"map slope over [{float(xs[0]):.3f}, {float(xs[-1]):.3f}]: "
      f"min {slopes.min():+.3f}, max {slopes.max():+.3f}")
assert np.abs(slopes).max() < 1.0, slopes.max()
print("OK")
