"""1D Stefan (free-boundary phase change) solver.

Re-design of ``/root/reference/src/liquidmotionsolver/diffusion.jl``
(MovingLiquidDiffusionUnsteadyMono): per time step, a fixed-point/Newton
iteration over the interface position xf:

1. solve the space-time slab temperature system with the interface
   interpolated linearly in time between the step-start anchor ``xf_a`` and
   the current iterate ``xf_b`` (body ``x - (xf_a (t1-t) + xf_b (t-t0))/dt``,
   diffusion.jl:280-288);
2. interface flux ``Σ Id Hᵀ Wꜝ (G Tω + H Tγ)`` (diffusion.jl:247-255);
3. residual ``res = ΣV(t0) - ΣV(t1) - flux/ρL`` (height bookkeeping per
   height_tracking.jl:22-65: the first/second time-face volume sums);
4. ``xf ← xf + step(res)`` with a pluggable learning-rate strategy
   (fixed / Barzilai-Borwein / secant, diffusion.jl:43-122).

The whole time loop — including the per-iteration geometry rebuild — runs
as one jitted scan with a ``lax.while_loop`` Newton inside; xf is a traced
scalar parameter of the capacity quadrature.

Deviation from the reference (documented): the slab rhs uses the *converged
previous-step state* throughout the Newton iterations, whereas the reference
feeds each iteration's solve back into the rhs (re-stepping the slab once
per iteration, diffusion.jl:363-365,413).  The residual definition and
update are identical; this variant is the consistent discrete Stefan
condition and converges to the same similarity solution.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..assembly import border_info
from ..boundary import BorderConditions
from ..capacity import compute_capacity_spacetime
from .diffusion import _ScalarSolverBase
from .moving_diffusion import (
    _direct_solve,
    _eval_D,
    build_moving_mono_system,
    slice_spacetime,
)

__all__ = ["MovingLiquidDiffusionUnsteadyMono", "interface_flux_1d",
           "find_lambda_stefan", "stefan_interface_position"]


def _interp_body_1d(x, t, params):
    """Fluid x < xf(t), xf linear in slab time (slab times are [0, dt])."""
    xf_a, xf_b, dt = params
    return x - (xf_a * (dt - t) + xf_b * t) / dt


def interface_flux_1d(cap_st, D, Tw, Tg):
    """Σ Id Hᵀ Wꜝ (G Tω + H Tγ) on the slab's spatial block."""
    ops, Va, Vb, Gamma0, C_sp, _ = slice_spacetime(cap_st)
    Id = _eval_D(D, C_sp)
    q = ops.flux(Tw, Tg)
    return jnp.sum(Id * ops.HT(q)), Va, Vb


def _lr_step(strategy, alpha, res, xf_b, prev_xf, prev_grad, it, eps=1e-8):
    """Learning-rate strategies (diffusion.jl:43-122), jax-traceable."""
    if strategy == "fixed":
        return alpha * res
    dx = xf_b - prev_xf
    dg = res - prev_grad
    have_prev = it > 0
    if strategy in ("bb", "barzilai_borwein"):
        denom = jnp.where(jnp.abs(dg) > eps, dg * dg, 0.0)
        lr = jnp.where(denom > 0, jnp.abs(dx * dg) / jnp.maximum(denom, 1e-300),
                       alpha)
        lr = jnp.where(have_prev, lr, alpha)
        return lr * res
    if strategy == "secant":
        prop = -res * dx / jnp.where(jnp.abs(dg) > eps, dg, 1.0)
        return jnp.where(have_prev & (jnp.abs(dg) > eps), prop, alpha * res)
    raise ValueError(f"unknown learning-rate strategy {strategy}")


class MovingLiquidDiffusionUnsteadyMono(_ScalarSolverBase):
    """1D one-phase Stefan solver."""

    def __init__(self, phase, bc_b, bc_i, dt, u0, mesh, scheme="BE"):
        self.phase = phase
        self.bc_b = bc_b
        self.bc_i = bc_i
        self.dt = float(dt)
        self.u0 = u0
        self.mesh = mesh
        self.scheme = scheme
        self.border = border_info(mesh, bc_b)

    def solve(self, xf0, t_start, t_end, ic, newton_params=(1000, 1e-10, 1e-10, 1.0),
              method="direct", lr_strategy="fixed", p=6, s=1):
        """Returns (x, xf_log, iters_log).  ``ic.flux.value`` is ρL."""
        dt = self.dt
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        max_iter, tol, reltol, alpha = newton_params
        max_iter = int(max_iter)
        rhoL = ic.flux.value
        D, f = self.phase.diffusion, self.phase.source
        bc_i, border, mesh, scheme = self.bc_i, self.border, self.mesh, self.scheme

        def slab_solve(Told, xf_a, xf_b, t):
            cap = compute_capacity_spacetime(
                _interp_body_1d, mesh, 0.0, dt, p=p, s=s,
                params=(xf_a, xf_b, dt),
            )
            apply_fn, rhs_fn = build_moving_mono_system(
                cap, D, f, bc_i, border, t, dt, scheme
            )
            T = _direct_solve(apply_fn, rhs_fn(Told))
            flux, Va, Vb = interface_flux_1d(cap, D, T[0], T[1])
            res = jnp.sum(Va) - jnp.sum(Vb) - flux / rhoL
            return T, res

        def newton(Told, xf_start, t):
            def cond(st):
                T, xf_b, pxf, pg, err, it = st
                return (it < max_iter) & (err > tol) & (err > reltol * jnp.abs(xf_b))

            def body(st):
                T, xf_b, pxf, pg, err, it = st
                Tn, res = slab_solve(Told, xf_start, xf_b, t)
                step = _lr_step(lr_strategy, alpha, res, xf_b, pxf, pg, it)
                return (Tn, xf_b + step, xf_b, res, jnp.abs(res), it + 1)

            init = (Told, xf_start, xf_start, jnp.asarray(0.0, xf_start.dtype),
                    jnp.asarray(jnp.inf, xf_start.dtype), 0)
            T, xf_b, _, _, err, it = jax.lax.while_loop(cond, body, init)
            return T, xf_b, err, it

        @jax.jit
        def run(u0, xf0):
            def step(carry, k):
                T, xf = carry
                t = t_start + k * dt
                Tn, xfn, err, it = newton(T, xf, t)
                return (Tn, xfn), (xfn, err, it)

            (Tf, xff), (xf_log, errs, iters) = jax.lax.scan(
                step, (u0, xf0), jnp.arange(K + 1.0)
            )
            return Tf, xff, xf_log, errs, iters

        dtype = self.u0[0].dtype
        Tf, xff, xf_log, errs, iters = run(self.u0, jnp.asarray(xf0, dtype))
        self.x = Tf
        self.xf = float(xff)
        self.xf_log = np.asarray(xf_log)
        self.newton_errs = np.asarray(errs)
        self.newton_iters = np.asarray(iters)
        self.states = [Tf]
        return self.x


class MovingLiquidDiffusionUnsteadyDiph(_ScalarSolverBase):
    """1D two-phase Stefan (Neumann problem): Newton over the front with
    the diphasic slab system; the residual sums the interface fluxes of
    both phases (reference liquidmotionsolver/diffusion.jl:653-900:
    ``res = H_{n+1} - H_n - (flux1 + flux2)/ρL``)."""

    def __init__(self, phase1, phase2, bc_b, ic, dt, u0, mesh, scheme="BE"):
        self.phase1, self.phase2 = phase1, phase2
        self.bc_b = bc_b
        self.ic = ic
        self.dt = float(dt)
        self.u0 = u0
        self.mesh = mesh
        self.scheme = scheme

    def solve(self, xf0, t_start, t_end, newton_params=(1000, 1e-10, 1e-10, 1.0),
              lr_strategy="fixed", p=6, s=1):
        from .moving_diffusion import build_moving_diph_stef_system \
            as build_moving_diph_system

        dt = self.dt
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        max_iter, tol, reltol, alpha = newton_params
        max_iter = int(max_iter)
        rhoL = self.ic.flux.value
        D1, f1 = self.phase1.diffusion, self.phase1.source
        D2, f2 = self.phase2.diffusion, self.phase2.source
        mesh, scheme, ic, bc_b = self.mesh, self.scheme, self.ic, self.bc_b

        def body2(x, t, params):
            return -_interp_body_1d(x, t, params)

        def slab_solve(Told, xf_a, xf_b, t):
            cap1 = compute_capacity_spacetime(
                _interp_body_1d, mesh, 0.0, dt, p=p, s=s,
                params=(xf_a, xf_b, dt),
            )
            cap2 = compute_capacity_spacetime(
                body2, mesh, 0.0, dt, p=p, s=s, params=(xf_a, xf_b, dt)
            )
            b1m = border_info(mesh, bc_b, phase_mask=cap1.cell_types[..., 0] != 0)
            b2m = border_info(mesh, bc_b, phase_mask=cap2.cell_types[..., 0] != 0)
            apply_fn, rhs_fn = build_moving_diph_system(
                cap1, cap2, D1, D2, f1, f2, ic, b1m, b2m, t, dt, scheme
            )
            X = _direct_solve(apply_fn, rhs_fn(Told))
            flux1, Va, Vb = interface_flux_1d(cap1, D1, X[0], X[1])
            flux2, _, _ = interface_flux_1d(cap2, D2, X[2], X[3])
            res = jnp.sum(Va) - jnp.sum(Vb) - (flux1 + flux2) / rhoL
            return X, res

        def newton(Told, xf_start, t):
            def cond(st):
                X, xf_b, pxf, pg, err, it = st
                return (it < max_iter) & (err > tol) & (err > reltol * jnp.abs(xf_b))

            def body(st):
                X, xf_b, pxf, pg, err, it = st
                Xn, res = slab_solve(Told, xf_start, xf_b, t)
                step = _lr_step(lr_strategy, alpha, res, xf_b, pxf, pg, it)
                return (Xn, xf_b + step, xf_b, res, jnp.abs(res), it + 1)

            init = (Told, xf_start, xf_start,
                    jnp.asarray(0.0, xf_start.dtype),
                    jnp.asarray(jnp.inf, xf_start.dtype), 0)
            X, xf_b, _, _, err, it = jax.lax.while_loop(cond, body, init)
            return X, xf_b, err, it

        @jax.jit
        def run(u0, xf0_):
            def stepf(carry, k):
                X, xf = carry
                t = t_start + k * dt
                Xn, xfn, err, it = newton(X, xf, t)
                return (Xn, xfn), (xfn, err, it)

            (Xf, xff), (xf_log, errs, iters) = jax.lax.scan(
                stepf, (u0, xf0_), jnp.arange(K + 1.0)
            )
            return Xf, xff, xf_log, errs, iters

        dtype = self.u0[0].dtype
        Xf, xff, xf_log, errs, iters = run(self.u0, jnp.asarray(xf0, dtype))
        self.x = Xf
        self.xf = float(xff)
        self.xf_log = np.asarray(xf_log)
        self.newton_errs = np.asarray(errs)
        self.newton_iters = np.asarray(iters)
        self.states = [Xf]
        return self.x


def find_lambda_stefan(stefan_number, x0=0.1):
    """λ with λ e^{λ²} erf λ = St/√π (Stefan_1d_1ph.jl:17-21)."""
    from scipy.optimize import brentq
    from scipy.special import erf

    fun = lambda lam: lam * np.exp(lam**2) * erf(lam) - stefan_number / np.sqrt(np.pi)
    return brentq(fun, 1e-6, 5.0)


def stefan_interface_position(t, k, lam):
    return 2.0 * lam * np.sqrt(k * t)


def find_lambda_stefan_two_phase(st_l, st_s, alpha_ratio=1.0):
    """λ for the two-phase Neumann problem (equal-property form):
    St_l/(e^{λ²} erf λ) - St_s √a/(e^{a λ²} erfc(λ√a)) = λ√π, a = α_l/α_s."""
    from scipy.optimize import brentq
    from scipy.special import erf, erfc

    a = alpha_ratio

    def fun(lam):
        return (
            st_l / (np.exp(lam**2) * erf(lam))
            - st_s * np.sqrt(a) / (np.exp(a * lam**2) * erfc(lam * np.sqrt(a)))
            - lam * np.sqrt(np.pi)
        )

    return brentq(fun, 1e-6, 3.0)
