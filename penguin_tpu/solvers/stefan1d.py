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
from jax.flatten_util import ravel_pytree

from ..assembly import border_info
from ..capacity import compute_capacity_spacetime
from .diffusion import _ScalarSolverBase
from .moving_diffusion import (
    _direct_solve,
    _eval_D,
    build_moving_mono_system,
    slice_spacetime,
)

__all__ = ["MovingLiquidDiffusionUnsteadyMono",
           "MovingLiquidDiffusionUnsteadyMonoCoupled",
           "MovingLiquidDiffusionUnsteadyDiph", "solve_stefan_1d_adaptive",
           "interface_flux_1d", "find_lambda_stefan",
           "find_lambda_stefan_two_phase", "stefan_interface_position"]


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


def lr_state_init(dtype):
    """(grad_accum, mean_grad_sq, m, v) accumulators (LearningRateState,
    diffusion.jl:3-41)."""
    z = jnp.asarray(0.0, dtype)
    return (z, z, z, z)


def _lr_step(strategy, alpha, res, xf_b, prev_xf, prev_grad, it,
             lr_state=None, eps=1e-8, beta1=0.9, beta2=0.999):
    """Learning-rate strategies (apply_learning_rate_step!,
    diffusion.jl:43-122), jax-traceable.  Returns (step, new_lr_state)."""
    if lr_state is None:
        lr_state = lr_state_init(jnp.asarray(res).dtype)
    accum, msq, m, v = lr_state
    if strategy == "fixed":
        return alpha * res, lr_state
    if strategy == "adagrad":
        accum = accum + res * res
        lr = alpha / (jnp.sqrt(accum) + eps)
        return lr * res, (accum, msq, m, v)
    if strategy == "rmsprop":
        msq = beta2 * msq + (1 - beta2) * res * res
        lr = alpha / (jnp.sqrt(msq) + eps)
        return lr * res, (accum, msq, m, v)
    if strategy == "nadam":
        tt = it + 1.0
        m = beta1 * m + (1 - beta1) * res
        v = beta2 * v + (1 - beta2) * res * res
        bc1 = jnp.maximum(1 - beta1**tt, eps)
        bc2 = jnp.maximum(1 - beta2**tt, eps)
        m_hat = m / bc1
        v_hat = v / bc2
        lr = alpha / (jnp.sqrt(v_hat) + eps)
        direction = beta1 * m_hat + (1 - beta1) * res / bc1
        return lr * direction, (accum, msq, m, v)
    dx = xf_b - prev_xf
    dg = res - prev_grad
    have_prev = it > 0
    if strategy in ("bb", "barzilai_borwein"):
        denom = jnp.where(jnp.abs(dg) > eps, dg * dg, 0.0)
        lr = jnp.where(denom > 0, jnp.abs(dx * dg) / jnp.maximum(denom, 1e-300),
                       alpha)
        lr = jnp.where(have_prev, lr, alpha)
        return lr * res, lr_state
    if strategy == "secant":
        prop = -res * dx / jnp.where(jnp.abs(dg) > eps, dg, 1.0)
        return jnp.where(have_prev & (jnp.abs(dg) > eps), prop, alpha * res), \
            lr_state
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
                T, xf_b, pxf, pg, lrs, err, it = st
                return (it < max_iter) & (err > tol) & (err > reltol * jnp.abs(xf_b))

            def body(st):
                T, xf_b, pxf, pg, lrs, err, it = st
                Tn, res = slab_solve(Told, xf_start, xf_b, t)
                step, lrs = _lr_step(lr_strategy, alpha, res, xf_b, pxf, pg,
                                     it, lrs)
                return (Tn, xf_b + step, xf_b, res, lrs, jnp.abs(res), it + 1)

            init = (Told, xf_start, xf_start, jnp.asarray(0.0, xf_start.dtype),
                    lr_state_init(xf_start.dtype),
                    jnp.asarray(jnp.inf, xf_start.dtype), 0)
            T, xf_b, _, _, _, err, it = jax.lax.while_loop(cond, body, init)
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


class MovingLiquidDiffusionUnsteadyMonoCoupled(_ScalarSolverBase):
    """Coupled-Newton 1D Stefan: Newton on the EXTENDED unknown
    z = (Tω, Tγ, V_future) — temperature and the future cut-cell volumes
    solved simultaneously (reference coupled_newton_step!,
    liquidmotionsolver/diffusion_coupled.jl:14-209).

    Extended residual per cell (geometry refreshed each iteration like the
    reference's rebuild, diffusion_coupled.jl:155-170):

    - bulk row   ``F = Va Tω + Id GᵀWꜝG ψ⁺(Tω,Tγ) - (Va - Vf) Tγ
      - (Vf Tω_old + V f)`` — the moving-scheme row with the END-of-slab
      volume Vf as an unknown (our slab slicing: slot 0 = start volume Va
      frozen, slot 1 = end volume moving with the front);
    - Stefan row ``R = ρL (Va - Vf) - Id Hᵀ Wꜝ (G Tω + H Tγ)`` (per-cell
      discrete Stefan balance — the same bookkeeping as the validated
      scalar residual ``res = ΣVa - ΣVb - flux/ρL``);
    - value row  ``Tγ - g`` on interface cells.

    The 3m×3m Jacobian is EXACT via ``jax.jacfwd`` of the residual
    (replacing the reference's analytic J11..J23 block assembly, including
    the bilinear ∂F/∂V = Tω_old - Tγ coupling), and the front update is the
    geometric identity δxf = Σ δVf (total 1D fluid volume = fluid length;
    the reference uses mean(δV) — a heavier damping — documented
    deviation)."""

    def __init__(self, phase, bc_b, bc_i, dt, u0, mesh, scheme="BE"):
        self.phase = phase
        self.bc_b = bc_b
        self.bc_i = bc_i
        self.dt = float(dt)
        self.u0 = u0
        self.mesh = mesh
        self.scheme = scheme
        self.border = border_info(mesh, bc_b)

    def solve(self, xf0, t_start, t_end, ic,
              newton_params=(40, 1e-10, 1e-10, 1.0), p=6, s=1):
        from ..assembly import _col_G_nz, _col_H_nz
        from .moving_diffusion import _eval_f, _eval_g, psi_weights

        dt = self.dt
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        max_iter, tol, reltol, damp = newton_params
        max_iter = int(max_iter)
        rhoL = ic.flux.value
        D, f = self.phase.diffusion, self.phase.source
        bc_i, border, mesh, scheme = self.bc_i, self.border, self.mesh, self.scheme

        def newton_iter(Tprev, Titer, xf_a, xf_b, t):
            # Tprev: converged previous-time-step field (fixed across the
            # Newton iterations — it feeds the rhs mass term); Titer: the
            # current Newton iterate (linearization point).
            cap = compute_capacity_spacetime(
                _interp_body_1d, mesh, 0.0, dt, p=p, s=s,
                params=(xf_a, xf_b, dt),
            )
            ops, Va, Vb, Gamma0, C_sp, Cg_sp = slice_spacetime(cap)
            psip, psim = psi_weights(scheme, Vb, Va)
            Id = _eval_D(D, C_sp)
            bulk_act = (Va != 0) | (Vb != 0) | _col_G_nz(ops)
            ifc_act = (Gamma0 != 0) | _col_H_nz(ops)
            gg = _eval_g(bc_i, Cg_sp, Gamma0, t)
            Tw0, Tg0 = Tprev

            def residual(z):
                Tw, Tg, Vf = z
                q = ops.flux(psip * Tw, psip * Tg)
                Fw = Va * Tw + Id * ops.GT(q) - (Va - Vf) * Tg
                Fw = jnp.where(bulk_act, Fw, Tw)
                if border is not None:
                    Fw = border.matvec(Fw, Tw)
                fn1 = _eval_f(f, C_sp, t + dt)
                if scheme == "CN":
                    fn = _eval_f(f, C_sp, t)
                    qm = ops.flux(psim * Tw0, jnp.zeros_like(Tg0))
                    hterm = ops.flux(jnp.zeros_like(Tw0), Tg0)
                    b1v = (Vf * Tw0 - Id * ops.GT(qm)
                           - 0.5 * Id * ops.GT(hterm)
                           + 0.5 * ops.V * (fn + fn1))
                else:
                    b1v = Vf * Tw0 + ops.V * fn1
                if border is not None:
                    b1v = border.rhs(b1v, t)
                Fw = Fw - b1v
                q2 = ops.flux(Tw, Tg)
                R = rhoL * (Va - Vf) - Id * ops.HT(q2)
                # 1D stencil fusion (the 2D solver's 3x3 box filter,
                # stefan.jl:588-785): the per-cell Stefan balance is
                # over-determined (flux spans two cells, the volume change
                # lives in the crossed cell); summing over the 3-cell
                # neighborhood makes the interface rows the aggregate
                # balance the scalar solver converges to.
                R = (R
                     + jnp.pad(R, (1, 0))[:-1]
                     + jnp.pad(R, (0, 1))[1:])
                Gr = jnp.where(ifc_act, Tg - gg, Tg)
                return (Fw, R, Gr)

            z0 = (Titer[0], Titer[1], Vb)
            res = residual(z0)
            flat, unravel = ravel_pytree(z0)
            rflat = ravel_pytree(res)[0]
            J = jax.jacfwd(lambda v: ravel_pytree(
                residual(unravel(v)))[0])(flat)
            delta = jnp.linalg.lstsq(J, -rflat)[0]
            dTw, dTg, dVf = unravel(delta)
            Tn = (Titer[0] + damp * dTw, Titer[1] + damp * dTg)
            # 1D geometric identity: total fluid volume = fluid length
            dxf = damp * jnp.sum(dVf)
            err = jnp.linalg.norm(rflat)
            return Tn, xf_b + dxf, err

        def newton(Told, xf_start, t):
            def cond(st):
                T, xf_b, err, it = st
                return (it < max_iter) & (err > tol) & \
                    (err > reltol * jnp.maximum(1.0, jnp.abs(xf_b)))

            def body(st):
                T, xf_b, err, it = st
                Tn, xfn, e = newton_iter(Told, T, xf_start, xf_b, t)
                return (Tn, xfn, e, it + 1)

            init = (Told, xf_start,
                    jnp.asarray(jnp.inf, xf_start.dtype), 0)
            T, xf_b, err, it = jax.lax.while_loop(cond, body, init)
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


def _adaptive_dt(v_max, h_min, cfl_target, dt_cur, dt_min, dt_max,
                 growth=1.1, shrink=0.8, safety=0.9):
    """jax version of the interface-CFL controller (utils.adapt_timestep)."""
    dt_opt = safety * cfl_target * h_min / jnp.maximum(v_max, 1e-10)
    dt_new = jnp.where(dt_opt > dt_cur,
                       jnp.minimum(dt_opt, dt_cur * growth),
                       jnp.maximum(dt_opt, dt_cur * shrink))
    dt_new = jnp.where(v_max < 1e-10, jnp.minimum(dt_cur * growth, dt_max),
                       dt_new)
    return jnp.clip(dt_new, dt_min, dt_max)


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
                X, xf_b, pxf, pg, lrs, err, it = st
                return (it < max_iter) & (err > tol) & (err > reltol * jnp.abs(xf_b))

            def body(st):
                X, xf_b, pxf, pg, lrs, err, it = st
                Xn, res = slab_solve(Told, xf_start, xf_b, t)
                step, lrs = _lr_step(lr_strategy, alpha, res, xf_b, pxf, pg,
                                     it, lrs)
                return (Xn, xf_b + step, xf_b, res, lrs, jnp.abs(res), it + 1)

            init = (Told, xf_start, xf_start,
                    jnp.asarray(0.0, xf_start.dtype),
                    lr_state_init(xf_start.dtype),
                    jnp.asarray(jnp.inf, xf_start.dtype), 0)
            X, xf_b, _, _, _, err, it = jax.lax.while_loop(cond, body, init)
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


def solve_stefan_1d_adaptive(solver, xf0, t_start, t_end, ic,
                             newton_params=(200, 1e-10, 1e-10, 1.0),
                             cfl_target=0.5, dt_min=1e-6, dt_max=0.1,
                             max_steps=500, lr_strategy="fixed", p=6, s=1):
    """Adaptive-Δt driver for MovingLiquidDiffusionUnsteadyMono (reference
    adaptive_timestep path, liquidmotionsolver/diffusion.jl:309-333): the
    slab width is a traced carry; Δt adapts to the interface CFL."""
    from .moving_diffusion import build_moving_mono_system

    mesh = solver.mesh
    max_iter, tol, reltol, alpha = newton_params
    max_iter = int(max_iter)
    rhoL = ic.flux.value
    D, f = solver.phase.diffusion, solver.phase.source
    bc_i, border, scheme = solver.bc_i, solver.border, solver.scheme
    h_min = min(mesh.h)

    def slab_solve(Told, xf_a, xf_b, t, dt):
        cap = compute_capacity_spacetime(
            _interp_body_1d, mesh, 0.0, dt, p=p, s=s,
            params=(xf_a, xf_b, dt))
        apply_fn, rhs_fn = build_moving_mono_system(
            cap, D, f, bc_i, border, t, dt, scheme)
        T = _direct_solve(apply_fn, rhs_fn(Told))
        flux, Va, Vb = interface_flux_1d(cap, D, T[0], T[1])
        res = jnp.sum(Va) - jnp.sum(Vb) - flux / rhoL
        return T, res

    def newton(Told, xf_start, t, dt):
        def cond(st):
            T, xf_b, pxf, pg, lrs, err, it = st
            return (it < max_iter) & (err > tol)

        def body(st):
            T, xf_b, pxf, pg, lrs, err, it = st
            Tn, res = slab_solve(Told, xf_start, xf_b, t, dt)
            step, lrs = _lr_step(lr_strategy, alpha, res, xf_b, pxf, pg, it, lrs)
            return (Tn, xf_b + step, xf_b, res, lrs, jnp.abs(res), it + 1)

        init = (Told, xf_start, xf_start, jnp.asarray(0.0, xf_start.dtype),
                lr_state_init(xf_start.dtype),
                jnp.asarray(jnp.inf, xf_start.dtype), 0)
        T, xf_b, *_ = jax.lax.while_loop(cond, body, init)
        return T, xf_b

    dtype = solver.u0[0].dtype
    dt0 = jnp.asarray(solver.dt, dtype)

    @jax.jit
    def run(u0, xf0_):
        def cond(st):
            T, xf, t, dt, k = st
            return (t < t_end - 1e-12) & (k < max_steps)

        def body(st):
            T, xf, t, dt, k = st
            dt_c = jnp.minimum(dt, t_end - t)
            Tn, xfn = newton(T, xf, t, dt_c)
            v = jnp.abs(xfn - xf) / dt_c
            dt_n = _adaptive_dt(v, h_min, cfl_target, dt_c, dt_min, dt_max)
            return (Tn, xfn, t + dt_c, dt_n, k + 1)

        return jax.lax.while_loop(
            cond, body,
            (u0, jnp.asarray(xf0_, dtype), jnp.asarray(t_start, dtype), dt0, 0),
        )

    T, xf, t, dt, k = run(solver.u0, xf0)
    solver.x = T
    solver.xf = float(xf)
    solver.t_final = float(t)
    solver.n_steps = int(k)
    return solver.x


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
