"""2D Stefan with a column height-function interface.

Re-design of ``/root/reference/src/liquidmotionsolver/diffusion2d.jl``:
the interface is y = h(x) sampled per x-column; per time step a fixed-point
iteration solves the slab temperature, column-sums the interface flux
(``extract_height_profiles`` bookkeeping, height_tracking.jl:22-65), updates
the column volume profile ``H ← H + α res`` and rebuilds the slab geometry
from the interpolated height curve (lin/quad/cubic, interpolation.jl).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..assembly import border_info
from ..capacity import compute_capacity_spacetime
from ..interpolation import cubic_interpol, lin_interpol, quad_interpol
from .diffusion import _ScalarSolverBase
from .moving_diffusion import (
    _eval_D,
    slice_spacetime,
    solve_moving_diph_stef_step,
    solve_moving_mono_step,
)

__all__ = ["MovingLiquidDiffusionUnsteadyMono2D",
           "MovingLiquidDiffusionUnsteadyDiph2D"]

_INTERPS = {"linear": lin_interpol, "quad": quad_interpol, "cubic": cubic_interpol}


def _height_body(x, y, tau, params):
    """Fluid below the interpolated height curve, heights linear in slab
    time: phi = sign·(y - h(x, tau)).  Interpolate each height snapshot in
    x, then blend in time (linear operations commute), so tau may be any
    quadrature-sample shape.  ``sign=+1`` tracks the phase below the curve,
    ``-1`` the phase above (diphasic complement)."""
    xs_cols, ha, hb, dt, sign = params
    ha_q = lin_interpol(xs_cols, ha, x)
    hb_q = lin_interpol(xs_cols, hb, x)
    h = ((dt - tau) * ha_q + tau * hb_q) / dt
    return sign * (y - h)


class MovingLiquidDiffusionUnsteadyMono2D(_ScalarSolverBase):
    def __init__(self, phase, bc_b, bc_i, dt, u0, mesh, scheme="BE"):
        self.phase = phase
        self.bc_b = bc_b
        self.bc_i = bc_i
        self.dt = float(dt)
        self.u0 = u0
        self.mesh = mesh
        self.scheme = scheme
        self.border = border_info(mesh, bc_b)

    def solve(self, h0, t_start, t_end, ic,
              newton_params=(100, 1e-8, 1e-8, 1.0), interp="linear",
              method="auto", p=4, s=1):
        """``h0``: initial interface positions per x-column (length nx).
        ``ic.flux.value`` is ρL.  Returns the final temperature; height
        history in ``self.height_log``."""
        dt = self.dt
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        max_iter, tol, reltol, alpha = newton_params
        max_iter = int(max_iter)
        rhoL = ic.flux.value
        D, f = self.phase.diffusion, self.phase.source
        bc_i, border, mesh, scheme = self.bc_i, self.border, self.mesh, self.scheme
        nx = mesh.n[0]
        dx = mesh.h[0]
        # column x-coordinates: cell midpoints
        xs_cols = jnp.asarray(
            0.5 * (np.asarray(mesh.nodes[0])[:-1] + np.asarray(mesh.nodes[0])[1:])
        )

        from ..boundary import GibbsThomson

        gibbs = isinstance(bc_i, GibbsThomson)

        def slab_solve(Told, h_a, h_b, v_g, t):
            cap = compute_capacity_spacetime(
                _height_body, mesh, 0.0, dt, p=p, s=s,
                params=(xs_cols, h_a, h_b, dt, 1.0),
            )
            g_override = None
            if gibbs:
                # Gibbs-Thomson feed in the height path
                # (diffusion2d.jl:94-101): the interface value is depressed
                # by the kinetic term from the previous iteration's flux
                # velocity |flux|/(ρL Δt) — the reference's always-
                # undercooling |v| form
                g_override = bc_i.Tm - bc_i.eps_v * v_g
            T, klv_it, _ = solve_moving_mono_step(
                cap, D, f, bc_i, border, Told, t, dt, scheme,
                tol=1e-9, maxiter=800, g_override=g_override,
                method=method,
            )
            ops, Va, Vb, G0, C_sp, _ = slice_spacetime(cap)
            Id = _eval_D(D, C_sp)
            q = ops.flux(T[0], T[1])
            flux = Id * ops.HT(q)
            v_new = jnp.abs(flux) / (rhoL * dt) if gibbs else v_g
            # column sums over the transverse (y) direction, real cells only
            col = lambda a: a[:nx, :].sum(axis=1)
            res_cols = col(Va) - col(Vb) - col(flux) / rhoL
            return T, res_cols, v_new

        def newton(Told, h_start, t):
            def cond(st):
                T, h_b, v_g, err, it = st
                return (it < max_iter) & (err > tol)

            def body(st):
                T, h_b, v_g, err, it = st
                Tn, res, v_new = slab_solve(Told, h_start, h_b, v_g, t)
                # res is in column-volume units; convert to height units
                h_new = h_b + alpha * res / dx
                return (Tn, h_new, v_new, jnp.linalg.norm(res), it + 1)

            v0 = jnp.zeros_like(Told[0])
            init = (Told, h_start, v0,
                    jnp.asarray(jnp.inf, h_start.dtype), 0)
            T, h_b, v_g, err, it = jax.lax.while_loop(cond, body, init)
            return T, h_b, err, it

        @jax.jit
        def run(u0, h0_):
            def stepf(carry, k):
                T, h = carry
                t = t_start + k * dt
                Tn, hn, err, it = newton(T, h, t)
                return (Tn, hn), (hn, err, it)

            (Tf, hf), (h_log, errs, iters) = jax.lax.scan(
                stepf, (u0, h0_), jnp.arange(K + 1.0)
            )
            return Tf, hf, h_log, errs, iters

        dtype = self.u0[0].dtype
        Tf, hf, h_log, errs, iters = run(self.u0, jnp.asarray(h0, dtype))
        self.x = Tf
        self.heights = np.asarray(hf)
        self.height_log = np.asarray(h_log)
        self.newton_errs = np.asarray(errs)
        self.newton_iters = np.asarray(iters)
        self.states = [Tf]
        return self.x


class MovingLiquidDiffusionUnsteadyDiph2D(_ScalarSolverBase):
    """Two-phase height-function Stefan solver
    (solve_MovingLiquidDiffusionUnsteadyDiph2D!,
    /root/reference/src/liquidmotionsolver/diffusion2d.jl:652-1100):
    phase 1 below the height curve, phase 2 its complement above; per
    fixed-point iteration the diphasic-Stefan slab system is solved and
    the column residual sums BOTH phases' interface fluxes
    (diffusion2d.jl:727-752):

        res(x) = H1_{n+1}(x) - H1_n(x) - (1/ρL) Σ_col (flux1 + flux2)
        h <- h + α res / dx
    """

    def __init__(self, phase1, phase2, bc_b, ic, dt, u0, mesh, scheme="BE"):
        self.phase1, self.phase2 = phase1, phase2
        self.bc_b = bc_b
        self.ic = ic
        self.dt = float(dt)
        self.u0 = u0
        self.mesh = mesh
        self.scheme = scheme

    def solve(self, h0, t_start, t_end,
              newton_params=(100, 1e-8, 1e-8, 1.0), interp="linear",
              method="auto", p=4, s=1):
        """``h0``: initial interface height per x-column.  State ``u0`` is
        (TW1, TG1, TW2, TG2).  Height history in ``self.height_log``."""
        dt = self.dt
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        max_iter, tol, reltol, alpha = newton_params
        max_iter = int(max_iter)
        rhoL = self.ic.flux.value
        mesh, scheme, ic, bc_b = self.mesh, self.scheme, self.ic, self.bc_b
        D1, f1 = self.phase1.diffusion, self.phase1.source
        D2, f2 = self.phase2.diffusion, self.phase2.source
        nx = mesh.n[0]
        dx = mesh.h[0]
        xs_cols = jnp.asarray(
            0.5 * (np.asarray(mesh.nodes[0])[:-1] + np.asarray(mesh.nodes[0])[1:])
        )

        def slab_solve(Xold, h_a, h_b, t):
            cap1 = compute_capacity_spacetime(
                _height_body, mesh, 0.0, dt, p=p, s=s,
                params=(xs_cols, h_a, h_b, dt, 1.0))
            cap2 = compute_capacity_spacetime(
                _height_body, mesh, 0.0, dt, p=p, s=s,
                params=(xs_cols, h_a, h_b, dt, -1.0))
            b1m = border_info(mesh, bc_b,
                              phase_mask=cap1.cell_types[..., 0] != 0)
            b2m = border_info(mesh, bc_b,
                              phase_mask=cap2.cell_types[..., 0] != 0)
            X, klv_it, _ = solve_moving_diph_stef_step(
                cap1, cap2, D1, D2, f1, f2, ic, b1m, b2m, Xold, t, dt,
                scheme, tol=1e-9, maxiter=800, method=method)
            s1 = slice_spacetime(cap1)
            s2 = slice_spacetime(cap2)
            flux1 = _eval_D(D1, s1[4]) * s1[0].HT(s1[0].flux(X[0], X[1]))
            flux2 = _eval_D(D2, s2[4]) * s2[0].HT(s2[0].flux(X[2], X[3]))
            col = lambda a: a[:nx, :].sum(axis=1)
            res_cols = col(s1[1]) - col(s1[2]) - col(flux1 + flux2) / rhoL
            return X, res_cols

        def newton(Xold, h_start, t):
            def cond(st):
                X, h_b, err, it = st
                return (it < max_iter) & (err > tol)

            def body(st):
                X, h_b, err, it = st
                Xn, res = slab_solve(Xold, h_start, h_b, t)
                h_new = h_b + alpha * res / dx
                return (Xn, h_new, jnp.linalg.norm(res), it + 1)

            init = (Xold, h_start, jnp.asarray(jnp.inf, h_start.dtype), 0)
            X, h_b, err, it = jax.lax.while_loop(cond, body, init)
            return X, h_b, err, it

        @jax.jit
        def run(u0, h0_):
            def stepf(carry, k):
                X, h = carry
                t = t_start + k * dt
                Xn, hn, err, it = newton(X, h, t)
                return (Xn, hn), (hn, err, it)

            (Xf, hf), (h_log, errs, iters) = jax.lax.scan(
                stepf, (u0, h0_), jnp.arange(K + 1.0))
            return Xf, hf, h_log, errs, iters

        dtype = self.u0[0].dtype
        Xf, hf, h_log, errs, iters = run(self.u0, jnp.asarray(h0, dtype))
        self.x = Xf
        self.heights = np.asarray(hf)
        self.height_log = np.asarray(h_log)
        self.newton_errs = np.asarray(errs)
        self.newton_iters = np.asarray(iters)
        self.states = [Xf]
        return self.x
