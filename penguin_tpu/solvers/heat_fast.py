"""Speed-of-light BE heat stepper (the driver's north-star benchmark:
1024² unsteady heat step < 10 ms on one TPU v5e chip).

Specialization of the general mono unsteady system for Dirichlet interface
conditions: the interface closure row ``Γ T_γ = Γ g_γ`` is eliminated
analytically (T_γ := g_γ on cut cells), leaving one SPD system on the bulk
field::

    (V + dt · Id · Gᵀ Wꜝ G) T_ω = V T_ωⁿ + dt V f − dt Id Gᵀ Wꜝ H g_γ

Because every factor is diagonal-or-shift, the whole operator collapses to
a (2N+1)-point variable-coefficient stencil.  The coefficients (including
the inactive-cell identity masking and Dirichlet border rows) are
precomputed once, so the CG matvec is a single fused VPU pipeline reading
2N+2 arrays from HBM — the hardware roofline for this operator.  Solved by
Jacobi-preconditioned CG with warm starts under ``lax.while_loop``.

The jitted step/run functions live at module level and take the stencil
coefficients as ARGUMENTS (a pytree), not as closure constants: closed-over
arrays are baked into the lowered HLO as literals, which (a) re-compiles per
FastHeatBE instance and (b) ships the whole coefficient set with every
remote-compile request — at 192³ f32 that is ~300 MB of HLO and the TPU
tunnel rejects it (HTTP 413).  As arguments they are runtime parameters:
the program is a few KB and instances with equal shapes share the compile
cache.

Mathematically identical to the general masked block solver in
``solvers/diffusion.py`` (unit-tested against it); the reference solves the
same system with sparse LU (src/solver/diffusion.jl:212-301).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..assembly import (
    border_info,
    coefficient_diag,
    gamma_value_vector,
    source_vector,
    _col_G_nz,
)
from ..boundary import Dirichlet, eval_condition_value
from ..operators import _shift_m, _shift_p, _zlast, dm, dm_t

__all__ = ["FastHeatBE"]


def _apply_stencil(kind, tiles, coeffs, x):
    """(2N+1)-point variable-coefficient matvec on the padded grid."""
    if kind == "pl2":
        from ..pallas_kernels.stencil import stencil5_matvec

        cc, cxm, cxp, cym, cyp = coeffs
        return stencil5_matvec(cc, cxm, cxp, cym, cyp, x, tile_m=tiles[0])
    if kind == "pl3":
        from ..pallas_kernels.stencil import stencil7_matvec

        cc, cxm, cxp, cym, cyp, czm, czp = coeffs
        return stencil7_matvec(cc, cxm, cxp, cym, cyp, czm, czp, x,
                               tile_x=tiles[0], tile_y=tiles[1])
    cc = coeffs[0]
    acc = cc * x
    for d in range((len(coeffs) - 1) // 2):
        acc = (acc + coeffs[1 + 2 * d] * _shift_m(x, d)
               + coeffs[2 + 2 * d] * _shift_p(x, d))
    return acc


def _cg(kind, tiles, cg_maxiter, coeffs, dinv, tol2, b, x0):
    matvec = partial(_apply_stencil, kind, tiles, coeffs)
    r = b - matvec(x0)
    z = dinv * r
    p = z
    rz = jnp.vdot(r, z).real
    bb = jnp.maximum(jnp.vdot(b, b).real, jnp.asarray(1e-30, b.dtype))

    def cond_fn(state):
        x, r, p, rz, k = state
        return (jnp.vdot(r, r).real > tol2 * bb) & (k < cg_maxiter)

    def body_fn(state):
        x, r, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap).real
        x = x + alpha * p
        r = r - alpha * Ap
        z = dinv * r
        rz_new = jnp.vdot(r, z).real
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, k + 1)

    x, r, p, rz, k = jax.lax.while_loop(cond_fn, body_fn, (x0, r, p, rz, 0))
    return x, k


@partial(jax.jit, static_argnames=("kind", "tiles", "cg_maxiter"))
def _step_fn(kind, tiles, cg_maxiter, params, Twp, x0p):
    """One BE step in padded space: solve (V + dt·Id·GᵀWꜝG) x = V Twp + rhs."""
    b = params["Va"] * Twp + params["rhs"]
    return _cg(kind, tiles, cg_maxiter, params["coeffs"], params["dinv"],
               params["tol2"], b, x0p)


@partial(jax.jit, static_argnames=("kind", "tiles", "cg_maxiter"))
def _run_fn(kind, tiles, cg_maxiter, params, Tp, n_steps):
    # quadratically extrapolated warm start (x0 = 3Tn - 3Tn-1 + Tn-2) saves
    # ~1-2 CG iterations per step; cubic extrapolation regresses in f32
    # (noise amplification)
    def body(_, carry):
        T, T1, T2 = carry
        Tn, _it = _step_fn(kind, tiles, cg_maxiter, params,
                           T, 3.0 * T - 3.0 * T1 + T2)
        return (Tn, T, T1)

    Tn, _, _ = jax.lax.fori_loop(0, n_steps, body, (Tp, Tp, Tp))
    return Tn


@partial(jax.jit, static_argnames=("kind", "tiles", "cg_maxiter"))
def _run_telemetry_fn(kind, tiles, cg_maxiter, params, Tp, n_steps):
    """Like ``_run_fn`` but carries CG-iteration telemetry (last / max
    over the run) — the cost is one extra scalar pair in the carry."""
    def body(_, carry):
        T, T1, T2, _last, mx = carry
        Tn, it = _step_fn(kind, tiles, cg_maxiter, params,
                          T, 3.0 * T - 3.0 * T1 + T2)
        return (Tn, T, T1, it, jnp.maximum(mx, it))

    z = jnp.zeros((), jnp.int32)
    Tn, _, _, last, mx = jax.lax.fori_loop(
        0, n_steps, body, (Tp, Tp, Tp, z, z))
    return Tn, last, mx


@partial(jax.jit, static_argnames=("kind", "tiles"))
def _matvec_fn(kind, tiles, coeffs, xp):
    return _apply_stencil(kind, tiles, coeffs, xp)


class FastHeatBE:
    """Backward-Euler heat stepper with Dirichlet interface + Dirichlet
    borders, eliminated interface unknowns, and stencil-collapsed CG."""

    def __init__(self, capacity, ops, diffusion, source, bc_i, bc_b, dt,
                 cg_tol=1e-6, cg_maxiter=32, dtype=None, use_pallas=None):
        if dtype is None:
            dtype = capacity.V.dtype
        cast = lambda a: jnp.asarray(a, dtype)
        self.dt = dt = jnp.asarray(dt, dtype)
        V = cast(ops.V)
        A = tuple(cast(a) for a in ops.A)
        B = tuple(cast(b) for b in ops.B)
        Wdag = tuple(cast(w) for w in ops.Wdag)
        Id = cast(coefficient_diag(diffusion, capacity))
        g_gamma = cast(gamma_value_vector(bc_i, capacity))
        f_cells = cast(source_vector(source, capacity, 0.0))
        Gamma = cast(capacity.Gamma)
        ndim = len(A)

        # eliminated interface field: g on cut cells, 0 elsewhere
        Tg = jnp.where(Gamma > 0, g_gamma, 0.0)

        border = border_info(capacity.mesh, bc_b, capacity=capacity)
        bmask = jnp.zeros(capacity.V.shape, bool)
        bvals = jnp.zeros(capacity.V.shape, dtype)
        for key, cond, axis, side, mask in border.items:
            if not isinstance(cond, Dirichlet):
                raise ValueError("FastHeatBE supports Dirichlet borders only")
            bmask = bmask | mask
            bvals = jnp.where(
                mask, cast(eval_condition_value(cond.value, border.pos)), bvals
            )

        active = (V != 0.0) | _col_G_nz(ops)
        active = jnp.asarray(active) & (~bmask)

        # ------------------------------------------------------------------
        # collapse V + dt·Id·GᵀWꜝG to a (2N+1)-point stencil
        #   y_j = c_c x_j + Σ_d (c_m[d] x_{j-1_d} + c_p[d] x_{j+1_d})
        # row m (padding) vanishes automatically because B[m] = 0.
        # ------------------------------------------------------------------
        c_c = V
        c_m, c_p = [], []
        for d in range(ndim):
            diag_d = _zlast(B[d] ** 2 * (Wdag[d] + _shift_p(Wdag[d], d)), d)
            c_c = c_c + dt * Id * diag_d
            c_m.append(-dt * Id * B[d] * Wdag[d] * _shift_m(B[d], d))
            c_p.append(-dt * Id * B[d] * _shift_p(Wdag[d] * B[d], d))
        # masking folded into the coefficients: inactive/border -> identity row
        live = active
        c_c = jnp.where(live, c_c, 1.0)
        c_m = [jnp.where(live, c, 0.0) for c in c_m]
        c_p = [jnp.where(live, c, 0.0) for c in c_p]

        # Pallas dispatch (VERDICT round-1 item 5): the fused 5/7-point
        # kernel replaces the XLA-fused matvec when available.  Arrays are
        # padded once here to the kernel's tile alignment; padded slots are
        # identity rows (c=1, off-diag 0) so the CG state there stays 0.
        from ..pallas_kernels.stencil import stencil5_available

        # Trimmable ghost plane: the (n+1)-th slot along each axis is
        # structural padding (B[last] = 0 ⇒ identity row) whenever it holds
        # no live cell and no live row couples into it (c_p at index n-1
        # would be the only path in — the shift ops zero-pad, they don't
        # wrap).  Trimming it puts (2^k+1)-shaped grids exactly on the
        # kernel tile alignment, making the Pallas dispatch free where
        # padding UP would have cost +19% (1025²) or +49% (257³ lanes).
        work = []
        for d in range(ndim):
            last_live = bool(jnp.any(jnp.take(live, V.shape[d] - 1, axis=d)))
            feeds_last = bool(
                jnp.any(jnp.take(c_p[d], V.shape[d] - 2, axis=d) != 0.0))
            work.append(V.shape[d] - (0 if (last_live or feeds_last) else 1))
        work = tuple(work)

        if use_pallas is None:
            # auto-dispatch only when tile alignment is cheap: the kernel is
            # ~12% faster per element than XLA's fusion in 2D (~1.6-1.8x in
            # the HBM-streaming regime), so padding that adds more than ~8%
            # elements makes it a net loss.
            use_pallas = ndim in (2, 3) and stencil5_available()
            full_n = 1
            for s in V.shape:
                full_n *= s
            # padding budget: in the HBM-streaming regime (working set well
            # past on-chip residency, ≳4M cells) the kernel's 1.6-1.8×
            # per-element advantage absorbs up to ~35% padded elements
            # (e.g. 192³ lanes pad to 256, +33%, still a 1.35× net win);
            # in the resident regime the advantage is ~1.1× so only
            # near-free (≤8%) alignment pays.
            budget = 1.35 if full_n >= 4_000_000 else 1.08
            if use_pallas and ndim == 2:
                M0, N0 = work
                padded_n = (-(-M0 // 64) * 64) * (-(-N0 // 128) * 128)
                use_pallas = padded_n <= budget * full_n
            elif use_pallas:
                X0, Y0, Z0 = work
                padded_n = (-(-X0 // 8) * 8) * (-(-Y0 // 8) * 8) \
                    * (-(-Z0 // 128) * 128)
                use_pallas = padded_n <= budget * full_n
        self.use_pallas = bool(use_pallas and ndim in (2, 3))
        if not self.use_pallas:
            work = V.shape  # keep the XLA path byte-identical to the input
        if self.use_pallas and ndim == 2:
            M, Np = work
            tile_m = 64
            Mp = -(-M // tile_m) * tile_m
            Npad = -(-Np // 128) * 128
            pw = ((0, Mp - M), (0, Npad - Np))
            self._kind, self._tiles = "pl2", (tile_m,)
        elif self.use_pallas:
            X, Y, Z = work
            tile_x = 8
            Xp = -(-X // tile_x) * tile_x
            Yp = -(-Y // 8) * 8
            Zp = -(-Z // 128) * 128
            # the kernel requires Yp % tile_y == 0 (tile_y % 8 == 0): pick
            # the largest admissible tile ≤ 64 rather than assuming 64
            tile_y = next(t for t in range(64, 0, -8) if Yp % t == 0)
            pw = ((0, Xp - X), (0, Yp - Y), (0, Zp - Z))
            self._kind, self._tiles = "pl3", (tile_x, tile_y)
        else:
            pw = tuple((0, 0) for _ in range(ndim))
            self._kind, self._tiles = "xla", ()

        shape = V.shape
        trim_sl = tuple(slice(0, w) for w in work)
        untrim = tuple((0, s - w) for s, w in zip(shape, work))
        has_pad = any(p1 for _, p1 in pw)
        has_trim = work != shape

        def _pad(a, const=0.0):
            if has_trim:
                a = a[trim_sl]
            return jnp.pad(a, pw, constant_values=const) if has_pad else a

        def _crop(a):
            if has_pad:
                a = a[tuple(slice(0, w) for w in work)]
            # trimmed ghost planes come back as zeros (their rows are
            # identity with zero rhs in the untrimmed system)
            return jnp.pad(a, untrim) if has_trim else a

        self._pad, self._crop = _pad, _crop
        pad, crop = self._pad, self._crop

        coeffs = [pad(c_c, 1.0)]
        for d in range(ndim):
            coeffs += [pad(c_m[d]), pad(c_p[d])]
        coeffs = tuple(coeffs)

        # constant rhs pieces: dt·V·f − dt·Id·GᵀWꜝH g_γ  (+ border values)
        def h_apply(tg):
            out = 0.0
            for d in range(ndim):
                q = Wdag[d] * (A[d] * dm(tg, d) - dm(B[d] * tg, d))
                out = out + Id * (B[d] * dm_t(q, d))
            return out

        rhs_const = dt * V * f_cells - dt * h_apply(Tg)
        rhs_const = jnp.where(active, rhs_const, 0.0)
        rhs_const = jnp.where(bmask, bvals, rhs_const)

        diag = jnp.where(c_c == 0, 1.0, c_c)
        V_active = jnp.where(active, V, 0.0)

        self._params = {
            "coeffs": coeffs,
            "dinv": pad(1.0 / diag, 1.0),
            "Va": pad(V_active),
            "rhs": pad(rhs_const),
            "tol2": jnp.asarray(cg_tol * cg_tol, dtype),
        }
        self._cg_maxiter = int(cg_maxiter)

        self.Tg = Tg
        self.active = active
        self.dtype = dtype

    # ------------------------------------------------------------------
    def step(self, Tw, x0=None):
        """One BE step: returns (T_{n+1}, cg_iters)."""
        Twp = self._pad(Tw)
        x0p = Twp if x0 is None else self._pad(x0)
        x, iters = _step_fn(self._kind, self._tiles, self._cg_maxiter,
                            self._params, Twp, x0p)
        return self._crop(x), iters

    def matvec(self, x):
        return self._crop(_matvec_fn(self._kind, self._tiles,
                                     self._params["coeffs"], self._pad(x)))

    def run(self, T0, n_steps):
        """n_steps of BE in one XLA program (single compile; the step count
        is a dynamic loop bound)."""
        Tn = _run_fn(self._kind, self._tiles, self._cg_maxiter, self._params,
                     self._pad(T0), n_steps)
        return self._crop(Tn)

    def run_telemetry(self, T0, n_steps):
        """Like :meth:`run`, also returning (cg_iters_last, cg_iters_max)
        over the span — the bench uses it to record how hard the implicit
        solve actually works at a given dt."""
        Tn, last, mx = _run_telemetry_fn(
            self._kind, self._tiles, self._cg_maxiter, self._params,
            self._pad(T0), n_steps)
        return self._crop(Tn), last, mx
