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
    _direct_solve,
    _eval_D,
    build_moving_mono_system,
    slice_spacetime,
)

__all__ = ["MovingLiquidDiffusionUnsteadyMono2D"]

_INTERPS = {"linear": lin_interpol, "quad": quad_interpol, "cubic": cubic_interpol}


def _height_body(x, y, tau, params):
    """Fluid below the interpolated height curve, heights linear in slab
    time: phi = y - h(x, tau).  Interpolate each height snapshot in x, then
    blend in time (linear operations commute), so tau may be any
    quadrature-sample shape."""
    xs_cols, ha, hb, dt, interp_id = params
    ha_q = lin_interpol(xs_cols, ha, x)
    hb_q = lin_interpol(xs_cols, hb, x)
    h = ((dt - tau) * ha_q + tau * hb_q) / dt
    return y - h


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
              method="direct", p=4, s=1):
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

        def slab_solve(Told, h_a, h_b, t):
            cap = compute_capacity_spacetime(
                _height_body, mesh, 0.0, dt, p=p, s=s,
                params=(xs_cols, h_a, h_b, dt, 0),
            )
            apply_fn, rhs_fn = build_moving_mono_system(
                cap, D, f, bc_i, border, t, dt, scheme
            )
            if method == "direct":
                T = _direct_solve(apply_fn, rhs_fn(Told))
            else:
                from jax.scipy.sparse.linalg import bicgstab

                T, _ = bicgstab(apply_fn, rhs_fn(Told), x0=Told, tol=1e-9,
                                maxiter=800)
            ops, Va, Vb, G0, C_sp, _ = slice_spacetime(cap)
            Id = _eval_D(D, C_sp)
            q = ops.flux(T[0], T[1])
            flux = Id * ops.HT(q)
            # column sums over the transverse (y) direction, real cells only
            col = lambda a: a[:nx, :].sum(axis=1)
            res_cols = col(Va) - col(Vb) - col(flux) / rhoL
            return T, res_cols

        def newton(Told, h_start, t):
            def cond(st):
                T, h_b, err, it = st
                return (it < max_iter) & (err > tol)

            def body(st):
                T, h_b, err, it = st
                Tn, res = slab_solve(Told, h_start, h_b, t)
                # res is in column-volume units; convert to height units
                h_new = h_b + alpha * res / dx
                return (Tn, h_new, jnp.linalg.norm(res), it + 1)

            init = (Told, h_start, jnp.asarray(jnp.inf, h_start.dtype), 0)
            T, h_b, err, it = jax.lax.while_loop(cond, body, init)
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
