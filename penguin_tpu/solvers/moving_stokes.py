"""Prescribed-motion (moving-boundary) Stokes.

Re-design of ``/root/reference/src/prescribedmotionsolver/stokes.jl``:
per time step the velocity-component and pressure capacities are rebuilt on
the space-time slab (on device, traced slab bounds) and the unsteady Stokes
system is assembled from the slab's spatial blocks:

  momentum d: (Iρ V^st/dt) uω + θ visc^st(Ψ⁺ ·) uω/uγ - ΔV uγ + grad^st p
  tie d:      Ψ⁺ uγ = Ψ⁺ g_cut
  continuity: spatial slices of the slab pressure operators

(moving_stokes2D_blocks + assemble, stokes.jl:327-520).  For a static body
this reduces exactly to the unsteady Stokes θ-scheme (the slab capacities
carry the dt factors) — unit-tested against StokesMono.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..assembly import eval_condition_value, _col_G_nz
from ..boundary import Dirichlet, Outflow
from ..capacity import compute_capacity_spacetime, gamma_half_moments
from ..operators import _LsqGradient, _cross_weights, _shift_m, _shift_p, \
    dm, dm_t, sw_apply, sw_applyT
from .moving_diffusion import psi_weights, slice_spacetime, \
    spatial_capacity_from_slab
from .stokes import _AXIS_KEYS, _AXIS_KEYS_1D, PinPressureGauge, \
    VelocityBorder

__all__ = ["MovingStokesMono"]


class MovingStokesMono:
    def __init__(self, fluid, bc_u, pressure_gauge=None, bc_cut=None,
                 cut_flux="auto"):
        self.fluid = fluid
        self.bc_u = bc_u if isinstance(bc_u, tuple) else (bc_u,)
        self.bc_cut = bc_cut or Dirichlet(0.0)
        self.N = fluid.ndim
        # ``cut_flux="moment"``: the moment-consistent cut flux extended to
        # the space-time slab (see spatial_capacity_from_slab) — per step
        # the slab capacities are built with ``cut_moments=True`` and the
        # γ placement / wet-line cross-moment corrections are applied on
        # the TIME-INTEGRATED measures, removing the O(h) moving-wall
        # placement the reference's prescribed-motion Stokes keeps
        # (/root/reference/src/prescribedmotionsolver/stokes.jl:256-561).
        # "auto" = "moment" for N>=2, "centroid" in 1D (no transverse
        # moments exist there).
        if cut_flux == "auto":
            cut_flux = "moment" if self.N >= 2 else "centroid"
        self.cut_flux = cut_flux
        self.borders = tuple(
            VelocityBorder(fluid.mesh_u[d], self.bc_u[d], d)
            for d in range(self.N)
        )
        gauge = pressure_gauge or PinPressureGauge()
        Vp = np.asarray(fluid.capacity_p.V)
        # Outflow plane closure (same reasoning as StokesMono: in an open
        # system every continuity row is independent, so a single pin
        # leaves an exact through-flow null mode and a moving wall that
        # displaces net volume makes the system INCONSISTENT — lstsq then
        # smears the imbalance over the whole field).  The outlet border
        # plane's continuity rows become p = 0.  The plane is chosen
        # statically (the moving body is assumed not to cross the outlet).
        p_shape = Vp.shape
        keymap = _AXIS_KEYS_1D if self.N == 1 else _AXIS_KEYS
        out_mask = np.zeros(p_shape, bool)
        for bc_i_, bc in enumerate(self.bc_u):
            for key, cond in bc.borders:
                if not isinstance(cond, Outflow) or key not in keymap:
                    continue
                axis, side = keymap[key]
                if axis >= self.N or axis != bc_i_:
                    continue
                sl = [slice(None)] * len(p_shape)
                sl[axis] = 0 if side == 0 else fluid.mesh_p.n[axis] - 1
                out_mask[tuple(sl)] = True
        self.outflow_p_mask = jnp.asarray(out_mask) if out_mask.any() \
            else None
        if self.outflow_p_mask is not None:
            self.pin_mask = jnp.zeros(p_shape, bool)
        else:
            idx = gauge.index if isinstance(gauge, PinPressureGauge) \
                else None
            if idx is None:
                flatF = Vp.ravel(order="F")
                k = int(np.argmax(flatF > 1e-12)) \
                    if (flatF > 1e-12).any() else 0
                idx = np.unravel_index(k, Vp.shape, order="F")
            pin = np.zeros(Vp.shape, bool)
            pin[tuple(int(v) for v in idx)] = True
            self.pin_mask = jnp.asarray(pin)

    def _slab_system(self, body_st, t, dt, theta, scheme, p, s, x_prev,
                     t_next):
        N = self.N
        fl = self.fluid
        moment = self.cut_flux == "moment"
        comp = []
        caps_sp = []
        ghm = []
        for d in range(N):
            cap_st = compute_capacity_spacetime(
                body_st, fl.mesh_u[d], 0.0, dt, p=p, s=s,
                params=(t,), cut_moments=moment,
            )
            sl = slice_spacetime(cap_st)
            if moment:
                cap_sp = spatial_capacity_from_slab(cap_st, fl.mesh_u[d])
                caps_sp.append(cap_sp)
                ghm.append(gamma_half_moments(cap_sp))
                sl = (dataclasses.replace(sl[0],
                                          Xw=_cross_weights(cap_sp)),) \
                    + sl[1:]
            comp.append(sl)
        cap_p_st = compute_capacity_spacetime(
            body_st, fl.mesh_p, 0.0, dt, p=p, s=s, params=(t,),
            cut_moments=moment,
        )
        ops_p, Va_p, Vb_p, _, _, _ = slice_spacetime(cap_p_st)
        ghm_p = None
        divw = None
        if moment:
            cap_p_sp = spatial_capacity_from_slab(cap_p_st, fl.mesh_p)
            ghm_p = gamma_half_moments(cap_p_sp)
            # wet-face cross-moment div/grad pair (the pressure-drag half
            # of the moment closure — see StokesMono.__init__): continuity
            # samples A^p_d·uω_d at the full-face centre, the exact slab
            # mass flux needs u at the wet-face centroid Am^p
            divw = []
            hmax = max(float(v) for v in fl.mesh_p.h)
            for d in range(N):
                cap_u = caps_sp[d]
                lsq = _LsqGradient(cap_u)
                delta = cap_p_sp.Am[d] - cap_u.C_om
                delta = jnp.clip(delta, -hmax, hmax)
                face_cut = (cap_p_sp.cell_types == -1) | \
                    (cap_u.cell_types == -1)
                delta = jnp.where(face_cut[..., None], delta, 0.0)
                delta = delta * cap_p_sp.A[d][..., None]
                divw.append(lsq.weights_for(delta))

        mu = fl.mu
        rho = fl.rho

        def coef(c, C_sp):
            if callable(c):
                coords = [C_sp[..., i] for i in range(C_sp.shape[-1])]
                return eval_condition_value(c, coords)
            return c

        psis = [psi_weights(scheme, sl[2], sl[1]) for sl in comp]
        u_act = [
            jnp.asarray(_col_G_nz(sl[0]) | (sl[1] != 0) | (sl[2] != 0))
            for sl in comp
        ]

        def apply(x):
            uws = x[0:2 * N:2]
            ugs = x[1:2 * N:2]
            pp = x[2 * N]
            out = []
            for d in range(N):
                ops, Va, Vb, G0, C_sp, Cg = comp[d]
                Imu = coef(mu, C_sp)
                Irho = coef(rho, C_sp)
                pplus = psis[d][0]
                q = ops.flux(pplus * uws[d], pplus * ugs[d])
                dV = Va - Vb
                # mass carries the SLAB-FACE volumes (Va new / Vb old in
                # the rhs), not the slab average: with the -dV uγ swept-
                # momentum term this makes any rigid motion (u = uγ = U)
                # an exact solution of the momentum row — Va U - dV U =
                # Vb U — exactly like the scalar moving schemes
                # (build_moving_mono_system).  The slab-average mass made
                # slabs where the interface crosses a velocity node
                # inconsistent (measured: a 1D piston plug solving to
                # 0.45 U on crossing slabs, exact elsewhere).
                yw = (
                    Irho * Va * uws[d]
                    + theta * Imu * ops.GT(q)
                    - dV * ugs[d]
                    - ops_p.A[d] * dm(pp, d)
                )
                if divw is not None:
                    yw = yw - sw_applyT(divw[d], dm(pp, d))
                yw = jnp.where(u_act[d], yw, uws[d])
                yg = pplus * ugs[d]
                yg = jnp.where(pplus != 0, yg, ugs[d])
                yw, yg = self.borders[d].matvec(yw, yg, uws[d], ugs[d])
                out += [yw, yg]
            yp = 0.0
            for d in range(N):
                Ap = ops_p.A[d]
                Bp = ops_p.B[d]
                yp = yp - dm_t(Ap * uws[d], d) + dm_t(Ap * ugs[d], d) \
                    - Bp * dm_t(ugs[d], d)
                if divw is not None:
                    yp = yp - dm_t(sw_apply(divw[d], uws[d]), d)
            p_act = _col_G_nz(ops_p)
            yp = jnp.where(p_act, yp, pp)
            yp = jnp.where(self.pin_mask, pp, yp)
            if self.outflow_p_mask is not None:
                yp = jnp.where(self.outflow_p_mask, pp, yp)
            return tuple(out) + (yp,)

        def rhs():
            out = []
            for d in range(N):
                ops, Va, Vb, G0, C_sp, Cg = comp[d]
                Imu = coef(mu, C_sp)
                Irho = coef(rho, C_sp)
                pplus = psis[d][0]
                uw_p = x_prev[2 * d]
                ug_p = x_prev[2 * d + 1]
                coords = [C_sp[..., i] for i in range(C_sp.shape[-1])]
                fu_d = fl.f_u[d] if isinstance(fl.f_u, (tuple, list)) \
                    else fl.f_u
                f_p = eval_condition_value(fu_d, coords, t_next - dt)
                f_n = eval_condition_value(fu_d, coords, t_next)
                load = ops.V * (theta * f_n + (1 - theta) * f_p)
                q = ops.flux(pplus * uw_p, pplus * ug_p)
                # Vb mass on the rhs pairs with the Va mass + swept -dV uγ
                # on the matrix side (see apply): rigid motions are exact
                bw = Irho * Vb * uw_p \
                    - (1 - theta) * Imu * ops.GT(q) + load
                if moment:
                    # slab γ placement correction (static analogue:
                    # StokesMono._gamma_moment_rhs): the ψ⁺-weighted tie
                    # delivers pplus·g(C_ga) through H per half strip; the
                    # exact slab Γ term wants pplus·g(X_half) on the
                    # time-integrated half-strip measures.  Temporal
                    # quadrature follows the scheme's own θ weights.
                    Cgf = jnp.where((G0 > 0)[..., None], Cg, C_sp)
                    gfco = [Cgf[..., i] for i in range(N)]
                    for tw, tt in ((theta, t_next),
                                   (1.0 - theta, t_next - dt)):
                        if tw == 0.0:
                            continue
                        g_cga = eval_condition_value(
                            self._cut(d).value, gfco, tt)
                        dq = []
                        for a in range(N):
                            S_lo, X_lo, S_hi, X_hi = ghm[d][a]
                            g_lo = eval_condition_value(
                                self._cut(d).value,
                                [X_lo[..., i] for i in range(N)], tt)
                            g_hi = eval_condition_value(
                                self._cut(d).value,
                                [X_hi[..., i] for i in range(N)], tt)
                            D_lo = pplus * S_lo * (g_lo - g_cga)
                            D_hi = pplus * S_hi * (g_hi - g_cga)
                            dq.append(_shift_m(D_hi, a) + D_lo)
                        bw = bw - tw * Imu * ops.GT(ops.Wq(tuple(dq)))
                bw = jnp.where(u_act[d], bw, 0.0)
                # γ-tie evaluation points: C_ga where the slab is cut, the
                # slab CELL centroid elsewhere — the slab C_ga is stored as
                # the zero vector at non-cut cells, and their uγ DOFs are
                # NOT structurally inert: the continuity H-term couples
                # cell k's γ into cell k±1's mass balance with O(h) weight
                # wherever a full cell abuts a cut face, so evaluating g at
                # the origin injected O(1) bogus wall values (the static
                # solver's round-4 fix, stokes.py rhs_steady; measured
                # here: 80% profile error on the static-body Couette
                # annulus through the moving path)
                Cgf = jnp.where((G0 > 0)[..., None], Cg, C_sp)
                gco = [Cgf[..., i] for i in range(Cgf.shape[-1])]
                g = eval_condition_value(self._cut(d).value, gco, t_next)
                bg = pplus * g
                # dead slots keep an identity row but solve uγ = g (not 0):
                # the continuity H-term differences uγ ACROSS cells, so a
                # zeroed slot next to the interface injects a spurious
                # -Bp (uγ_wet - 0) mass defect on slabs where the wall
                # crosses a velocity node (measured: a 1D piston plug
                # solving to 0.45 U on those slabs).  The wet region
                # already carries uγ = g through the tie rows; this just
                # extends the same field into the dry slots.
                bg = jnp.where(pplus != 0, bg, g * jnp.ones_like(bg))
                bw, bg = self.borders[d].rhs(bw, bg, t_next)
                out += [bw, bg]
            bp = jnp.zeros_like(self.fluid.capacity_p.V)
            if moment:
                # continuity γ placement correction (static analogue:
                # StokesMono._cont_moment_rhs) on the slab p-mesh
                # half-strip moments
                delta = 0.0
                for d in range(N):
                    _, _, _, G0d, C_spd, Cgd = comp[d]
                    Cgf = jnp.where((G0d > 0)[..., None], Cgd, C_spd)
                    gtie = eval_condition_value(
                        self._cut(d).value,
                        [Cgf[..., i] for i in range(N)], t_next)
                    gtie = jnp.broadcast_to(gtie, G0d.shape)
                    S_lo, X_lo, S_hi, X_hi = ghm_p[d]
                    g_lo = eval_condition_value(
                        self._cut(d).value,
                        [X_lo[..., i] for i in range(N)], t_next)
                    g_hi = eval_condition_value(
                        self._cut(d).value,
                        [X_hi[..., i] for i in range(N)], t_next)
                    delta = delta + S_lo * (g_lo - gtie) \
                        + S_hi * (g_hi - _shift_p(gtie, d))
                p_act = _col_G_nz(ops_p)
                bp = jnp.where(p_act, -delta, bp)
            bp = jnp.where(self.pin_mask, 0.0, bp)
            if self.outflow_p_mask is not None:
                bp = jnp.where(self.outflow_p_mask, 0.0, bp)
            return tuple(out) + (bp,)

        return apply, rhs

    def _cut(self, d):
        bc = self.bc_cut
        return bc[d] if isinstance(bc, (tuple, list)) else bc

    def zero_state(self):
        N = self.N
        z = [jnp.zeros_like(self.fluid.operator_u[d].V) for d in range(N)]
        out = []
        for d in range(N):
            out += [z[d], z[d]]
        return tuple(out) + (jnp.zeros_like(self.fluid.capacity_p.V),)

    def solve(self, body_st, dt, t_start, t_end, scheme="BE", x0=None,
              p=4, s=1, method="lstsq", tol=1e-10, maxiter=2000):
        """``body_st(x..., tau, params=(t_abs,))`` is evaluated on the slab
        with slab-relative time tau in [0, dt]; params carries the absolute
        slab start so rigid motions can be expressed.

        ``method``: "lstsq" (dense min-norm SVD per step — robust for
        small grids, O(n³)), "pgmres" (matrix-free row-equilibrated
        restarted GMRES warm-started from the previous step), or "fgmres"
        (flexible GMRES with the STATIC geometry's block-Schur/DCT
        preconditioner — the slab operator is ~dt x the static unsteady
        Stokes operator away from the moving wall, so the static M is an
        effective preconditioner for every slab; the scalable choice at
        n >= 32 where plain equilibrated pgmres stalls, measured relres
        8e-5 at 2000 its vs 7e-7 at 600 with M)."""
        theta = 0.5 if scheme == "CN" else 1.0
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        x = x0 if x0 is not None else self.zero_state()

        M_static = None
        if method == "fgmres":
            from .stokes import StokesMono

            ref = StokesMono(self.fluid, self.bc_u, PinPressureGauge(),
                             self.bc_cut, cut_flux="centroid")
            M_static = ref.make_block_preconditioner(
                dt=dt, theta=theta, schur="dct_cg", schur_cg_iters=8)

        @jax.jit
        def run(x0_):
            def body(xc, k):
                t = t_start + k * dt
                apply_fn, rhs_fn = self._slab_system(
                    body_st, t, dt, theta, scheme, p, s, xc, t + dt
                )
                from jax.flatten_util import ravel_pytree

                b = rhs_fn()
                if method == "fgmres":
                    from ..linsolve import fgmres

                    sol, _, _ = fgmres(apply_fn, b, xc, Minv=M_static,
                                       tol=tol, maxiter=maxiter,
                                       restart=60)
                    return sol, None
                if method == "pgmres":
                    from ..linsolve import pgmres, row_norm_equilibrator

                    Minv = row_norm_equilibrator(apply_fn, b)
                    sol, _, _ = pgmres(apply_fn, b, xc, Minv=Minv,
                                       tol=tol, maxiter=maxiter,
                                       restart=60)
                    return sol, None
                flat, unravel = ravel_pytree(b)
                nloc = flat.size

                def fa(v):
                    return ravel_pytree(apply_fn(unravel(v)))[0]

                A = jax.vmap(fa)(jnp.eye(nloc, dtype=flat.dtype)).T
                row_nz = jnp.abs(A).sum(axis=1) > 1e-13
                col_nz = jnp.abs(A).sum(axis=0) > 1e-13
                keep = row_nz & col_nz
                dd = keep.astype(A.dtype)
                A = A * dd[:, None] * dd[None, :] + jnp.diag(1.0 - dd)
                bb = jnp.where(keep, flat, 0.0)
                sol, *_ = jnp.linalg.lstsq(A, bb, rcond=1e-12)
                return unravel(sol), None

            xf, _ = jax.lax.scan(body, x0_, jnp.arange(K, dtype=jnp.float64))
            return xf

        self.x = run(x)
        return self.x

    def velocity(self, d, gamma=False):
        return self.x[2 * d + (1 if gamma else 0)]

    @property
    def pressure(self):
        return self.x[2 * self.N]
