"""Two-phase species diffusion with a moving interface at fixed interface
concentration (re-design of
``/root/reference/src/concentrationsolver/species.jl``: the ψ-weighted
moving diphasic blocks with Dirichlet interface rows C1γ = C2γ = Cm)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..assembly import border_info, eval_condition_value
from ..capacity import compute_capacity_spacetime
from .diffusion import _ScalarSolverBase
from .moving_diffusion import (
    _direct_solve,
    _eval_D,
    _eval_f,
    psi_weights,
    slice_spacetime,
)

__all__ = ["DiffusionUnsteadyConcentration"]


def build_concentration_system(cap1, cap2, D1, D2, f1, f2, Cm, border1,
                               border2, t, dt, scheme):
    """(apply, rhs) for the concentration system
    (A_concentration_unsteady_diph, species.jl:13-121): moving diphasic bulk
    blocks + identity interface rows C1γ = C2γ = Cm."""
    ops1, Va1, Vb1, G1, C1, Cg1 = slice_spacetime(cap1)
    ops2, Va2, Vb2, G2, C2, Cg2 = slice_spacetime(cap2)
    p1p, p1m = psi_weights(scheme, Vb1, Va1)
    p2p, p2m = psi_weights(scheme, Vb2, Va2)
    Id1 = _eval_D(D1, C1)
    Id2 = _eval_D(D2, C2)
    dV1, dV2 = Va1 - Vb1, Va2 - Vb2

    def apply(x):
        C1w, C1g, C2w, C2g = x
        q1 = ops1.flux(p1p * C1w, p1p * C1g)
        q2 = ops2.flux(p2p * C2w, p2p * C2g)
        r1 = Va1 * C1w + Id1 * ops1.GT(q1) - dV1 * C1g
        r3 = Va2 * C2w + Id2 * ops2.GT(q2) - dV2 * C2g
        r2 = C1g
        r4 = C2g
        if border1 is not None:
            r1 = border1.matvec(r1, C1w)
        if border2 is not None:
            r3 = border2.matvec(r3, C2w)
        return (r1, r2, r3, r4)

    def rhs(x_prev):
        C1w, C1g, C2w, C2g = x_prev
        cm = Cm * jnp.ones_like(Va1) if not callable(Cm) else eval_condition_value(
            Cm, [Cg1[..., d] for d in range(Cg1.shape[-1])], t
        )

        def bulk(ops, Vb, Id, pm, W, Gf, f, C):
            qm = ops.flux(pm * W, pm * Gf)
            fn = _eval_f(f, C, t)
            fn1 = _eval_f(f, C, t + dt)
            if scheme == "CN":
                return Vb * W - Id * ops.GT(qm) + 0.5 * ops.V * (fn + fn1)
            return Vb * W + ops.V * fn1

        b1 = bulk(ops1, Vb1, Id1, p1m, C1w, C1g, f1, C1)
        b3 = bulk(ops2, Vb2, Id2, p2m, C2w, C2g, f2, C2)
        if border1 is not None:
            b1 = border1.rhs(b1, t)
        if border2 is not None:
            b3 = border2.rhs(b3, t)
        return (b1, cm, b3, cm)

    return apply, rhs


class DiffusionUnsteadyConcentration(_ScalarSolverBase):
    """Moving-interface two-phase species diffusion
    (DiffusionUnsteadyConcentration, species.jl:241-507)."""

    def __init__(self, phase1, phase2, bc_b, ic, dt, u0, mesh, scheme="BE"):
        self.phase1, self.phase2 = phase1, phase2
        self.bc_b = bc_b
        self.ic = ic
        self.dt = float(dt)
        self.u0 = u0
        self.mesh = mesh
        self.scheme = scheme

    def solve(self, body_st, body_c_st, t_start, t_end, method="direct",
              p=6, s=1):
        dt = self.dt
        K = int(np.ceil((t_end - t_start) / dt - 1e-12))
        mesh, scheme = self.mesh, self.scheme
        D1, f1 = self.phase1.diffusion, self.phase1.source
        D2, f2 = self.phase2.diffusion, self.phase2.source
        Cm = self.ic.scalar.value
        bc_b = self.bc_b

        def step(x, t):
            cap1 = compute_capacity_spacetime(body_st, mesh, t, t + dt, p=p, s=s)
            cap2 = compute_capacity_spacetime(body_c_st, mesh, t, t + dt, p=p, s=s)
            b1m = border_info(mesh, bc_b, phase_mask=cap1.cell_types[..., 0] != 0)
            b2m = border_info(mesh, bc_b, phase_mask=cap2.cell_types[..., 0] != 0)
            apply_fn, rhs_fn = build_concentration_system(
                cap1, cap2, D1, D2, f1, f2, Cm, b1m, b2m, t, dt, scheme
            )
            b = rhs_fn(x)
            if method == "direct":
                return _direct_solve(apply_fn, b)
            from jax.scipy.sparse.linalg import bicgstab

            xn, _ = bicgstab(apply_fn, b, x0=x, tol=1e-10, maxiter=2000)
            return xn

        @jax.jit
        def run(u0):
            def body(x, k):
                return step(x, t_start + k * dt), None

            return jax.lax.scan(body, u0, jnp.arange(K + 1.0))

        xf, _ = run(self.u0)
        self.x = xf
        self.states = [xf]
        return self.x
