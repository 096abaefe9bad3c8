"""Two-phase 1D Stefan (Neumann problem) vs the analytic similarity
solution (reference benchmark/Stefan_1d_2ph.jl)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import erf, erfc

import penguin_tpu as pt
from penguin_tpu.solvers.stefan1d import (
    MovingLiquidDiffusionUnsteadyDiph,
    find_lambda_stefan_two_phase,
)


@pytest.mark.slow
def test_two_phase_stefan_neumann():
    st_l, st_s = 1.0, 0.2
    rhoL = 1.0
    T_l0 = st_l * rhoL          # hot liquid wall
    T_s0 = -st_s * rhoL         # undercooled solid far field
    lam = find_lambda_stefan_two_phase(st_l, st_s)

    nx, lx = 64, 2.0
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    dt = 1e-3
    t_start, t_end = 0.05, 0.09
    xf0 = 2 * lam * np.sqrt(t_start)

    cap1 = pt.compute_capacity(pt.geometry.halfspace(0, xf0), mesh)
    cap2 = pt.compute_capacity(pt.geometry.halfspace(0, xf0, -1.0), mesh)
    ops1 = pt.make_diffusion_ops(cap1)
    ops2 = pt.make_diffusion_ops(cap2)
    ph1 = pt.Phase(cap1, ops1, lambda x, y, z, t: 0.0, 1.0)
    ph2 = pt.Phase(cap2, ops2, lambda x, y, z, t: 0.0, 1.0)
    bc_b = pt.BorderConditions(
        {"bottom": pt.Dirichlet(T_l0), "top": pt.Dirichlet(T_s0)}
    )
    # interface at the melting temperature: Tγ1 = Tγ2 = 0 via the jump row,
    # flux row carries the latent-heat scale
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, rhoL))

    C = np.asarray(cap1.C_om[..., 0])

    def Tl(x, t):
        return T_l0 * (1 - erf(x / (2 * np.sqrt(t))) / erf(lam))

    def Ts(x, t):
        return T_s0 * (1 - erfc(x / (2 * np.sqrt(t))) / erfc(lam))

    T1w = jnp.asarray(np.where(C <= xf0, Tl(C, t_start), 0.0))
    T2w = jnp.asarray(np.where(C >= xf0, Ts(C, t_start), 0.0))
    z = jnp.zeros(mesh.np_shape)
    u0 = (T1w, z, T2w, z)

    solver = MovingLiquidDiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, dt, u0,
                                               mesh, "BE")
    solver.solve(xf0, t_start, t_end,
                 newton_params=(200, 1e-10, 1e-10, 1.0), p=6, s=1)

    n_solves = len(solver.xf_log)
    t_eff = t_start + n_solves * dt
    xf_exact = 2 * lam * np.sqrt(t_eff)
    assert solver.xf > xf0 + 0.005
    assert abs(solver.xf - xf_exact) < 0.02, (solver.xf, xf_exact)
    assert solver.newton_errs.max() < 1e-8
