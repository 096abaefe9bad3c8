"""2D height-function Stefan: a flat front driven from the hot bottom wall
must reproduce the 1D similarity solution column-by-column."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import erf

import penguin_tpu as pt
from penguin_tpu.solvers.stefan2d_height import MovingLiquidDiffusionUnsteadyMono2D
from penguin_tpu.solvers.stefan1d import (
    find_lambda_stefan,
    stefan_interface_position,
)


@pytest.mark.slow
def test_height_function_flat_front():
    T0, k = 1.0, 1.0
    St = 1.0
    rhoL = 1.0 / St
    lam = find_lambda_stefan(St)

    nx, ny = 12, 48
    lx, ly = 0.6, 2.0
    mesh = pt.Mesh((nx, ny), (lx, ly), (0.0, 0.0))
    dt = 2e-3
    t_start, t_end = 0.05, 0.08
    hf0 = stefan_interface_position(t_start, k, lam)

    cap0 = pt.compute_capacity(pt.geometry.halfspace(1, hf0), mesh, p=4, s=1)
    ops0 = pt.make_diffusion_ops(cap0)
    C = np.asarray(cap0.C_om)

    def T_analytic(y, t):
        return T0 - T0 / erf(lam) * erf(y / (2 * np.sqrt(k * t)))

    Tw0 = jnp.asarray(np.maximum(T_analytic(C[..., 1], t_start), 0.0))
    Tg0 = jnp.zeros(mesh.np_shape)

    bc_i = pt.Dirichlet(0.0)
    bc_b = pt.BorderConditions(
        {"bottom": pt.Dirichlet(T0), "top": pt.Dirichlet(0.0)}
    )
    # NOTE scalar border keys: bottom/top = x-axis, left/right = y-axis;
    # the hot wall is at y=0 -> 'left'
    bc_b = pt.BorderConditions(
        {"left": pt.Dirichlet(T0), "right": pt.Dirichlet(0.0)}
    )
    phase = pt.Phase(cap0, ops0, lambda x, y, z, t: 0.0, k)
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, rhoL))

    solver = MovingLiquidDiffusionUnsteadyMono2D(
        phase, bc_b, bc_i, dt, (Tw0, Tg0), mesh, "BE"
    )
    h0 = jnp.full(nx, hf0)
    solver.solve(h0, 0.0, t_end - t_start - dt / 2, ic,
                 newton_params=(60, 1e-9, 1e-9, 1.0), p=4, s=1)

    n_solves = solver.height_log.shape[0]
    t_eff = t_start + n_solves * dt
    h_exact = stefan_interface_position(t_eff, k, lam)
    h = solver.heights
    assert np.all(np.diff(solver.height_log.mean(axis=1)) > -1e-10)
    assert abs(h.mean() - h_exact) < 0.03, (h.mean(), h_exact)
    # front stays flat
    assert h.std() < 5e-3


@pytest.mark.slow
def test_height_function_diph_matches_mono():
    """Diphasic height solver (diffusion2d.jl:652+) consistency gate: with
    phase 2 held at the interface temperature (zero flux2), the two-phase
    heights must reproduce the one-phase similarity solution."""
    from penguin_tpu.solvers.stefan2d_height import (
        MovingLiquidDiffusionUnsteadyDiph2D,
    )

    T0, k = 1.0, 1.0
    St = 1.0
    rhoL = 1.0 / St
    lam = find_lambda_stefan(St)

    nx, ny = 12, 48
    lx, ly = 0.6, 2.0
    mesh = pt.Mesh((nx, ny), (lx, ly), (0.0, 0.0))
    dt = 2e-3
    t_start, t_end = 0.05, 0.08
    hf0 = stefan_interface_position(t_start, k, lam)

    cap0 = pt.compute_capacity(pt.geometry.halfspace(1, hf0), mesh, p=4, s=1)
    ops0 = pt.make_diffusion_ops(cap0)
    C = np.asarray(cap0.C_om)

    def T_analytic(y, t):
        return T0 - T0 / erf(lam) * erf(y / (2 * np.sqrt(k * t)))

    Tw0 = jnp.asarray(np.maximum(T_analytic(C[..., 1], t_start), 0.0))
    z = jnp.zeros(mesh.np_shape)

    bc_b = pt.BorderConditions(
        {"left": pt.Dirichlet(T0), "right": pt.Dirichlet(0.0)}
    )
    ph1 = pt.Phase(cap0, ops0, lambda x, y, z, t: 0.0, k)
    ph2 = pt.Phase(cap0, ops0, lambda x, y, z, t: 0.0, k)
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, rhoL))

    solver = MovingLiquidDiffusionUnsteadyDiph2D(
        ph1, ph2, bc_b, ic, dt, (Tw0, z, z, z), mesh, "BE"
    )
    h0 = jnp.full(nx, hf0)
    solver.solve(h0, 0.0, t_end - t_start - dt / 2,
                 newton_params=(60, 1e-9, 1e-9, 1.0), p=4, s=1)

    n_solves = solver.height_log.shape[0]
    t_eff = t_start + n_solves * dt
    h_exact = stefan_interface_position(t_eff, k, lam)
    h = solver.heights
    assert np.all(np.diff(solver.height_log.mean(axis=1)) > -1e-10)
    assert abs(h.mean() - h_exact) < 0.03, (h.mean(), h_exact)
    assert h.std() < 5e-3
    # phase-2 field stayed at the interface temperature (flux2 == 0 gate)
    assert float(jnp.abs(solver.x[2]).max()) < 1e-6
