"""1D one-phase Stefan problem vs the analytic similarity solution
s(t) = 2λ√(kt)  (benchmark/Stefan_1d_1ph.jl:17-70)."""

import numpy as np
import jax.numpy as jnp
from scipy.special import erf

import penguin_tpu as pt
from penguin_tpu.solvers.stefan1d import (
    MovingLiquidDiffusionUnsteadyMono,
    find_lambda_stefan,
    stefan_interface_position,
)


def test_stefan_1d_front_tracks_analytic():
    T0, k = 1.0, 1.0
    St = 1.0
    rhoL = 1.0 / St
    lam = find_lambda_stefan(St)

    nx, lx = 64, 2.0
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    dt = 1e-3
    t_start, t_end = 0.05, 0.1
    xf0 = stefan_interface_position(t_start, k, lam)

    def T_analytic(x, t):
        return T0 - T0 / erf(lam) * erf(x / (2 * np.sqrt(k * t)))

    C = np.asarray(mesh.nodes[0])  # placeholder; use centroids below
    cap0 = pt.compute_capacity(pt.geometry.halfspace(0, xf0), mesh)
    Cc = np.asarray(cap0.C_om[..., 0])
    Tw0 = jnp.asarray(np.maximum(T_analytic(Cc, t_start), 0.0))
    Tg0 = jnp.zeros(mesh.np_shape)

    ops0 = pt.make_diffusion_ops(cap0)
    bc_interface = pt.Dirichlet(0.0)  # melting temperature
    bc_b = pt.BorderConditions(
        {"bottom": pt.Dirichlet(T0), "top": pt.Dirichlet(0.0)}
    )
    phase = pt.Phase(cap0, ops0, lambda x, y, z, t: 0.0, k)
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, rhoL))

    solver = MovingLiquidDiffusionUnsteadyMono(
        phase, bc_b, bc_interface, dt, (Tw0, Tg0), mesh, "BE"
    )
    solver.solve(xf0, t_start, t_end, ic,
                 newton_params=(200, 1e-10, 1e-10, 1.0), p=6, s=1)

    n_solves = len(solver.xf_log)
    t_eff = t_start + n_solves * dt
    s_exact = stefan_interface_position(t_eff, k, lam)
    err = abs(solver.xf - s_exact)
    # front must move forward and track the similarity solution
    assert solver.xf > xf0 + 0.01
    assert np.all(np.diff(solver.xf_log) > -1e-10)
    assert err < 0.02, (solver.xf, s_exact)
    # Newton converged everywhere
    assert solver.newton_errs.max() < 1e-8


def test_stefan_1d_lr_strategies():
    """BB and rmsprop learning-rate strategies converge to the same front."""
    from penguin_tpu.solvers.stefan1d import MovingLiquidDiffusionUnsteadyMono

    T0, k = 1.0, 1.0
    lam = find_lambda_stefan(1.0)
    nx, lx = 48, 2.0
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    dt = 2e-3
    t_start = 0.05
    xf0 = stefan_interface_position(t_start, k, lam)
    cap0 = pt.compute_capacity(pt.geometry.halfspace(0, xf0), mesh)
    Cc = np.asarray(cap0.C_om[..., 0])
    Tw0 = jnp.asarray(np.maximum(
        T0 - T0 / erf(lam) * erf(Cc / (2 * np.sqrt(k * t_start))), 0.0))
    phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0),
                     lambda x, y, z, t: 0.0, k)
    bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(T0), "top": pt.Dirichlet(0.0)})
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, 1.0))
    fronts = {}
    for strat in ("fixed", "bb"):
        s = MovingLiquidDiffusionUnsteadyMono(
            phase, bc_b, pt.Dirichlet(0.0), dt,
            (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE")
        s.solve(xf0, t_start, t_start + 3.5 * dt, ic,
                newton_params=(100, 1e-10, 1e-10, 1.0), lr_strategy=strat)
        fronts[strat] = s.xf
    assert abs(fronts["fixed"] - fronts["bb"]) < 1e-6


def test_stefan_1d_adaptive_dt():
    from penguin_tpu.solvers.stefan1d import (
        MovingLiquidDiffusionUnsteadyMono,
        solve_stefan_1d_adaptive,
    )

    T0, k = 1.0, 1.0
    lam = find_lambda_stefan(1.0)
    nx, lx = 48, 2.0
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    t_start, t_end = 0.05, 0.08
    xf0 = stefan_interface_position(t_start, k, lam)
    cap0 = pt.compute_capacity(pt.geometry.halfspace(0, xf0), mesh)
    Cc = np.asarray(cap0.C_om[..., 0])
    Tw0 = jnp.asarray(np.maximum(
        T0 - T0 / erf(lam) * erf(Cc / (2 * np.sqrt(k * t_start))), 0.0))
    phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0),
                     lambda x, y, z, t: 0.0, k)
    bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(T0), "top": pt.Dirichlet(0.0)})
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, 1.0))
    s = MovingLiquidDiffusionUnsteadyMono(
        phase, bc_b, pt.Dirichlet(0.0), 5e-4,
        (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE")
    solve_stefan_1d_adaptive(s, xf0, t_start, t_end, ic,
                             newton_params=(100, 1e-10, 1e-10, 1.0),
                             cfl_target=0.4, dt_min=1e-5, dt_max=5e-3,
                             max_steps=300)
    assert abs(s.t_final - t_end) < 1e-9
    xf_exact = stefan_interface_position(t_end, k, lam)
    assert abs(s.xf - xf_exact) < 0.03, (s.xf, xf_exact)


def test_stefan_1d_coupled_newton_tracks_analytic():
    """Coupled-Newton variant (diffusion_coupled.jl) tracks the same
    similarity solution as the xf-iteration solver."""
    from penguin_tpu.solvers.stefan1d import (
        MovingLiquidDiffusionUnsteadyMonoCoupled,
    )

    T0, k = 1.0, 1.0
    St = 1.0
    rhoL = 1.0 / St
    lam = find_lambda_stefan(St)

    nx, lx = 48, 2.0
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    dt = 2e-3
    t_start, t_end = 0.05, 0.08
    xf0 = stefan_interface_position(t_start, k, lam)

    cap0 = pt.compute_capacity(pt.geometry.halfspace(0, xf0), mesh)
    Cc = np.asarray(cap0.C_om[..., 0])
    Tw0 = jnp.asarray(np.maximum(
        T0 - T0 / erf(lam) * erf(Cc / (2 * np.sqrt(k * t_start))), 0.0))
    Tg0 = jnp.zeros(mesh.np_shape)

    bc_b = pt.BorderConditions(
        {"bottom": pt.Dirichlet(T0), "top": pt.Dirichlet(0.0)}
    )
    phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0),
                     lambda x, y, z, t: 0.0, k)
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, rhoL))

    solver = MovingLiquidDiffusionUnsteadyMonoCoupled(
        phase, bc_b, pt.Dirichlet(0.0), dt, (Tw0, Tg0), mesh, "BE"
    )
    solver.solve(xf0, t_start, t_end, ic, newton_params=(30, 1e-9, 1e-9, 1.0))

    n_solves = len(solver.xf_log)
    t_eff = t_start + n_solves * dt
    s_exact = stefan_interface_position(t_eff, k, lam)
    assert solver.xf > xf0 + 0.005
    assert abs(solver.xf - s_exact) < 0.03, (solver.xf, s_exact)
    assert solver.newton_errs.max() < 1e-6, solver.newton_errs.max()
