"""Stokes solver tests: 1D Poiseuille exactness (stronger than the
reference's residual-only gate, test/solver/stokes_test.jl:57-62) and a 2D
lid-driven smoke check."""

import numpy as np
import jax.numpy as jnp
import pytest

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import (
    MeanPressureGauge,
    PinPressureGauge,
    StokesMono,
    stokes_divergence,
)


def _fluid_1d(nx=64, Lx=1.0):
    mesh_p = pt.Mesh((nx,), (Lx,), (0.0,))
    dx = Lx / nx
    mesh_u = pt.Mesh((nx,), (Lx,), (-0.5 * dx,))
    body = pt.geometry.full_domain(1)
    cap_u = pt.compute_capacity(body, mesh_u)
    cap_p = pt.compute_capacity(body, mesh_p)
    op_u = pt.make_diffusion_ops(cap_u)
    op_p = pt.make_diffusion_ops(cap_p)
    fluid = pt.Fluid(
        mesh_u=(mesh_u,), mesh_p=mesh_p,
        capacity_u=(cap_u,), operator_u=(op_u,),
        capacity_p=cap_p, operator_p=op_p,
        mu=1.0, rho=1.0,
        f_u=lambda x, y, z: 1.0, f_p=lambda x, y, z: 0.0,
    )
    return fluid, mesh_u, mesh_p


def test_poiseuille_1d_residual():
    """1D: the incompressible solution is u ≡ 0 with a pressure ramp
    balancing the body force; the gate is the discrete residual (the
    reference's test/solver/stokes_test.jl:57-62 checks only this)."""
    fluid, mesh_u, mesh_p = _fluid_1d()
    bc_u = pt.BorderConditions({"bottom": pt.Dirichlet(0.0), "top": pt.Dirichlet(0.0)})
    solver = StokesMono(fluid, (bc_u,), PinPressureGauge(), pt.Dirichlet(0.0))
    solver.solve(method="direct")
    Ax = solver.apply_steady(solver.x)
    b = solver.rhs_steady()
    resid = max(float(jnp.abs(a - bb).max()) for a, bb in zip(Ax, b))
    assert resid <= 1e-10
    assert np.abs(np.asarray(solver.velocity(0))).max() < 1e-10


def test_hydrostatic_balance_2d_exact():
    """Closed box, constant body force, no-slip walls: u must vanish and
    the interior pressure gradient balance the force exactly (the enclosed
    analogue of the Poiseuille residual gate; this cut-cell staggering has
    wall semantics at domain borders, so through-flow needs Outflow BCs as
    in the reference)."""
    n, L = 16, 1.0
    fluid = _fluid_2d(n=n, L=L)
    h = L / n
    noslip = pt.Dirichlet(0.0)
    fluid.f_u = lambda x, y, z: 1.0
    bc = pt.BorderConditions(
        {"left": noslip, "right": noslip, "bottom": noslip, "top": noslip}
    )
    solver = StokesMono(fluid, (bc, bc), MeanPressureGauge(), pt.Dirichlet(0.0))
    solver.solve(method="lstsq")
    for d in range(2):
        assert np.abs(np.asarray(solver.velocity(d))[: n, : n]).max() < 1e-9
    # interior momentum rows: -h (p_i - p_{i-1}) = h^2 f  ->  dp = -h f
    p = np.asarray(solver.pressure)
    dp = p[1: n - 1, 1: n - 1] - p[0: n - 2, 1: n - 1]
    np.testing.assert_allclose(dp, -h, atol=1e-9)
    # mean gauge: weighted pressure mean is zero
    w = np.asarray(solver.mean_w)
    assert abs((w * p).sum()) < 1e-9


def _fluid_2d(n=24, L=1.0):
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    d = L / n
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    body = pt.geometry.full_domain(2)
    cap_ux = pt.compute_capacity(body, mesh_ux)
    cap_uy = pt.compute_capacity(body, mesh_uy)
    cap_p = pt.compute_capacity(body, mesh_p)
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(cap_ux, cap_uy),
        operator_u=(pt.make_diffusion_ops(cap_ux), pt.make_diffusion_ops(cap_uy)),
        capacity_p=cap_p, operator_p=pt.make_diffusion_ops(cap_p),
        mu=1.0, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    return fluid


def test_lid_driven_stokes_2d():
    fluid = _fluid_2d(n=16)
    lid = pt.Dirichlet(lambda x, y, z: 1.0)
    noslip = pt.Dirichlet(0.0)
    bc_ux = pt.BorderConditions(
        {"left": noslip, "right": noslip, "bottom": noslip, "top": lid}
    )
    bc_uy = pt.BorderConditions(
        {"left": noslip, "right": noslip, "bottom": noslip, "top": noslip}
    )
    solver = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(), pt.Dirichlet(0.0))
    solver.solve(method="lstsq")
    ux = np.asarray(solver.velocity(0))
    uy = np.asarray(solver.velocity(1))
    n = 16
    # lid velocity imposed on the top row of real cells
    assert np.abs(ux[:, n - 1] - 1.0).max() < 1e-9
    # interior flow develops and stays bounded
    assert 0.0 < np.abs(ux[:, : n - 1]).max() < 1.0
    assert 0.0 < np.abs(uy).max() < 1.0
    # discrete continuity holds away from the gauge row
    div = np.array(stokes_divergence(
        fluid,
        [solver.x[0], solver.x[2]],
        [solver.x[1], solver.x[3]],
    ))
    pin = solver.pin_idx
    div[pin] = 0.0
    assert np.abs(div[: n, : n]).max() < 1e-9


import jax  # noqa: E402  (used inside test for tree ops)


def test_traction_cut_bc():
    """Traction cut-BC on an embedded circle: solve runs, is finite, and
    the traction rows are satisfied (residual check); with Traction(0) on a
    full domain the system reduces to the no-interface case."""
    from penguin_tpu.boundary import Traction

    n, L = 16, 4.0
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    d = L / n
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    body = pt.geometry.circle((2.0, 2.0), 1.2)
    caps = [pt.compute_capacity(body, m, p=6, s=1)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=1.0, rho=1.0,
        f_u=lambda x, y, z: 1.0, f_p=lambda x, y, z: 0.0,
    )
    noslip = pt.Dirichlet(0.0)
    bc = pt.BorderConditions({k: noslip for k in ("left", "right", "bottom", "top")})
    solver = StokesMono(fluid, (bc, bc), PinPressureGauge(), Traction(0.75))
    solver.solve(method="lstsq")
    Ax = solver.apply_steady(solver.x)
    b = solver.rhs_steady()
    resid = max(float(jnp.abs(a - bb).max()) for a, bb in zip(Ax, b))
    assert resid < 1e-7, resid
    for d_ in range(2):
        assert np.isfinite(np.asarray(solver.velocity(d_))).all()


def test_periodic_channel_poiseuille():
    """Streamwise-periodic channel driven by a body force: periodic
    operators wrap the pressure gradient/divergence stencils and the
    Periodic velocity BC ties the wrap cells; u converges to the parabolic
    profile u(y) = y(H-y)/(2 mu) (reference Periodic handling,
    stokes.jl:867-1471)."""
    from penguin_tpu.solvers.stokes import PinPressureGauge, StokesMono

    n, L = 16, 1.0
    mu = 1.0
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    d = L / n
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    body = pt.geometry.full_domain(2)
    caps = [pt.compute_capacity(body, m, p=4, s=1)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    per = (True, False)
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0], periodic=per),
                    pt.make_diffusion_ops(caps[1], periodic=per)),
        capacity_p=caps[2],
        operator_p=pt.make_diffusion_ops(caps[2], periodic=per),
        mu=mu, rho=1.0,
        f_u=(lambda x, y, z: 1.0, lambda x, y, z: 0.0),
        f_p=lambda x, y, z: 0.0,
    )
    wall, perio = pt.Dirichlet(0.0), pt.Periodic()
    bc_ux = pt.BorderConditions({"left": perio, "right": perio,
                                 "bottom": wall, "top": wall})
    bc_uy = pt.BorderConditions({"left": perio, "right": perio,
                                 "bottom": wall, "top": wall})
    solver = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                        pt.Dirichlet(0.0))
    solver.solve(method="lstsq")

    ux = np.asarray(solver.velocity(0))[:n, :n]
    y = np.asarray(caps[0].C_om[..., 1])[:n, :n]
    # the discrete walls sit at the first/last cell centers (y = h and
    # y = L, the staggered-layout wall semantics): the discrete solution
    # is the exact parabola through those roots
    h = L / n
    u_exact = (y - h) * (L - y) / (2 * mu)
    assert np.abs(ux - u_exact).max() < 1e-10, np.abs(ux - u_exact).max()
    # streamwise invariance (periodic solution is x-independent)
    assert np.abs(ux - ux.mean(axis=0, keepdims=True)).max() < 1e-10


def test_outflow_channel_mass_conservation():
    """Dirichlet parabolic inflow + Outflow exit: the outflow rows copy the
    upstream neighbor (zero-gradient), and the exit flux balances the
    inflow flux (Outflow handling, stokes.jl:867-1471)."""
    from penguin_tpu.solvers.stokes import PinPressureGauge, StokesMono

    n, L = 16, 1.0
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    d = L / n
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    body = pt.geometry.full_domain(2)
    caps = [pt.compute_capacity(body, m, p=4, s=1)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0]),
                    pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=1.0, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    wall = pt.Dirichlet(0.0)
    inflow = pt.Dirichlet(lambda x, y, z: y * (1.0 - y))
    bc_ux = pt.BorderConditions({"left": inflow, "right": pt.Outflow(),
                                 "bottom": wall, "top": wall})
    bc_uy = pt.BorderConditions({"left": wall, "right": pt.Outflow(),
                                 "bottom": wall, "top": wall})
    solver = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                        pt.Dirichlet(0.0))
    solver.solve(method="lstsq")
    ux = np.asarray(solver.velocity(0))[:n, :n]
    assert np.isfinite(ux).all()
    # flux is exactly conserved through EVERY interior column: the outflow
    # plane carries prescribed-pressure rows (no continuity row is
    # sacrificed for a gauge pin, which used to leave a through-flow null
    # mode and a per-pin-cell flux defect)
    q = ux.sum(axis=1)
    ref = q[1]
    assert ref > 0.05  # flow actually enters
    assert np.abs(q[1:n] - ref).max() / ref < 1e-9, q
    # developed Poiseuille inflow => nearly x-independent solution; the
    # prescribed-pressure outflow plane perturbs the exit profile only
    # locally and at O(h) (measured 7.5e-5 at n=16)
    assert np.abs(ux[-1, 1:-1] - ux[-2, 1:-1]).max() < 1e-3


def test_mean_pressure_gauge_hydrostatic():
    """MeanPressureGauge (stokes.jl:1-17,1472-1510): same hydrostatic
    solution as the pin gauge, with volume-weighted zero-mean pressure."""
    from penguin_tpu.solvers.stokes import MeanPressureGauge, StokesMono

    n, L = 12, 1.0
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    d = L / n
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    body = pt.geometry.full_domain(2)
    caps = [pt.compute_capacity(body, m, p=4, s=1)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0]),
                    pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=1.0, rho=1.0,
        f_u=(lambda x, y, z: 0.0, lambda x, y, z: -1.0),  # gravity in -y
        f_p=lambda x, y, z: 0.0,
    )
    wall = pt.Dirichlet(0.0)
    bc = pt.BorderConditions({k: wall for k in
                              ("left", "right", "bottom", "top")})
    solver = StokesMono(fluid, (bc, bc), MeanPressureGauge(), pt.Dirichlet(0.0))
    solver.solve(method="lstsq")
    for dcomp in range(2):
        u = np.asarray(solver.velocity(dcomp))
        assert np.abs(u).max() < 1e-9  # hydrostatic: no flow
    p = np.asarray(solver.x[-1])[:n, :n]
    V = np.asarray(caps[2].V)[:n, :n]
    # volume-weighted zero mean
    assert abs((p * V).sum() / V.sum()) < 1e-9
    # hydrostatic gradient: |dp/dy| = 1 in the interior (the wall-row
    # pressures are gauge-orphaned, reference trims them)
    grad = np.diff(p[n // 2])[:-1] / d
    assert np.allclose(np.abs(grad), 1.0, atol=1e-8), grad[:3]


def test_outflow_prescribed_pressure_sets_level():
    """Outflow(pressure) (reference boundary.jl:60-74): the prescribed
    value acts as the pressure reference level at the outflow border —
    the velocity field is identical to the free-pressure Outflow() + gauge
    case, and the outlet pressure row equals the prescribed value."""
    n = 16
    fluid_a = _fluid_2d(n=n)
    fluid_b = _fluid_2d(n=n)
    wall = pt.Dirichlet(0.0)
    inflow = pt.Dirichlet(lambda x, y, z: y * (1.0 - y))
    p_ref = 2.5

    def solve(fluid, outflow, gauge):
        bc_ux = pt.BorderConditions({"left": inflow, "right": outflow,
                                     "bottom": wall, "top": wall})
        bc_uy = pt.BorderConditions({"left": wall, "right": outflow,
                                     "bottom": wall, "top": wall})
        s = StokesMono(fluid, (bc_ux, bc_uy), gauge, pt.Dirichlet(0.0))
        s.solve(method="lstsq")
        return s

    s_ref = solve(fluid_b, pt.Outflow(p_ref), PinPressureGauge())
    # Outflow() defaults the outlet-plane level to 0 (same closure, level
    # shift only); the gauge is inactive in both runs
    s_free = solve(fluid_a, pt.Outflow(), PinPressureGauge())
    for d in range(2):
        du = np.abs(np.asarray(s_free.velocity(d))
                    - np.asarray(s_ref.velocity(d)))[:n, :n].max()
        assert du < 1e-8, du
    p = np.asarray(s_ref.pressure)
    # prescribed level imposed on every cell of the outflow plane (the
    # plane closure that makes the open system nonsingular); the state
    # stores -p_physical, so the pinned rows read -p_ref
    pin = np.asarray(s_ref.outflow_p_mask)
    assert pin.sum() >= n - 2, pin.sum()
    np.testing.assert_allclose(p[pin], -p_ref, atol=1e-9)
    # active pressure fields agree up to the constant level shift (orphan
    # cells are identity rows = 0 in both runs)
    act = np.asarray(s_ref.p_active)
    diff = (np.asarray(s_ref.pressure) - np.asarray(s_free.pressure))[act]
    assert np.abs(diff - diff.mean()).max() < 1e-7
