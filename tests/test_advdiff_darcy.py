"""Advection-diffusion + Darcy solver tests."""

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.advdiff import (
    AdvectionDiffusionSteadyMono,
    AdvectionDiffusionUnsteadyMono,
)
from penguin_tpu.solvers.darcy import DarcyFlow, solve_darcy_velocity


def test_advdiff_traveling_gaussian_1d():
    """u_t + a u_x = D u_xx on a full 1D domain; CN should track the exact
    advected-diffused Gaussian to a few percent at n=128."""
    nx, lx = 128, 8.0
    a, D = 1.0, 0.05
    t0 = 0.25
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    cap = pt.compute_capacity(pt.geometry.full_domain(1), mesh)

    def exact(x, t):
        return np.exp(-((x - 2.0 - a * t) ** 2) / (4 * D * (t + t0))) / np.sqrt(
            4 * np.pi * D * (t + t0)
        )

    u_bulk = (jnp.full(mesh.np_shape, a),)
    conv = pt.make_convection_ops(cap, u_bulk, jnp.zeros(mesh.np_shape))
    bcd = pt.Dirichlet(0.0)
    bc_b = pt.BorderConditions({"bottom": bcd, "top": bcd})
    phase = pt.Phase(cap, conv, lambda x, y, z, t: 0.0, D)
    dt = 0.2 * (lx / nx) / a
    t_end = 1.0
    C = np.asarray(cap.C_om[..., 0])
    u0w = jnp.asarray(exact(C, 0.0))
    solver = AdvectionDiffusionUnsteadyMono(phase, bc_b, bcd, dt,
                                            (u0w, u0w), "CN")
    solver.solve(t_end, method="direct")
    n_solves = int(np.ceil(t_end / dt - 1e-12)) + 1
    t_eff = n_solves * dt  # reference loop applies one extra initial solve
    got = np.asarray(solver.x_omega)[:nx]
    ref = exact(C[:nx], t_eff)
    err = np.sqrt(np.mean((got - ref) ** 2)) / np.abs(ref).max()
    assert err < 0.02, err


def test_advdiff_steady_reduces_to_diffusion_when_u0():
    """With zero velocity the advdiff system must equal pure diffusion."""
    from penguin_tpu.solvers import DiffusionSteadyMono

    mesh = pt.Mesh((24, 24), (4.0, 4.0), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.circle((2.0, 2.0), 1.0), mesh)
    zeros = jnp.zeros(mesh.np_shape)
    conv = pt.make_convection_ops(cap, (zeros, zeros), zeros)
    ops = pt.make_diffusion_ops(cap)
    bc = pt.Dirichlet(0.0)
    bc1 = pt.Dirichlet(1.0)
    bc_b = pt.BorderConditions({"left": bc1, "right": bc1, "top": bc1, "bottom": bc1})
    f = lambda x, y, z: 4.0
    s1 = AdvectionDiffusionSteadyMono(pt.Phase(cap, conv, f, 1.0), bc_b, bc)
    s1.solve(method="direct")
    s2 = DiffusionSteadyMono(pt.Phase(cap, ops, f, 1.0), bc_b, bc)
    s2.solve(method="direct")
    assert np.abs(np.asarray(s1.x_omega) - np.asarray(s2.x_omega)).max() < 1e-10


def test_darcy_linear_pressure():
    """Uniform flow: p linear in x on a full domain -> u = -∇p constant."""
    mesh = pt.Mesh((32, 8), (1.0, 0.25), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh)
    ops = pt.make_diffusion_ops(cap)
    bc = pt.Dirichlet(0.0)
    lin = pt.Dirichlet(lambda x, y, z: 1.0 - x)
    bc_b = pt.BorderConditions(
        {"bottom": lin, "top": lin, "left": lin, "right": lin}
    )
    phase = pt.Phase(cap, ops, lambda x, y, z: 0.0, 1.0)
    solver = DarcyFlow(phase, bc_b, bc)
    solver.solve(method="direct")
    u = solve_darcy_velocity(solver, phase)
    ux = np.asarray(u[0])
    W = np.asarray(cap.W[0])
    vals = ux[W > 0]
    # exact linear pressure -> u_x = 1 on every wet face
    np.testing.assert_allclose(vals, 1.0, atol=1e-9)


def test_darcy_unsteady_relaxes_to_steady():
    """DarcyFlowUnsteady (darcy.jl:45-90): transient pressure relaxes to
    the steady linear-pressure solution."""
    from penguin_tpu.solvers.darcy import DarcyFlow, DarcyFlowUnsteady

    mesh = pt.Mesh((32, 8), (1.0, 0.25), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh)
    ops = pt.make_diffusion_ops(cap)
    lin = pt.Dirichlet(lambda x, y, z: 1.0 - x)
    bc_b = pt.BorderConditions(
        {"bottom": lin, "top": lin, "left": lin, "right": lin})
    phase = pt.Phase(cap, ops, lambda x, y, z: 0.0, 1.0)

    steady = DarcyFlow(phase, bc_b, pt.Dirichlet(0.0))
    steady.solve(method="direct")
    p_ref = np.asarray(steady.x_omega)

    phase_t = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)
    z = jnp.zeros(mesh.np_shape)
    un = DarcyFlowUnsteady(phase_t, bc_b, pt.Dirichlet(0.0), 2e-3, (z, z), "BE")
    un.solve(0.6, method="direct")
    p_t = np.asarray(un.x_omega)
    sel = np.asarray(cap.cell_types) != 0
    assert np.abs(p_t[sel] - p_ref[sel]).max() < 1e-3


def test_stokes_symmetry_half_channel():
    """Half-channel with a Symmetry top boundary: streamwise-periodic body
    force flow has zero shear at the symmetry plane (u monotone up to the
    top row, which mirrors its neighbor) — the Symmetry row semantics of
    apply_velocity_dirichlet (stokes.jl:867-1471)."""
    from penguin_tpu.solvers.stokes import PinPressureGauge, StokesMono

    n, L = 16, 1.0
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
        mu=1.0, rho=1.0,
        f_u=(lambda x, y, z: 1.0, lambda x, y, z: 0.0),
        f_p=lambda x, y, z: 0.0,
    )
    wall, sym, perio = pt.Dirichlet(0.0), pt.Symmetry(), pt.Periodic()
    bc_ux = pt.BorderConditions({"left": perio, "right": perio,
                                 "bottom": wall, "top": sym})
    bc_uy = pt.BorderConditions({"left": perio, "right": perio,
                                 "bottom": wall, "top": sym})
    solver = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                        pt.Dirichlet(0.0))
    solver.solve(method="lstsq")
    ux = np.asarray(solver.velocity(0))[:n, :n]
    col = ux[n // 2]
    # zero shear at the symmetry plane: last row mirrors its neighbor
    assert abs(col[-1] - col[-2]) < 1e-10
    # monotone half-Poiseuille profile, x-invariant
    assert np.all(np.diff(col[:-1]) > -1e-12)
    assert np.abs(ux - ux.mean(axis=0, keepdims=True)).max() < 1e-9
    uy = np.asarray(solver.velocity(1))[:n, :n]
    assert np.abs(uy).max() < 1e-9


def test_advdiff_2d_solid_body_rotation():
    """2D advection by a rotating velocity field: a Gaussian blob's center
    of mass rotates by ~the analytic angle with near-conserved mass
    (ConvectionOps C/K flux form in 2D; reference velocity generators
    utils.jl:62-130)."""
    from penguin_tpu.solvers import AdvectionDiffusionUnsteadyMono

    n, L = 48, 2.0
    c = L / 2
    mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh)
    C = np.asarray(cap.C_om)
    x, y = C[..., 0], C[..., 1]
    omega = 1.0
    ux = jnp.asarray(-omega * (y - c))
    uy = jnp.asarray(omega * (x - c))
    conv = pt.make_convection_ops(cap, (ux, uy), (0 * ux, 0 * uy))

    r0 = 0.5
    blob = np.exp(-(((x - c - r0) ** 2 + (y - c) ** 2) / 0.02))
    blob[np.asarray(cap.V) == 0] = 0.0
    T0 = jnp.asarray(blob)
    z = jnp.zeros(mesh.np_shape)

    bc0 = pt.Dirichlet(0.0)
    bc_b = pt.BorderConditions({k: bc0 for k in ("left", "right", "top", "bottom")})
    phase = pt.Phase(cap, conv, lambda x, y, z, t: 0.0, 1e-4)
    dt = 2e-3
    t_end = 0.4  # rotate by 0.4 rad
    solver = AdvectionDiffusionUnsteadyMono(phase, bc_b, bc0, dt, (T0, z), "CN")
    solver.solve(t_end, method="bicgstab")

    T = np.asarray(solver.x_omega)
    V = np.asarray(cap.V)
    m0 = float((blob * V).sum())
    m1 = float((T * V).sum())
    assert abs(m1 - m0) / m0 < 0.02, (m0, m1)
    cx = float((T * V * x).sum() / m1) - c
    cy = float((T * V * y).sum() / m1) - c
    ang = np.arctan2(cy, cx)
    n_solves = int(np.ceil(t_end / dt - 1e-12)) + 1
    expected = omega * n_solves * dt
    assert abs(ang - expected) < 0.05, (ang, expected)
    rad = np.hypot(cx, cy)
    assert abs(rad - r0) < 0.05, rad
