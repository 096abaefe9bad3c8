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
