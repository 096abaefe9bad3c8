"""Unsteady mono/diphasic diffusion tests mirroring the reference CI gates
(test/convergence_test.jl:72-312): zero-decay exactness, the diphasic
Henry-jump erfc solution, and the CN mesh-convergence order window."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import erfc

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyMono, DiffusionUnsteadyDiph
from penguin_tpu.solvers.diffusion import zero_state_mono


def test_unsteady_mono_1d_zero():
    nx, lx = 40, 4.0
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    body = pt.geometry.interval(2.0, 1.0)
    cap = pt.compute_capacity(body, mesh)
    ops = pt.make_diffusion_ops(cap)
    bc = pt.Dirichlet(0.0)
    bc_b = pt.BorderConditions({"left": bc, "right": bc})
    phase = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)
    dt = 0.25 * (lx / nx) ** 2
    solver = DiffusionUnsteadyMono(phase, bc_b, bc, dt, zero_state_mono(mesh), "BE")
    solver.solve(0.01, method="direct")
    _, _, glob, *_ = pt.check_convergence(lambda x: 0.0 * x, solver, cap, 2, False)
    assert glob < 1e-8


def _diph_problem(nx, scheme, t_end=0.5, He=0.5, D1=1.0, D2=1.0, lx=8.0,
                  xint=4.0):
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    body = pt.geometry.halfspace(0, xint)          # fluid x < xint
    body_c = pt.geometry.halfspace(0, xint, -1.0)  # fluid x > xint
    cap1 = pt.compute_capacity(body, mesh)
    cap2 = pt.compute_capacity(body_c, mesh)
    ops1 = pt.make_diffusion_ops(cap1)
    ops2 = pt.make_diffusion_ops(cap2)
    bc_b = pt.BorderConditions(
        {"top": pt.Dirichlet(1.0), "bottom": pt.Dirichlet(0.0)}
    )
    ic = pt.InterfaceConditions(
        pt.ScalarJump(1.0, He, 0.0), pt.FluxJump(1.0, 1.0, 0.0)
    )
    ph1 = pt.Phase(cap1, ops1, lambda x, y, z, t: 0.0, D1)
    ph2 = pt.Phase(cap2, ops2, lambda x, y, z, t: 0.0, D2)
    z = jnp.zeros(mesh.np_shape)
    o = jnp.ones(mesh.np_shape)
    u0 = (z, z, o, o)
    dt = 0.5 * (lx / nx) ** 2
    solver = DiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, dt, u0, scheme)
    solver.solve(t_end, method="direct")

    def T1(x):
        xs = x - xint
        return -He / (1 + He * np.sqrt(D1 / D2)) * (
            erfc(xs / (2 * np.sqrt(D1 * t_end))) - 2
        )

    def T2(x):
        xs = x - xint
        return -He / (1 + He * np.sqrt(D1 / D2)) * erfc(
            xs / (2 * np.sqrt(D2 * t_end))
        ) + 1

    return solver, cap1, cap2, T1, T2


def test_diphasic_1d_henry():
    solver, cap1, cap2, T1, T2 = _diph_problem(100, "BE")
    (_, _, glob, full, cut, _) = pt.check_convergence_diph(
        T1, T2, solver, cap1, cap2, 2, False
    )
    err1, err2, errc = glob
    assert err1 < 1e-2 and err2 < 1e-2 and errc < 1e-2
    assert full[0] < 1e-2 and full[1] < 1e-2
    assert cut[0] < 5e-2 and cut[1] < 5e-2


def test_diphasic_order_cn():
    errs, hs = [], []
    for nx in (40, 80, 160):
        solver, cap1, cap2, T1, T2 = _diph_problem(nx, "CN")
        (_, _, glob, *_rest) = pt.check_convergence_diph(
            T1, T2, solver, cap1, cap2, 2, False
        )
        errs.append(glob)
        hs.append(8.0 / nx)

    def order(vals, idx):
        e = [v[idx] for v in vals]
        return (np.log(e[-1]) - np.log(e[0])) / (np.log(hs[-1]) - np.log(hs[0]))

    o1, o2, oc = order(errs, 0), order(errs, 1), order(errs, 2)
    assert 0.9 < o1 < 2.2
    assert 0.9 < o2 < 2.2
    assert 0.9 < oc < 2.2


def test_inhomogeneous_border_krylov_matches_direct():
    """bicgstab/cg on the unsteady mono system with a NON-zero border
    Dirichlet: jax.scipy's unpreconditioned bicgstab NaN'd on rho-breakdown
    here (the homogeneous cases never stressed it because b=0); the
    in-house preconditioned pytree Krylov must match the dense solve."""
    mesh = pt.Mesh((16, 16), (1.0, 1.0), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh)
    ops = pt.make_diffusion_ops(cap)
    phase = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 0.5)
    bc_b = pt.BorderConditions({
        "left": pt.Dirichlet(1.0), "right": pt.Dirichlet(0.0),
        "bottom": pt.Dirichlet(0.0), "top": pt.Dirichlet(0.0)})
    z = jnp.zeros(mesh.np_shape)

    def run(method):
        s = DiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(0.0), 2e-3,
                                  (z, z), "BE")
        s.solve(0.02, method=method, tol=1e-12)
        return np.asarray(s.x_omega)

    p_direct = run("direct")
    p_bicg = run("bicgstab")
    assert np.isfinite(p_bicg).all()
    np.testing.assert_allclose(p_bicg, p_direct, atol=1e-8)
