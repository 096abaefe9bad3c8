"""Concentration and binary-alloy moving-interface solver tests (static
interface limit: both must reduce to sensible diffusion with fixed
interface values)."""

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.concentration import DiffusionUnsteadyConcentration
from penguin_tpu.solvers.binary import DiffusionUnsteadyBinary


def _setup(nx=48, lx=8.0, xint=4.0):
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    body = lambda x, t: x - xint
    body_c = lambda x, t: -(x - xint)
    return mesh, body, body_c


def test_concentration_static_interface():
    """Static interface, fixed Cm = 0.5: each phase relaxes toward the
    interface value with BCs 0/1; interface rows pin C1γ=C2γ=Cm."""
    mesh, body, body_c = _setup()
    cap = pt.compute_capacity(pt.geometry.halfspace(0, 4.0), mesh)
    ops = pt.make_diffusion_ops(cap)
    ph1 = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)
    ph2 = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)
    bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(0.0), "top": pt.Dirichlet(1.0)})
    Cm = 0.5
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, Cm), pt.FluxJump(1.0, 1.0, 0.0))
    z = jnp.zeros(mesh.np_shape)
    o = jnp.ones(mesh.np_shape)
    u0 = (z, z, o, o)
    dt = 2e-3
    solver = DiffusionUnsteadyConcentration(ph1, ph2, bc_b, ic, dt, u0, mesh)
    solver.solve(body, body_c, 0.0, 0.05, method="direct")
    C1, C1g, C2, C2g = [np.asarray(v) for v in solver.x]
    assert np.isfinite(C1).all() and np.isfinite(C2).all()
    np.testing.assert_allclose(C1g, Cm, atol=1e-10)
    np.testing.assert_allclose(C2g, Cm, atol=1e-10)
    # phase-1 fluid (x<4) lives between border 0 and interface Cm
    n1 = 24
    assert C1[1:n1].min() > -1e-8 and C1[1:n1].max() < Cm + 1e-8
    assert C2[n1 + 1:47].max() < 1.0 + 1e-8 and C2[n1 + 1:47].min() > Cm - 1e-8


def test_binary_static_interface():
    """Static interface binary alloy: liquidus ties T1γ = Tm + m C1γ and
    partition C2γ = k C1γ must hold in the solution."""
    mesh, body, body_c = _setup(nx=40)
    cap = pt.compute_capacity(pt.geometry.halfspace(0, 4.0), mesh)
    ops = pt.make_diffusion_ops(cap)
    mk = lambda: pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)
    bc_T = pt.BorderConditions({"bottom": pt.Dirichlet(-0.5), "top": pt.Dirichlet(0.5)})
    bc_C = pt.BorderConditions({"bottom": pt.Dirichlet(0.2), "top": pt.Dirichlet(0.8)})
    z = jnp.zeros(mesh.np_shape)
    u0 = tuple(z for _ in range(8))
    dt = 2e-3
    Tm, m_liq, k_part = 0.1, -0.5, 0.6
    solver = DiffusionUnsteadyBinary(mk(), mk(), mk(), mk(), bc_T, bc_C,
                                     dt, u0, mesh, "BE", Tm=Tm, m_liq=m_liq,
                                     k_part=k_part)
    solver.solve(body, body_c, 0.0, 0.02, method="direct")
    T1w, T1g, T2w, T2g, C1w, C1g, C2w, C2g = [np.asarray(v) for v in solver.x]
    for a in (T1w, T2w, C1w, C2w):
        assert np.isfinite(a).all()
    # closures hold where the fields are active (cut cells)
    ct = np.asarray(cap.cell_types)
    sel = ct == -1
    np.testing.assert_allclose(T1g[sel], Tm + m_liq * C1g[sel], atol=1e-8)
    np.testing.assert_allclose(T2g[sel], T1g[sel], atol=1e-8)
    np.testing.assert_allclose(C2g[sel], k_part * C1g[sel], atol=1e-8)
