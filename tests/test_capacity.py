"""Capacity engine tests: exact geometry identities + cross-validation of
the JAX quadratic-GL backend against the independent numpy subdivision
backend (mirrors the reference's VOFI-vs-ImplicitIntegration test,
test/capacity_test.jl:6-60, with its tolerances)."""

import numpy as np
import jax.numpy as jnp
import pytest

import penguin_tpu as pt
from penguin_tpu.capacity_ref import compute_capacity_ref


@pytest.fixture(scope="module")
def circle_setup():
    mesh = pt.Mesh((20, 20), (4.0, 4.0), (0.0, 0.0))
    body = pt.geometry.circle((2.0, 2.0), 1.0)
    cap = pt.compute_capacity(body, mesh)
    ref = compute_capacity_ref(body, mesh, sub=64)
    return mesh, cap, ref


def test_total_volume_and_interface(circle_setup):
    _, cap, _ = circle_setup
    assert np.isclose(np.asarray(cap.V).sum(), np.pi, rtol=5e-3)
    assert np.isclose(np.asarray(cap.Gamma).sum(), 2 * np.pi, rtol=1e-2)


def test_cross_validate_backends(circle_setup):
    _, cap, ref = circle_setup
    # volumes within 5% (reference tolerance), matrices within 10%
    V, Vr = np.asarray(cap.V), ref["V"]
    assert np.isclose(V.sum(), Vr.sum(), rtol=5e-2)
    assert np.abs(V - Vr).max() < 0.10 * Vr.max()
    assert np.isclose(np.asarray(cap.Gamma).sum(), ref["Gamma"].sum(), rtol=0.10)
    for d in range(2):
        A, Ar = np.asarray(cap.A[d]), ref["A"][d]
        assert np.abs(A - Ar).max() < 0.10 * max(Ar.max(), 1e-12)
        B, Br = np.asarray(cap.B[d]), ref["B"][d]
        assert np.abs(B - Br).max() < 0.10 * max(Br.max(), 1e-12)
        W, Wr = np.asarray(cap.W[d]), ref["W"][d]
        assert np.abs(W - Wr).max() < 0.10 * max(Wr.max(), 1e-12)
    assert (np.asarray(cap.cell_types) == ref["cell_types"]).mean() > 0.99


def test_full_domain_capacities():
    """Full-fluid body: V = h^N on all real cells, A = 1-fractions of faces,
    H must vanish identically."""
    mesh = pt.Mesh((8, 6), (2.0, 1.5), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh)
    hx, hy = mesh.h
    V = np.asarray(cap.V)
    assert np.allclose(V[:8, :6], hx * hy)
    assert np.allclose(V[8, :], 0) and np.allclose(V[:, 6], 0)
    # faces fully wetted, including the top face of the last cell
    Ax = np.asarray(cap.A[0])
    assert np.allclose(Ax[:, :6], hy)
    ops = pt.make_diffusion_ops(cap)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(mesh.np_shape))
    for h in ops.H(x):
        assert np.abs(np.asarray(h)).max() < 1e-12


def test_1d_capacities_halfspace():
    """Fluid x < 2.03 on [0,4] with 8 cells: volumes exact, interface cell
    correct, staggered volumes match centroid distances."""
    mesh = pt.Mesh((8,), (4.0,), (0.0,))
    xint = 2.03
    cap = pt.compute_capacity(pt.geometry.halfspace(0, xint), mesh)
    V = np.asarray(cap.V)
    nodes = np.asarray(mesh.nodes[0])
    exact = np.clip(xint - nodes[:-1], 0, nodes[1] - nodes[0])
    np.testing.assert_allclose(V[:-1], exact, atol=1e-12)
    ct = np.asarray(cap.cell_types)
    cut = np.where(ct == -1)[0]
    assert len(cut) == 1 and nodes[cut[0]] < xint < nodes[cut[0] + 1]


def test_spacetime_capacity_static_body():
    """Space-time capacities of a static 1D body: the time-face capacity
    A[t] equals the spatial volume at each time slab end."""
    m1 = pt.Mesh((16,), (4.0,), (0.0,))
    st = pt.SpaceTimeMesh(m1, [0.0, 0.1])
    body1d = pt.geometry.interval(2.0, 1.0)
    st_body = lambda x, t: body1d(x)
    cap_st = pt.compute_capacity(st_body, st)
    cap_sp = pt.compute_capacity(body1d, m1)
    At = np.asarray(cap_st.A[1])  # time-direction face capacity
    Vsp = np.asarray(cap_sp.V)
    np.testing.assert_allclose(At[:, 0], Vsp, atol=1e-10)
    np.testing.assert_allclose(At[:, 1], Vsp, atol=1e-10)
    # space-time volume = dt * spatial volume for a static body
    np.testing.assert_allclose(np.asarray(cap_st.V).sum(), 0.1 * Vsp.sum(), rtol=1e-10)


def test_vmap_capacity_batch_matches_loop():
    """SURVEY §4 JAX-specific gate: vmapping the capacity quadrature over a
    batch of geometry parameters (the data-parallel sweep pattern) equals
    the per-geometry loop exactly."""
    import jax

    mesh = pt.Mesh((16, 16), (4.0, 4.0), (0.0, 0.0))
    radii = jnp.asarray([0.7, 1.0, 1.3])

    def body(x, y, params):
        r = params
        return jnp.sqrt((x - 2.0) ** 2 + (y - 2.0) ** 2) - r

    def volumes(r):
        cap = pt.compute_capacity(body, mesh, p=4, s=1, params=r)
        return cap.V

    batched = jax.vmap(volumes)(radii)
    for i, r in enumerate(np.asarray(radii)):
        single = volumes(jnp.asarray(r))
        assert np.array_equal(np.asarray(batched[i]), np.asarray(single))
