"""Unit tests for the elementary stencils: adjointness against dense
matrices and parity with the reference stencil definitions
(src/operators.jl:9-13)."""

import numpy as np
import jax.numpy as jnp
import pytest

from penguin_tpu import operators as op


def dense_dm(n, periodic=False):
    D = np.diag(np.ones(n)) - np.diag(np.ones(n - 1), -1)
    D[n - 1, n - 1] = 0.0
    if periodic:
        D[0, n - 2] = -1.0
        D[n - 1, 0] = 1.0
    return D


def dense_dp(n, periodic=False):
    D = -np.diag(np.ones(n)) + np.diag(np.ones(n - 1), 1)
    D[n - 1, n - 1] = 0.0
    if periodic:
        D[0, n - 2] = -1.0
        D[n - 1, 0] = 1.0
    return D


def dense_sm(n, periodic=False):
    D = 0.5 * (np.diag(np.ones(n)) + np.diag(np.ones(n - 1), -1))
    D[n - 1, n - 1] = 0.0
    if periodic:
        D[0, n - 2] = 0.5
        D[n - 1, 0] = 0.5
    return D


def dense_sp(n, periodic=False):
    D = 0.5 * (np.diag(np.ones(n)) + np.diag(np.ones(n - 1), 1))
    D[n - 1, n - 1] = 0.0
    if periodic:
        D[0, n - 2] = 0.5
        D[n - 1, 0] = 0.5
    return D


PAIRS = [
    (op.dm, op.dm_t, dense_dm),
    (op.dp, op.dp_t, dense_dp),
    (op.sm, op.sm_t, dense_sm),
    (op.sp, op.sp_t, dense_sp),
]


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("fwd,adj,dense", PAIRS, ids=["dm", "dp", "sm", "sp"])
def test_stencils_1d(fwd, adj, dense, periodic):
    n = 9
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    D = dense(n, periodic)
    got = np.asarray(fwd(jnp.asarray(x), 0, periodic))
    np.testing.assert_allclose(got, D @ x, atol=1e-14)
    y = rng.standard_normal(n)
    gotT = np.asarray(adj(jnp.asarray(y), 0, periodic))
    np.testing.assert_allclose(gotT, D.T @ y, atol=1e-14)


@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("fwd,adj,dense", PAIRS, ids=["dm", "dp", "sm", "sp"])
def test_stencils_2d_axes(fwd, adj, dense, axis):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 7))
    D = dense(x.shape[axis])
    ref = np.apply_along_axis(lambda v: D @ v, axis, x)
    got = np.asarray(fwd(jnp.asarray(x), axis))
    np.testing.assert_allclose(got, ref, atol=1e-14)
    refT = np.apply_along_axis(lambda v: D.T @ v, axis, x)
    gotT = np.asarray(adj(jnp.asarray(x), axis))
    np.testing.assert_allclose(gotT, refT, atol=1e-14)


def test_grad_uniform_field_zero_inside():
    """A constant field must have zero discrete gradient in the fluid
    interior (reference property, docs/src/blocks/operators.md)."""
    import penguin_tpu as pt

    mesh = pt.Mesh((24, 24), (4.0, 4.0), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.circle((2.0, 2.0), 1.3), mesh)
    ops = pt.make_diffusion_ops(cap)
    ones = jnp.ones(mesh.np_shape)
    q = ops.grad(ones, ones)
    for d in range(2):
        # on faces with nonzero staggered volume, gradient of constant == 0
        W = np.asarray(cap.W[d])
        qd = np.asarray(q[d])
        assert np.abs(qd[W > 0]).max() < 1e-12


def test_divergence_adjointness():
    """<G x + H xg, q> structure: GT/HT are exact adjoints of G/H."""
    import penguin_tpu as pt

    mesh = pt.Mesh((11, 13), (2.0, 2.0), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.circle((1.0, 1.0), 0.7), mesh)
    ops = pt.make_diffusion_ops(cap)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(mesh.np_shape))
    q = tuple(jnp.asarray(rng.standard_normal(mesh.np_shape)) for _ in range(2))
    lhsG = sum(float(jnp.vdot(g, qq)) for g, qq in zip(ops.G(x), q))
    rhsG = float(jnp.vdot(x, ops.GT(q)))
    assert abs(lhsG - rhsG) < 1e-10
    lhsH = sum(float(jnp.vdot(h, qq)) for h, qq in zip(ops.H(x), q))
    rhsH = float(jnp.vdot(x, ops.HT(q)))
    assert abs(lhsH - rhsH) < 1e-10
