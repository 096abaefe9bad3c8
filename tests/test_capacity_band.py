"""Narrow-band capacity path vs the dense sweep: every capacity family
must match to near machine precision (far cells are *exactly* full/empty
in both paths — the dense quadrature of a constant-sign segment yields the
exact measure — and band cells run the identical quadrature)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import penguin_tpu as pt
from penguin_tpu.capacity import (
    compute_capacity,
    compute_capacity_spacetime,
    compute_cell_volumes,
    estimate_band_budget,
)


def _assert_caps_equal(cd, cb, tol=1e-10):
    for name in ("V", "Gamma", "C_om", "C_ga"):
        np.testing.assert_allclose(np.asarray(getattr(cd, name)),
                                   np.asarray(getattr(cb, name)),
                                   atol=tol, err_msg=name)
    np.testing.assert_array_equal(np.asarray(cd.cell_types),
                                  np.asarray(cb.cell_types))
    for d in range(cd.ndim):
        for fam in ("A", "B", "W"):
            np.testing.assert_allclose(
                np.asarray(getattr(cd, fam)[d]),
                np.asarray(getattr(cb, fam)[d]), atol=tol,
                err_msg=f"{fam}[{d}]")


def test_band_matches_dense_2d_circle():
    mesh = pt.Mesh((64, 64), (1.0, 1.0))
    body = lambda x, y: jnp.sqrt((x - 0.5) ** 2 + (y - 0.53) ** 2) - 0.27
    cd = compute_capacity(body, mesh, band_budget=None)
    cb = compute_capacity(body, mesh, band_budget=1024)
    _assert_caps_equal(cd, cb)


def test_band_matches_dense_3d_sphere():
    mesh = pt.Mesh((16, 16, 16), (1.0, 1.0, 1.0))
    body = lambda x, y, z: jnp.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2
                                    + (z - 0.5) ** 2) - 0.3
    cd = compute_capacity(body, mesh, p=4, s=1, band_budget=None)
    cb = compute_capacity(body, mesh, p=4, s=1, band_budget=4096)
    _assert_caps_equal(cd, cb)


def test_band_matches_dense_spacetime_markers():
    from penguin_tpu.front_tracking import markers_circle
    from penguin_tpu.solvers.stefan2d import _st_marker_body

    mesh = pt.Mesh((48, 48), (1.0, 1.0))
    mk = markers_circle((0.5, 0.5), 0.3, 48)
    dt = 0.01
    params = (mk, mk * 1.02, dt, 1.0)
    cd = compute_capacity_spacetime(_st_marker_body, mesh, 0.0, dt, p=4, s=1,
                                    params=params)
    cb = compute_capacity_spacetime(_st_marker_body, mesh, 0.0, dt, p=4, s=1,
                                    params=params, band_budget=1024)
    _assert_caps_equal(cd, cb)


def test_band_volume_gradient_matches_dense():
    """Autodiff through the compacted quadrature: d(total volume)/d(radius)
    must agree with the dense path (the Stefan volume-Jacobian path)."""
    mesh = pt.Mesh((64, 64), (1.0, 1.0))

    def vol(c, bb):
        return jnp.sum(compute_cell_volumes(
            lambda x, y, cc: jnp.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - cc,
            mesh, params=c, band_budget=bb))

    gd = jax.grad(lambda c: vol(c, None))(0.3)
    gb = jax.grad(lambda c: vol(c, 1024))(0.3)
    assert np.isclose(float(gd), float(gb), rtol=1e-10)
    # and both are near the analytic circumference (the per-cell quadratic
    # fit's derivative is only ~first-order accurate at 64²)
    assert np.isclose(float(gb), 2 * np.pi * 0.3, rtol=0.15)


def test_band_budget_overflow_degrades_gracefully():
    """With a budget far too small, far-field cells are still exact and
    the result stays finite (overflowed band cells fall back to their
    corner-sign classification)."""
    mesh = pt.Mesh((64, 64), (1.0, 1.0))
    body = lambda x, y: jnp.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.3
    cb = compute_capacity(body, mesh, band_budget=32)
    V = np.asarray(cb.V)
    assert np.isfinite(V).all()
    # total volume off by at most the dropped band cells' worth (~0.07
    # here), not garbage
    assert abs(V.sum() - np.pi * 0.09) < 0.15
    assert V.sum() > 0.1


def test_estimate_band_budget_counts():
    mesh = pt.Mesh((64, 64), (1.0, 1.0))
    body = lambda x, y: jnp.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.3
    n = estimate_band_budget(body, [np.asarray(v) for v in mesh.nodes],
                             mesh.n, jnp.dtype("float64"), 2.0)
    # a 64^2 circle of radius .3: ~120 cut cells, band a few wide
    assert 200 < n < 2000
