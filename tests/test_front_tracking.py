"""Front-tracking geometry kernels (mirrors test/front_tracking_test.jl:
markers / SDF / normals / area) plus capacity-from-front cross-validation
against the level-set path (ft_capacity_test.jl pattern)."""

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.front_tracking import (
    FrontTracker,
    interface_length,
    markers_circle,
    polygon_area,
    polygon_centroid,
    polyline_normals,
    polyline_sdf,
)


def test_circle_markers_geometry():
    m = markers_circle((1.0, 2.0), 0.5, n=256)
    assert abs(float(polygon_area(m)) - np.pi * 0.25) < 1e-3
    c = np.asarray(polygon_centroid(m))
    np.testing.assert_allclose(c, [1.0, 2.0], atol=1e-12)
    assert abs(float(interface_length(m)) - np.pi) < 1e-3


def test_sdf_circle():
    m = markers_circle((0.0, 0.0), 1.0, n=512)
    xs = np.array([0.0, 0.5, 0.99, 1.01, 2.0, -1.5])
    ys = np.zeros_like(xs)
    d = np.asarray(polyline_sdf(m, xs, ys))
    exact = np.abs(np.sqrt(xs**2 + ys**2)) - 1.0
    np.testing.assert_allclose(d, exact, atol=2e-4)


def test_normals_outward():
    m = markers_circle((0.0, 0.0), 1.0, n=128)
    n = np.asarray(polyline_normals(m))
    mm = np.asarray(m)
    radial = mm / np.linalg.norm(mm, axis=-1, keepdims=True)
    assert np.abs(n - radial).max() < 1e-3


def test_capacity_from_front_matches_levelset():
    """Capacities from the marker SDF vs the analytic circle SDF
    (the reference cross-validates front-tracking capacities against VOFI,
    test/fronttrack/ft_capacity_test.jl)."""
    mesh = pt.Mesh((24, 24), (4.0, 4.0), (0.0, 0.0))
    ft = FrontTracker().create_circle((2.0, 2.0), 1.0, n=256)
    cap_ft = pt.compute_capacity(ft.body(), mesh)
    cap_ls = pt.compute_capacity(pt.geometry.circle((2.0, 2.0), 1.0), mesh)
    V1, V2 = np.asarray(cap_ft.V), np.asarray(cap_ls.V)
    assert abs(V1.sum() - V2.sum()) / V2.sum() < 5e-3
    assert np.abs(V1 - V2).max() < 0.05 * V2.max()
    G1, G2 = np.asarray(cap_ft.Gamma), np.asarray(cap_ls.Gamma)
    assert abs(G1.sum() - G2.sum()) / G2.sum() < 2e-2


def test_sdf_traced_markers_jit():
    """Markers as traced params through the capacity quadrature (the basis
    of the Stefan front motion inside jit)."""
    import jax

    mesh = pt.Mesh((16, 16), (4.0, 4.0), (0.0, 0.0))

    def area_of(markers):
        from penguin_tpu.capacity import compute_capacity_spacetime

        # static-in-time marker body through the space-time path
        body = lambda x, y, t, mk: polyline_sdf(mk, x, y)
        cap = compute_capacity_spacetime(body, mesh, 0.0, 1.0, p=4, s=1,
                                         params=markers)
        return jnp.sum(cap.V)

    m = markers_circle((2.0, 2.0), 1.0, n=64)
    a = jax.jit(area_of)(m)
    assert abs(float(a) - np.pi) < 2e-2
    # gradient of area wrt marker positions exists and is finite
    g = jax.grad(area_of)(m)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_segment_parameters_circle():
    """Segment normals point outward, intercepts are n.p1, lengths sum to
    the perimeter (compute_segment_parameters, front_tracking.jl:2456-2531)."""
    from penguin_tpu.front_tracking import markers_circle, segment_parameters

    c = (2.0, 3.0)
    mk = markers_circle(c, 1.0, n=64)
    normals, intercepts, lengths, mids = segment_parameters(mk)
    out = np.asarray(mids) - np.asarray(c)
    dots = (np.asarray(normals) * out / np.linalg.norm(out, axis=1, keepdims=True)).sum(1)
    assert dots.min() > 0.99
    assert abs(float(lengths.sum()) - 2 * np.pi) < 0.02
    a = np.asarray(mk)
    assert np.allclose(np.asarray(intercepts),
                       (np.asarray(normals) * a).sum(1))


def test_segment_cell_intersections_cover_segments():
    """Every segment's clipped lengths over all cells sum to its length
    (front fully inside the domain)."""
    from penguin_tpu.front_tracking import (markers_circle,
                                            segment_cell_intersections)

    mesh = pt.Mesh((16, 16), (4.0, 4.0), (0.0, 0.0))
    mk = markers_circle((2.0, 2.0), 1.2, n=48)
    L = segment_cell_intersections(mesh, mk)
    seg_len = np.linalg.norm(np.asarray(jnp.roll(mk, -1, axis=0) - mk), axis=1)
    assert np.allclose(np.asarray(L).sum(axis=(0, 1)), seg_len, atol=1e-12)


def test_intercept_jacobian_predicts_volume_change():
    """J[cell,I] * delta predicts the cut-cell volume change for a small
    uniform outward intercept displacement (compute_intercept_jacobian,
    front_tracking.jl:2630-2678)."""
    from penguin_tpu.front_tracking import (
        intercept_jacobian, markers_circle,
        update_front_with_intercept_displacements, polygon_area)

    mesh = pt.Mesh((24, 24), (4.0, 4.0), (0.0, 0.0))
    mk = markers_circle((2.0, 2.0), 1.0, n=96)
    J, normals, intercepts, lengths = intercept_jacobian(mesh, mk)
    delta = 1e-4
    disp = jnp.full(lengths.shape, delta)
    # total predicted area change = delta * total interface length
    dA_pred = float(J.sum()) * delta
    mk2 = update_front_with_intercept_displacements(mk, disp, normals, lengths)
    dA = float(polygon_area(mk2) - polygon_area(mk))
    assert abs(dA - dA_pred) / abs(dA) < 5e-3, (dA, dA_pred)


def test_apply_intercept_displacements_grows_circle():
    from penguin_tpu.front_tracking import FrontTracker

    ft = FrontTracker().create_circle((0.0, 0.0), 1.0, n=64)
    ft.apply_intercept_displacements(jnp.full((64,), 0.05))
    r = np.linalg.norm(np.asarray(ft.markers), axis=1)
    assert abs(r.mean() - 1.05) < 2e-3
    assert r.std() < 1e-3


def test_markers_ngon_geometry():
    """Regular n-gon generator: vertices on the circumcircle, markers on
    the perimeter, counterclockwise orientation, correct enclosed area."""
    from penguin_tpu.front_tracking import markers_ngon, polygon_area

    mk = np.asarray(markers_ngon((1.0, -0.5), 2.0, n_sides=10, n=60))
    assert mk.shape == (60, 2)
    r = np.sqrt((mk[:, 0] - 1.0) ** 2 + (mk[:, 1] + 0.5) ** 2)
    # every 6th marker is a vertex (60/10 per side) at the circumradius
    assert np.allclose(r[::6], 2.0, atol=1e-12)
    # all markers within [inradius, circumradius]
    assert (r <= 2.0 + 1e-12).all()
    assert (r >= 2.0 * np.cos(np.pi / 10) - 1e-12).all()
    area = float(polygon_area(jnp.asarray(mk)))
    exact = 0.5 * 10 * 2.0 ** 2 * np.sin(2 * np.pi / 10)
    assert abs(area - exact) < 1e-10 * exact
