"""Marker-based front tracking in fixed-shape JAX.

TPU-native re-design of ``/root/reference/src/front_tracking.jl`` (2752 LoC
built on LibGEOS polygon clipping): here the interface is a closed polyline
of ``n_markers`` points stored as a (n, 2) array, and every geometric query
is a batched fixed-shape computation:

- ``sdf``: signed distance to the polyline (point-segment distances + ray-
  crossing parity for the sign), vectorized over arbitrary query batches —
  replaces LibGEOS ``LineString`` distance + ``Polygon`` containment
  (front_tracking.jl:325-340).
- normals by averaged segment tangents (front_tracking.jl:347-630).
- shape generators (circle/rectangle/ellipse/crystal,
  front_tracking.jl:91-271).
- polygon area / centroid by the shoelace formula.
- cut-cell capacities and the volume Jacobian come from the *capacity
  quadrature* applied to the SDF with the marker array as a traced
  parameter — the volume Jacobian ∂V_cell/∂(marker normal displacement) is
  exact autodiff through the quadrature (replacing the reference's central
  finite differences of clipped polygon areas, front_tracking.jl:635-802).

All functions treat the marker array as a pytree leaf, so fronts can move
inside jit/scan loops without retracing.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "FrontTracker",
    "markers_circle",
    "markers_rectangle",
    "markers_ellipse",
    "markers_crystal",
    "markers_ngon",
    "polyline_sdf",
    "polyline_normals",
    "polyline_curvature",
    "polygon_area",
    "polygon_centroid",
    "interface_length",
    "smooth_displacements",
    "segment_parameters",
    "segment_cell_intersections",
    "segment_cell_intersection_moments",
    "intercept_jacobian",
    "update_front_with_intercept_displacements",
]


# ---------------------------------------------------------------------------
# shape generators (counterclockwise closed polylines, markers exclude the
# duplicated endpoint; reference front_tracking.jl:91-271)
# ---------------------------------------------------------------------------

def markers_circle(center, radius, n=64):
    th = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    return jnp.asarray(
        np.stack([center[0] + radius * np.cos(th),
                  center[1] + radius * np.sin(th)], axis=-1)
    )


def markers_ellipse(center, rx, ry, n=64):
    th = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    return jnp.asarray(
        np.stack([center[0] + rx * np.cos(th),
                  center[1] + ry * np.sin(th)], axis=-1)
    )


def markers_rectangle(lo, hi, n_per_side=16):
    xs = np.linspace(lo[0], hi[0], n_per_side, endpoint=False)
    ys = np.linspace(lo[1], hi[1], n_per_side, endpoint=False)
    bottom = np.stack([xs, np.full_like(xs, lo[1])], -1)
    right = np.stack([np.full_like(ys, hi[0]), ys], -1)
    top = np.stack([xs[::-1], np.full_like(xs, hi[1])], -1)
    left = np.stack([np.full_like(ys, lo[0]), ys[::-1]], -1)
    return jnp.asarray(np.concatenate([bottom, right, top, left], axis=0))


def markers_ngon(center, radius, n_sides, n=60, phase=0.0):
    """Regular ``n_sides``-gon (circumradius ``radius``), ``n`` markers
    distributed uniformly along the PERIMETER with every vertex hit
    exactly when ``n`` is a multiple of ``n_sides`` — the faceted-seed
    case (reference ``examples/2D/StefanFT/stefan_deca.jl`` family):
    polygon corners give the marker chain curvature spikes that smooth
    shapes never produce."""
    m = int(n_sides)
    per_side = max(int(round(n / m)), 1)
    th = 2 * np.pi * np.arange(m) / m + phase
    verts = np.stack([center[0] + radius * np.cos(th),
                      center[1] + radius * np.sin(th)], axis=-1)
    pts = []
    for k in range(m):
        a, b = verts[k], verts[(k + 1) % m]
        lam = np.arange(per_side) / per_side
        pts.append(a[None, :] * (1 - lam[:, None]) + b[None, :] * lam[:, None])
    return jnp.asarray(np.concatenate(pts, axis=0))


def markers_crystal(center, radius, n=96, n_lobes=6, amplitude=0.2):
    """Perturbed circle r(θ) = R (1 + a cos(kθ)) (front_tracking.jl crystal
    generator)."""
    th = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    r = radius * (1.0 + amplitude * np.cos(n_lobes * th))
    return jnp.asarray(
        np.stack([center[0] + r * np.cos(th), center[1] + r * np.sin(th)], -1)
    )


# ---------------------------------------------------------------------------
# geometric kernels
# ---------------------------------------------------------------------------

def _segments(markers):
    return markers, jnp.roll(markers, -1, axis=0)


def polyline_sdf(markers, x, y, chunk=32):
    """Signed distance from query points to the closed polyline.

    Negative inside (fluid), matching the level-set convention of the
    reference's ``sdf(front, x, y)``.  Distance part is exact; the sign is
    by ray-crossing parity.  Batched over the query shape; O(n_markers) per
    point, fully vectorized.

    The segment loop runs as a ``lax.scan`` over blocks of ``chunk``
    segments carrying a running (min-distance², crossing-count): a single
    materialized ``(points, n_markers)`` pairwise array is HBM-bound (at
    256² quadrature × 256 markers it is several GB of traffic and costs
    ~56 ms/eval on one v5e chip); the blocked reduction keeps the pairwise
    tile in registers/VMEM."""
    x, y = jnp.broadcast_arrays(jnp.asarray(x), jnp.asarray(y))
    a, b = _segments(markers)  # (n,2)
    # promote queries and segments to one dtype up front: a mixed
    # f64-markers/f32-query call otherwise changes the scan carry dtype
    # mid-body and fails to trace
    ct = jnp.result_type(x.dtype, a.dtype)
    x, y, a, b = x.astype(ct), y.astype(ct), a.astype(ct), b.astype(ct)
    qx, qy = x[..., None], y[..., None]  # (...,1)
    n = a.shape[0]
    nb = -(-n // chunk)
    pad = nb * chunk - n
    if pad:
        # degenerate far-away horizontal segments: huge distance, ya == yb
        # so the ray-crossing test is identically false.  The magnitude must
        # keep d2 = dist^2 FINITE in the working dtype: an inf d2 (1e30^2
        # overflows f32) poisons the jacfwd tangents of the min-reduction
        # with NaNs, which silently zeroed every f32 Stefan GN step via the
        # NaN-guard in the LM update.
        far_val = float(np.sqrt(np.finfo(np.dtype(a.dtype)).max)) / 16.0
        far = jnp.full((pad, 2), far_val, a.dtype)
        a = jnp.concatenate([a, far])
        b = jnp.concatenate([b, far])
    a = a.reshape(nb, chunk, 2)
    b = b.reshape(nb, chunk, 2)

    def body(carry, ab_):
        d2min, cross = carry
        ac, bc = ab_
        ax, ay = ac[:, 0], ac[:, 1]
        bx, by = bc[:, 0], bc[:, 1]
        abx, aby = bx - ax, by - ay
        ab2 = abx * abx + aby * aby
        # guard epsilon must keep eps^2 a NORMAL number in the working
        # dtype: the division JVP forms x*dy/(y*y), and (1e-30)^2
        # underflows to 0 in f32, turning every tangent into 0/0 = NaN
        # (this silently froze all f32 Stefan GN steps via the LM
        # NaN-guard).  sqrt(tiny) squares back to ~tiny, which is normal.
        eps_len = float(np.sqrt(np.finfo(np.dtype(ax.dtype)).tiny))
        t = ((qx - ax) * abx + (qy - ay) * aby) / jnp.maximum(ab2, eps_len)
        t = jnp.clip(t, 0.0, 1.0)
        dx = qx - (ax + t * abx)
        dy = qy - (ay + t * aby)
        d2 = dx * dx + dy * dy
        d2min = jnp.minimum(d2min, jnp.min(d2, axis=-1))
        cond = (ay <= qy) != (by <= qy)
        xint = ax + (qy - ay) / jnp.where(
            jnp.abs(by - ay) > 1e-30, by - ay, 1.0
        ) * (bx - ax)
        cross = cross + jnp.sum(cond & (qx < xint), axis=-1,
                                dtype=jnp.int32)
        return (d2min, cross), None

    init = (jnp.full(x.shape, jnp.inf, x.dtype),
            jnp.zeros(x.shape, jnp.int32))
    (d2min, cross), _ = jax.lax.scan(body, init, (a, b))
    pos = d2min > 0.0  # (1e-300 underflows to 0 in f32 anyway)
    dist = jnp.sqrt(jnp.where(pos, d2min, 1.0)) * jnp.where(pos, 1.0, 0.0)
    inside = cross % 2 == 1
    return jnp.where(inside, -dist, dist)


def polyline_normals(markers):
    """Outward unit normals at markers: average of adjacent segment normals
    (reference front_tracking.jl:347-630 averages tangents).  Assumes
    counterclockwise orientation (fluid inside) -> outward normal of segment
    (dx,dy) is (dy,-dx)."""
    prev = markers - jnp.roll(markers, 1, axis=0)
    nxt = jnp.roll(markers, -1, axis=0) - markers
    # dtype-aware tiny: 1e-300 flushes to 0 in f32, turning a degenerate
    # (duplicate-marker) segment into a 0/0 NaN
    tiny = float(np.finfo(np.dtype(markers.dtype)).tiny)
    tang = prev / jnp.maximum(jnp.linalg.norm(prev, axis=-1, keepdims=True), tiny) \
        + nxt / jnp.maximum(jnp.linalg.norm(nxt, axis=-1, keepdims=True), tiny)
    nrm = jnp.stack([tang[:, 1], -tang[:, 0]], axis=-1)
    return nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), tiny)


def polyline_curvature(markers):
    """Signed discrete curvature at each marker (Menger curvature of the
    marker triple; positive = convex for counterclockwise markers — a CCW
    circle of radius R gives +1/R).  Feeds the Gibbs-Thomson curvature
    undercooling (reference computes curvature from the front for
    bc.epsilon_kappa, liquidmotionsolver/stefan.jl Gibbs handling)."""
    prev = jnp.roll(markers, 1, axis=0)
    nxt = jnp.roll(markers, -1, axis=0)
    e1 = markers - prev
    e2 = nxt - markers
    cross = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    l1 = jnp.linalg.norm(e1, axis=-1)
    l2 = jnp.linalg.norm(e2, axis=-1)
    l3 = jnp.linalg.norm(nxt - prev, axis=-1)
    denom = jnp.maximum(l1 * l2 * l3, 1e-300)
    return 2.0 * cross / denom


def polygon_area(markers):
    a, b = _segments(markers)
    return 0.5 * jnp.sum(a[:, 0] * b[:, 1] - b[:, 0] * a[:, 1])


def polygon_centroid(markers):
    a, b = _segments(markers)
    cross = a[:, 0] * b[:, 1] - b[:, 0] * a[:, 1]
    A = 0.5 * jnp.sum(cross)
    cx = jnp.sum((a[:, 0] + b[:, 0]) * cross) / (6.0 * A)
    cy = jnp.sum((a[:, 1] + b[:, 1]) * cross) / (6.0 * A)
    return jnp.stack([cx, cy])


def interface_length(markers):
    a, b = _segments(markers)
    return jnp.sum(jnp.linalg.norm(b - a, axis=-1))


def resample_markers(markers, n_out=None):
    """Redistribute markers equidistantly along the closed polyline
    (arclength parameterization).  Keeps marker spacing uniform as the
    front deforms — the front-tracking stability measure the reference
    applies via its marker update helpers."""
    n = markers.shape[0] if n_out is None else n_out
    a = markers
    b = jnp.roll(markers, -1, axis=0)
    seg = jnp.linalg.norm(b - a, axis=-1)
    cum = jnp.concatenate([jnp.zeros(1, markers.dtype), jnp.cumsum(seg)])
    total = cum[-1]
    targets = jnp.arange(n, dtype=markers.dtype) / n * total
    idx = jnp.clip(jnp.searchsorted(cum, targets, side="right") - 1, 0,
                   markers.shape[0] - 1)
    t = (targets - cum[idx]) / jnp.maximum(seg[idx], 1e-300)
    return a[idx] + t[:, None] * (b[idx] - a[idx])


def smooth_displacements(disp, window=3, passes=1):
    """Circular moving-average smoothing of marker displacements
    (reference smooth_displacements!, stefan.jl:122-178).

    ``window`` must be odd: an even window would circular-pad ``window``
    elements but 'valid' convolution only consumes ``window - 1``, changing
    the array length (an opaque shape error inside the jitted GN loop)."""
    if window % 2 == 0:
        raise ValueError(
            f"smooth_displacements window must be odd, got {window}"
        )
    kernel = jnp.ones(window) / window
    out = disp
    for _ in range(passes):
        padded = jnp.concatenate([out[-(window // 2):], out, out[: window // 2]])
        out = jnp.convolve(padded, kernel, mode="valid")
    return out


def compute_volume_jacobian(mesh, markers, sign=1.0, p=4, s=1):
    """∂(cell fluid volume)/∂(marker normal displacement): the exact
    autodiff equivalent of the reference's central finite differences of
    LibGEOS-clipped polygon areas (compute_volume_jacobian,
    front_tracking.jl:635-802).

    Returns a dense array of shape (nx+1, ny+1, n_markers)."""
    import numpy as np
    from .quadrature import box_integrals

    nx, ny = mesh.n
    lox = jnp.asarray(np.asarray(mesh.nodes[0][:-1])).reshape(nx, 1)
    hix = jnp.asarray(np.asarray(mesh.nodes[0][1:])).reshape(nx, 1)
    loy = jnp.asarray(np.asarray(mesh.nodes[1][:-1])).reshape(1, ny)
    hiy = jnp.asarray(np.asarray(mesh.nodes[1][1:])).reshape(1, ny)
    normals = polyline_normals(markers)

    def volumes(d):
        mk = markers + d[:, None] * normals

        def body(xx, yy):
            return sign * polyline_sdf(mk, xx, yy)

        V, _ = box_integrals(body, [lox, loy], [hix, hiy], p=p, s=s)
        return jnp.pad(
            V, [(0, mesh.np_shape[d] - V.shape[d]) for d in range(2)]
        ).ravel()

    J = jax.jacfwd(volumes)(jnp.zeros(markers.shape[0], markers.dtype))
    return J.reshape(mesh.np_shape[0], mesh.np_shape[1], markers.shape[0])



# ---------------------------------------------------------------------------
# intercept (segment) parameterization — the Hybrid-LS-style interface
# representation (reference front_tracking.jl:2456-2752; demo
# test/fronttrack/intercept.jl)
# ---------------------------------------------------------------------------

def segment_parameters(markers):
    """Per-segment (normals, intercepts, lengths, midpoints) for the closed
    polyline; segment i runs marker i -> i+1 (mod n).  The outward unit
    normal of segment (dx,dy) is (dy,-dx) for counterclockwise markers —
    orientation resolved from the signed polygon area instead of the
    reference's point-in-polygon probe (compute_segment_parameters,
    front_tracking.jl:2456-2531)."""
    a, b = _segments(markers)
    d = b - a
    lengths = jnp.linalg.norm(d, axis=-1)
    safe = jnp.maximum(lengths, 1e-300)
    orient = jnp.sign(polygon_area(markers))
    orient = jnp.where(orient == 0, 1.0, orient)
    normals = orient * jnp.stack([d[:, 1], -d[:, 0]], axis=-1) / safe[:, None]
    normals = jnp.where(lengths[:, None] > 1e-15, normals,
                        jnp.array([0.0, 1.0]))
    intercepts = jnp.sum(normals * a, axis=-1)
    midpoints = 0.5 * (a + b)
    return normals, intercepts, lengths, midpoints


def segment_cell_intersections(mesh, markers):
    """Length of each interface segment clipped to each grid cell, shape
    ``(nx, ny, n_segments)`` — Liang-Barsky parametric clipping instead of
    the reference's LibGEOS LineString/box intersections
    (compute_segment_cell_intersections, front_tracking.jl:2560-2629)."""
    import numpy as _np

    a, b = _segments(markers)
    d = b - a  # (ns, 2)
    seg_len = jnp.linalg.norm(d, axis=-1)

    nx, ny = mesh.n[:2]
    lox = jnp.asarray(_np.asarray(mesh.nodes[0][:-1])).reshape(nx, 1, 1)
    hix = jnp.asarray(_np.asarray(mesh.nodes[0][1:])).reshape(nx, 1, 1)
    loy = jnp.asarray(_np.asarray(mesh.nodes[1][:-1])).reshape(1, ny, 1)
    hiy = jnp.asarray(_np.asarray(mesh.nodes[1][1:])).reshape(1, ny, 1)

    def axis_window(p0, dd, lo, hi):
        # t-interval where p0 + t*dd lies in [lo, hi]
        dd_safe = jnp.where(jnp.abs(dd) > 1e-300, dd, 1.0)
        t0 = (lo - p0) / dd_safe
        t1 = (hi - p0) / dd_safe
        tmin = jnp.minimum(t0, t1)
        tmax = jnp.maximum(t0, t1)
        inside = (p0 >= lo) & (p0 <= hi)
        tmin = jnp.where(jnp.abs(dd) > 1e-300, tmin,
                         jnp.where(inside, -jnp.inf, jnp.inf))
        tmax = jnp.where(jnp.abs(dd) > 1e-300, tmax,
                         jnp.where(inside, jnp.inf, -jnp.inf))
        return tmin, tmax

    txm, txM = axis_window(a[None, None, :, 0], d[None, None, :, 0], lox, hix)
    tym, tyM = axis_window(a[None, None, :, 1], d[None, None, :, 1], loy, hiy)
    t_in = jnp.maximum(jnp.maximum(txm, tym), 0.0)
    t_out = jnp.minimum(jnp.minimum(txM, tyM), 1.0)
    return jnp.maximum(t_out - t_in, 0.0) * seg_len[None, None, :]


def segment_cell_intersection_moments(mesh, markers):
    """Zeroth and first parametric moments of each segment∩cell interval:
    ``L0 = ∫ ds`` (the intersection length) and ``L1 = ∫ t ds`` with t the
    segment parameter (0 at the start marker).  L1 weights a *linear* tilt
    of the segment — the exact sensitivity of swept area to moving one
    endpoint (marker i sweeps L1 on its incoming segment i-1 and L0-L1 on
    its outgoing segment i)."""
    import numpy as _np

    a, b = _segments(markers)
    d = b - a
    seg_len = jnp.linalg.norm(d, axis=-1)

    nx, ny = mesh.n[:2]
    lox = jnp.asarray(_np.asarray(mesh.nodes[0][:-1])).reshape(nx, 1, 1)
    hix = jnp.asarray(_np.asarray(mesh.nodes[0][1:])).reshape(nx, 1, 1)
    loy = jnp.asarray(_np.asarray(mesh.nodes[1][:-1])).reshape(1, ny, 1)
    hiy = jnp.asarray(_np.asarray(mesh.nodes[1][1:])).reshape(1, ny, 1)

    def axis_window(p0, dd, lo, hi):
        dd_safe = jnp.where(jnp.abs(dd) > 1e-300, dd, 1.0)
        t0 = (lo - p0) / dd_safe
        t1 = (hi - p0) / dd_safe
        tmin = jnp.minimum(t0, t1)
        tmax = jnp.maximum(t0, t1)
        inside = (p0 >= lo) & (p0 <= hi)
        tmin = jnp.where(jnp.abs(dd) > 1e-300, tmin,
                         jnp.where(inside, -jnp.inf, jnp.inf))
        tmax = jnp.where(jnp.abs(dd) > 1e-300, tmax,
                         jnp.where(inside, jnp.inf, -jnp.inf))
        return tmin, tmax

    txm, txM = axis_window(a[None, None, :, 0], d[None, None, :, 0], lox, hix)
    tym, tyM = axis_window(a[None, None, :, 1], d[None, None, :, 1], loy, hiy)
    t_in = jnp.clip(jnp.maximum(txm, tym), 0.0, 1.0)
    t_out = jnp.clip(jnp.minimum(txM, tyM), 0.0, 1.0)
    span = jnp.maximum(t_out - t_in, 0.0)
    L0 = span * seg_len[None, None, :]
    L1 = jnp.where(span > 0, 0.5 * (t_out**2 - t_in**2), 0.0) \
        * seg_len[None, None, :]
    return L0, L1


def intercept_jacobian(mesh, markers, density=1.0):
    """∂V_cell/∂δ_I for intercept displacements δ_I along segment normals:
    J[cell, I] = ρ · |segment I ∩ cell| (compute_intercept_jacobian,
    front_tracking.jl:2630-2678).  Returns (J(nx,ny,ns), normals,
    intercepts, lengths)."""
    normals, intercepts, lengths, _ = segment_parameters(markers)
    J = density * segment_cell_intersections(mesh, markers)
    return J, normals, intercepts, lengths


def update_front_with_intercept_displacements(markers, displacements,
                                              normals, lengths):
    """Move each marker by the segment-length-weighted average of its two
    adjacent segments' displacement vectors δ_I n_I
    (update_front_with_intercept_displacements!,
    front_tracking.jl:2697-2752)."""
    w = jnp.maximum(lengths, 1e-10)
    vec = displacements[:, None] * normals  # (ns, 2)
    # marker i joins segment i (as start) and segment i-1 (as end)
    w_prev = jnp.roll(w, 1)
    v_prev = jnp.roll(vec, 1, axis=0)
    avg = (w[:, None] * vec + w_prev[:, None] * v_prev) / (w + w_prev)[:, None]
    return markers + avg

class FrontTracker:
    """Thin stateful wrapper mirroring the reference API
    (``FrontTracker``, front_tracking.jl:5-54); the functional kernels above
    do the work."""

    def __init__(self, markers=None):
        self.markers = None if markers is None else jnp.asarray(markers)

    # reference-style mutating constructors
    def create_circle(self, center, radius, n=64):
        self.markers = markers_circle(center, radius, n)
        return self

    def create_rectangle(self, lo, hi, n_per_side=16):
        self.markers = markers_rectangle(lo, hi, n_per_side)
        return self

    def create_ellipse(self, center, rx, ry, n=64):
        self.markers = markers_ellipse(center, rx, ry, n)
        return self

    def create_crystal(self, center, radius, n=96, n_lobes=6, amplitude=0.2):
        self.markers = markers_crystal(center, radius, n, n_lobes, amplitude)
        return self

    def create_ngon(self, center, radius, n_sides, n=60, phase=0.0):
        self.markers = markers_ngon(center, radius, n_sides, n, phase)
        return self

    def sdf(self, x, y):
        return polyline_sdf(self.markers, x, y)

    def normals(self):
        return polyline_normals(self.markers)

    def area(self):
        return float(polygon_area(self.markers))

    def centroid(self):
        return np.asarray(polygon_centroid(self.markers))

    def length(self):
        return float(interface_length(self.markers))

    def segment_parameters(self):
        return segment_parameters(self.markers)

    def intercept_jacobian(self, mesh, density=1.0):
        return intercept_jacobian(mesh, self.markers, density)

    def apply_intercept_displacements(self, displacements):
        normals, _, lengths, _ = segment_parameters(self.markers)
        self.markers = update_front_with_intercept_displacements(
            self.markers, displacements, normals, lengths)
        return self

    def body(self):
        """SDF callable for the capacity engine."""
        m = self.markers

        def b(x, y):
            return polyline_sdf(m, x, y)

        return b
