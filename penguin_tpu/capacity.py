"""Cut-cell capacity construction (geometric moments) in JAX.

TPU-native re-implementation of the reference capacity layer
(``/root/reference/src/capacity.jl``): for a signed-distance ``body`` and a
Cartesian mesh it produces the diagonal "capacities" that parameterize every
discrete operator:

- ``V``    : wetted volume per cell                       (0-moment)
- ``A[d]`` : wetted area of the lower face of each cell along axis ``d``
             (faces ``k=0..n_d``, face ``k`` at ``nodes[d][k]``)
- ``B[d]`` : wetted measure of the plane through the cell centroid with
             coordinate ``d`` fixed
- ``W[d]`` : staggered volumes between adjacent cell centroids
- ``C_om`` : cell centroids, ``C_ga``: interface centroids
- ``Gamma``: interface measure per cell
- ``cell_types``: 1 full / -1 cut / 0 empty

All arrays live on the padded DOF grid of shape ``(n_1+1, ..., n_N+1)``
(see ``mesh.py``); the extra slot per axis carries zeros.  Everything is
computed by batched fixed-shape quadrature (``quadrature.py``) and is fully
jittable, including on space-time meshes used by the moving-interface
solvers.

Differences from the reference backends (both within the cross-validation
tolerances the reference itself uses in ``test/capacity_test.jl:6-60``):

- ``Gamma`` uses the exact divergence identity ``∫_Γ n_d dS = A_d[i] -
  A_d[i+1]`` and equals ``|∫_Γ n dS|`` (exact for a flat interface cut,
  O(h^3) per cell otherwise).
- ``C_ga`` is the closest-point projection of the cell center onto the zero
  level set (O(h^2), smooth, cheap) instead of a surface-integral centroid.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .quadrature import box_integrals

__all__ = ["Capacity", "compute_capacity", "compute_capacity_spacetime",
           "compute_cell_volumes", "estimate_band_budget",
           "gamma_half_moments"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "B", "V", "W", "C_om", "C_ga", "Gamma", "cell_types",
                 "Am", "Bm", "Vh"],
    meta_fields=["mesh", "body"],
)
@dataclasses.dataclass
class Capacity:
    A: tuple
    B: tuple
    V: jnp.ndarray
    W: tuple
    C_om: jnp.ndarray  # shape np_shape + (N,)
    C_ga: jnp.ndarray  # shape np_shape + (N,)
    Gamma: jnp.ndarray
    cell_types: jnp.ndarray  # int8: 0 empty, 1 full, -1 cut
    mesh: object = dataclasses.field(default=None)
    body: object = dataclasses.field(default=None, compare=False)
    # --- cut first moments (``cut_moments=True`` static builds only) ------
    # Am[d]: wet centroid of face d (np_shape + (N,); d-component = node
    #        coordinate); Bm[d]: wet centroid of the centroid-line plane
    #        (np_shape + (N,); d-component = C_om_d); Vh[d]: wetted volume
    #        of the lower half-cell along d (from the lower face to the
    #        centroid plane); the upper half is V - Vh[d].
    # These feed the moment-consistent cut-flux corrections (wet-line
    # sampling of B·u and the per-half-strip Γ placement of uγ) that fix
    # the O(h) immersed-wall placement of the staggered Stokes rows.
    Am: tuple = None
    Bm: tuple = None
    Vh: tuple = None

    @property
    def ndim(self):
        return len(self.A)

    @property
    def np_shape(self):
        return self.V.shape


def _cell_bounds_from_nodes(nodes_list, n, dtype):
    """Per-dim broadcastable lower/upper cell bounds over the cell grid.
    ``nodes_list`` entries may be traced jnp arrays (e.g. a moving time
    slab), enabling per-step geometry rebuilds inside jit/scan."""
    N = len(nodes_list)
    lo, hi = [], []
    for d in range(N):
        shp = [1] * N
        shp[d] = n[d]
        nodes = jnp.asarray(nodes_list[d], dtype=dtype)
        lo.append(nodes[:-1].reshape(shp))
        hi.append(nodes[1:].reshape(shp))
    return lo, hi


def _cell_bounds(mesh, dtype):
    return _cell_bounds_from_nodes(
        [np.asarray(v) for v in mesh.nodes], mesh.n, dtype
    )


def _pad_cells(arr, np_shape):
    """Embed a cell-grid array into the padded DOF grid (zeros elsewhere)."""
    pad = [(0, np_shape[d] - arr.shape[d]) for d in range(len(np_shape))]
    return jnp.pad(arr, pad)


def _insert(coords, d, value):
    coords = list(coords)
    coords.insert(d, value)
    return coords


# Relative volume below which a face adjoining the cell starts to close
# (smoothstep ramp).  Must be small: the gate only exists to zero faces
# against (near-)empty cells, not to re-weight resolved ones.
_FACE_GATE_REL = 1e-3


def _face_open_fraction(V_cells, full_vol, d, n, dtype):
    """Per-face openness in [0, 1] along axis d (n[d]+1 slots): exactly 0
    where an adjacent cell has zero fluid volume, smoothly ramping to 1 as
    that volume reaches ``_FACE_GATE_REL`` of the full cell.  Faces at the
    domain border (slots 0 and n[d]) stay fully open — the border rows own
    those, not the interface closure.

    A HARD both-cells-active mask here is correct for static geometry but
    destabilizes the moving-front Gauss-Newton solvers: as markers move, a
    sliver cell crossing the empty threshold flips whole faces discretely,
    the autodiff volume Jacobian cannot see the flip, and the diphasic
    Frank-disk front develops 8% lobes (round-3 regression).  The smooth
    gate keeps dA/d(markers) continuous while preserving the exact-zero
    aperture against V=0 cells that constant-state consistency needs
    (volumes at/below the quadrature floor are snapped to exactly 0)."""
    N = len(n)
    t = jnp.clip(V_cells.astype(dtype)
                 / (_FACE_GATE_REL * jnp.broadcast_to(full_vol, n)),
                 0.0, 1.0)
    g = t * t * (3.0 - 2.0 * t)  # smoothstep
    one_plane_shape = tuple(1 if i == d else n[i] for i in range(N))
    ones_plane = jnp.ones(one_plane_shape, dtype)
    # border faces (slots 0 and n[d]) carry ones on BOTH sides so they stay
    # fully open per the invariant above: a grazing body can leave a wet
    # border face on a sliver cell, and gating it would silently cut the
    # prescribed border flux (Neumann mass-conservation identity)
    drop_last = tuple(slice(0, -1) if i == d else slice(None)
                      for i in range(N))
    drop_first = tuple(slice(1, None) if i == d else slice(None)
                       for i in range(N))
    lo_g = jnp.concatenate([ones_plane, g[drop_last], ones_plane],
                           axis=d)                        # cell k-1 at face k
    hi_g = jnp.concatenate([ones_plane, g[drop_first], ones_plane],
                           axis=d)                        # cell k at face k
    return lo_g * hi_g


# Narrow-band defaults: cell count above which the static path auto-sizes a
# band budget, and the Lipschitz safety factor on the SDF margin test.
_BAND_AUTO_MIN_CELLS = 16384
_BAND_DEFAULT_SAFETY = 2.0

# aperture-divergence carrier threshold (relative to the full face
# measure): cells whose |A_lo - A_hi| exceeds this are interface carriers
# regardless of their volume classification
_CARRIER_REL_TOL = 1e-10


def _is_traced(x):
    return any(isinstance(l, jax.core.Tracer)
               for l in jax.tree_util.tree_leaves(x))


def _gamma_from_apertures(A, is_empty, is_cut, full_vol, lo, hi, n, dtype):
    """Interface measure from the aperture-divergence identity, shared by
    the dense and narrow-band capacity paths.

    A cell CARRIES interface closure wherever its aperture divergence is
    nonzero — not only where the volume classification says 'cut'.  At a
    grazing face the volume quadrature can see a cell as exactly full
    while the (finer, lower-dimensional) face quadrature resolves a
    partial aperture; without a Gamma row there, the H coupling pulls
    the cell toward the masked-to-zero gamma DOF of its neighbor and the
    DISCRETE system loses constant-state exactness (measured: u == 1
    off by up to 16% on grazing disks, with errors GROWING under
    refinement).  Promoting aperture-divergence carriers to cut cells
    restores the G·1 + H·1 = 0 identity exactly.

    Returns ``(is_cut, cell_types, Gamma_cells)``."""
    N = len(n)
    S2 = jnp.zeros(n, dtype)
    for d in range(N):
        sl0 = [slice(0, n[i]) for i in range(N)]
        sl1 = [slice(0, n[i]) for i in range(N)]
        sl1[d] = slice(1, n[d] + 1)
        Sd = A[d][tuple(sl0)] - A[d][tuple(sl1)]
        S2 = S2 + Sd * Sd
    face_meas = jnp.zeros(n, dtype)
    for d in range(N):
        face_meas = jnp.maximum(
            face_meas, jnp.broadcast_to(full_vol / (hi[d] - lo[d]), n))
    carrier = (~is_empty) & (S2 > (_CARRIER_REL_TOL * face_meas) ** 2)
    is_cut = is_cut | carrier
    cell_types = jnp.where(is_empty, 0,
                           jnp.where(is_cut, -1, 1)).astype(jnp.int8)
    Gamma_cells = jnp.where(
        is_cut, jnp.sqrt(jnp.where(is_cut, S2, 1.0)), 0.0)
    return is_cut, cell_types, Gamma_cells


def _round_budget(count, ncells):
    """Round a band-cell count up to the next power of two (>=1024) to bound
    the number of distinct compilations across geometry sweeps."""
    b = 1024
    while b < count:
        b *= 2
    return min(b, ncells)


def compute_capacity(body, mesh, p: int = 8, s: int = 2, dtype=None,
                     compute_centroids: bool = True,
                     params=None, band_budget=None,
                     band_safety: float = _BAND_DEFAULT_SAFETY,
                     cut_moments="auto") -> Capacity:
    """Compute all cut-cell capacities for ``body`` on ``mesh``.

    ``body`` must accept ``mesh.ndim`` coordinate arrays (broadcasting) and
    return the signed distance (negative = fluid) — or, when ``params`` is
    given, ``body(*coords, params)`` with ``params`` a traced pytree
    (geometry sweeps can then vmap/scan over parameters without retracing,
    like the space-time variant).  The whole pipeline runs as a single
    jitted XLA program (compiles once per (body, mesh) shape,
    persistent-cached across processes).

    ``band_budget`` enables the narrow-band path (the TPU answer to the
    reference's full-grid VOFI sweep, src/capacity.jl:81-123): cells whose
    corner SDF values exceed ``band_safety``×(half cell diagonal) in
    magnitude are classified exactly full/empty from one nodal SDF pass and
    quadrature runs only on the remaining band, compacted to a static-size
    buffer.  ``"auto"`` sizes the budget eagerly for static geometry (and
    falls back to the dense path on small grids or traced params); ``None``
    (the default) keeps the dense path; an int is used as-is.  Requires
    ``body`` to be an actual signed distance (|∇φ| <= 1, up to
    ``band_safety``).

    When to use which (measured, one v5e chip): for *analytic* SDFs XLA
    fuses the dense sweep to HBM speed (1024² circle: 0.3 ms warm) and the
    band's compaction overhead only slows it down — keep ``None``.  For
    *expensive* SDFs (marker polylines: O(n_markers) per sample) the band
    skips ~97% of the samples and wins large (512² space-time slab with
    512 markers: 350 ms → 46 ms); the front-tracking/moving solvers enable
    it automatically.
    """
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # respects jax_enable_x64
    dname = jnp.dtype(dtype).name
    if cut_moments == "auto":
        # default-on for static N>=2 geometry: the moment-consistent cut
        # flux (StokesMono cut_flux="moment") needs Am/Bm/Vh, and building
        # them rides the same fused quadrature sweep.  Traced-params builds
        # keep them off (the moving solvers rebuild capacities per step and
        # use the space-time engine, which carries its own moment path).
        cut_moments = mesh.ndim >= 2 and not _is_traced(params)
    if band_budget == "auto":
        if (mesh.ndim >= 2 and mesh.ncells() >= _BAND_AUTO_MIN_CELLS
                and not _is_traced(params)):
            wrapped = body if params is None else (
                lambda *cs: body(*cs, params))
            count = estimate_band_budget(
                wrapped, [np.asarray(v) for v in mesh.nodes], mesh.n,
                jnp.dtype(dtype), band_safety, spacetime=False)
            band_budget = _round_budget(count, mesh.ncells())
        else:
            band_budget = None
    return _compute_capacity_jit(body, mesh, p, s, dname,
                                 compute_centroids, band_budget,
                                 float(band_safety), bool(cut_moments),
                                 params)


def compute_capacity_spacetime(body, space_mesh, t0, t1, p: int = 8,
                               s: int = 2, dtype=None,
                               compute_centroids: bool = True,
                               params=None, band_budget=None,
                               band_safety: float = _BAND_DEFAULT_SAFETY,
                               cut_moments: bool = False) -> Capacity:
    """Space-time capacities on the slab [t0, t1] with *traced* time bounds:
    the geometry rebuild that the reference performs per step on the host
    (src/prescribedmotionsolver/diffusion.jl:248-256) runs here as part of
    the jitted time step — t0/t1 may be scan-carried scalars.

    ``body`` takes (x..., t) — or (x..., t, params) when ``params`` is given;
    ``params`` may be a traced pytree (e.g. the Newton iterate of a Stefan
    front position), so the interface can move inside jit without retracing.

    ``band_budget``: int enables the narrow-band path (see
    ``compute_capacity``); inside scan/while loops the band membership is
    traced but the budget must be static — size it from the initial
    geometry with headroom (``estimate_band_budget`` × a growth factor).
    If the band outgrows the budget, overflow cells fall back to their
    corner-sign full/empty classification.  The margin test adds the
    per-column temporal SDF variation |φ(t1)−φ(t0)|, covering bodies whose
    motion within the slab is monotone-ish (CFL-limited fronts).
    """
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    dtype = jnp.dtype(dtype)
    t01 = jnp.stack([jnp.asarray(t0, dtype), jnp.asarray(t1, dtype)])
    if band_budget == "auto":
        if (space_mesh.ndim >= 2
                and space_mesh.ncells() >= _BAND_AUTO_MIN_CELLS
                and not _is_traced(params) and not _is_traced(t01)):
            wrapped = body if params is None else (
                lambda *cs: body(*cs, params))
            count = estimate_band_budget(
                wrapped,
                [np.asarray(v) for v in space_mesh.nodes] + [np.asarray(t01)],
                space_mesh.n + (1,), dtype, band_safety, spacetime=True)
            band_budget = _round_budget(count, space_mesh.ncells())
        else:
            band_budget = None
    return _compute_capacity_st_jit(body, space_mesh, p, s, dtype.name,
                                    compute_centroids, band_budget,
                                    float(band_safety), bool(cut_moments),
                                    t01, params)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8))
def _compute_capacity_st_jit(body, space_mesh, p, s, dtype_name,
                             compute_centroids, band_budget, band_safety,
                             cut_moments, t01, params):
    dtype = jnp.dtype(dtype_name)
    nodes = [np.asarray(v, dtype) for v in space_mesh.nodes] + [t01]
    n = space_mesh.n + (1,)
    if params is not None:
        wrapped = lambda *cs: body(*cs, params)
    else:
        wrapped = body
    return _capacity_impl(wrapped, nodes, n, dtype, p, s, compute_centroids,
                          mesh_ref=None, spacetime=True,
                          np_shape=space_mesh.np_shape + (2,),
                          band_budget=band_budget, band_safety=band_safety,
                          cut_moments=cut_moments)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8))
def _compute_capacity_jit(body, mesh, p, s, dtype_name, compute_centroids,
                          band_budget, band_safety, cut_moments, params=None):
    dtype = jnp.dtype(dtype_name)
    nodes = [np.asarray(v, dtype) for v in mesh.nodes]
    if params is not None:
        wrapped = lambda *cs: body(*cs, params)
    else:
        wrapped = body
    return _capacity_impl(wrapped, nodes, mesh.n, dtype, p, s,
                          compute_centroids, mesh_ref=mesh,
                          np_shape=mesh.np_shape,
                          band_budget=band_budget, band_safety=band_safety,
                          cut_moments=cut_moments)


# ---------------------------------------------------------------------------
# narrow-band machinery
# ---------------------------------------------------------------------------

def _axis_slice(arr, d, sl):
    idx = [slice(None)] * arr.ndim
    idx[d] = sl
    return arr[tuple(idx)]


def _pairwise_reduce(arr, axes, op):
    """Reduce adjacent pairs along each listed axis (node grid -> cell grid:
    per-cell corner min/max without materializing 2^N corner gathers)."""
    for d in axes:
        arr = op(_axis_slice(arr, d, slice(0, -1)),
                 _axis_slice(arr, d, slice(1, None)))
    return arr


def _band_masks(phi_nodes, n, lo, hi, spacetime, safety):
    """Classify cells and faces from one nodal SDF pass.

    A box is *far* when every corner SDF value clears a margin of
    ``safety`` × (half the box's spatial diagonal) — by the SDF Lipschitz
    bound |∇φ| <= 1 the interface then cannot enter the box.  For
    space-time slabs, φ is sampled at both time levels and the per-column
    temporal variation |φ(t1)−φ(t0)| is added to the margin (exact for
    bodies linear in t, e.g. interpolated marker fronts).

    Returns (cell_band, cell_far_full, [(face_band, face_far_full)]_d).
    """
    N = len(n)
    time_axis = N - 1 if spacetime else None
    h2 = [(hi[d] - lo[d]) ** 2 for d in range(N)]
    if spacetime:
        dphi = jnp.abs(_axis_slice(phi_nodes, time_axis, slice(1, None))
                       - _axis_slice(phi_nodes, time_axis, slice(0, -1)))
        dphi = jnp.squeeze(dphi, time_axis) if dphi.shape[time_axis] == 1 \
            else jnp.max(dphi, axis=time_axis)

    def margins(varying):
        m2 = 0.0
        for d in varying:
            if d != time_axis:
                m2 = m2 + h2[d]
        m = 0.5 * safety * jnp.sqrt(m2)
        if spacetime and time_axis in varying:
            dp = _pairwise_reduce(
                dphi, [d for d in varying if d != time_axis], jnp.maximum)
            m = m + 0.5 * safety * dp[..., None]
        return m

    cmin = _pairwise_reduce(phi_nodes, range(N), jnp.minimum)
    cmax = _pairwise_reduce(phi_nodes, range(N), jnp.maximum)
    mc = margins(list(range(N)))
    cell_band = (cmin <= mc) & (cmax >= -mc)
    cell_full = cmax < -mc

    faces = []
    for d in range(N):
        cross = [i for i in range(N) if i != d]
        fmin = _pairwise_reduce(phi_nodes, cross, jnp.minimum)
        fmax = _pairwise_reduce(phi_nodes, cross, jnp.maximum)
        mf = margins(cross)
        fband = (fmin <= mf) & (fmax >= -mf)
        ffull = fmax < -mf
        faces.append((jnp.broadcast_to(fband, tuple(
            n[i] + 1 if i == d else n[i] for i in range(N))),
            jnp.broadcast_to(ffull, tuple(
                n[i] + 1 if i == d else n[i] for i in range(N)))))
    return cell_band, cell_full, faces


def _nodal_phi(body, nodes_list, n, dtype):
    N = len(n)
    coords = []
    for d in range(N):
        shp = [1] * N
        shp[d] = n[d] + 1
        coords.append(jnp.asarray(nodes_list[d], dtype).reshape(shp))
    return jnp.broadcast_to(body(*coords), tuple(nd + 1 for nd in n))


def estimate_band_budget(body, nodes_list, n, dtype, safety,
                         spacetime=False) -> int:
    """Count the narrow-band work items (max over cells, faces, staggered
    volumes) for ``body`` on the given node grid.  Used to size
    ``band_budget``; for moving geometry multiply by a growth factor."""
    counts = _band_count_jit(body, tuple(n), jnp.dtype(dtype).name,
                             float(safety), bool(spacetime),
                             [jnp.asarray(v) for v in nodes_list])
    return int(jnp.max(counts))


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _band_count_jit(body, n, dtype_name, safety, spacetime, nodes_list):
    N = len(n)
    dtype = jnp.dtype(dtype_name)
    lo, hi = _cell_bounds_from_nodes(nodes_list, n, dtype)
    phi_nodes = _nodal_phi(body, nodes_list, n, dtype)
    band, _, faces = _band_masks(phi_nodes, n, lo, hi, spacetime, safety)
    counts = [jnp.sum(band)]
    for d in range(N):
        counts.append(jnp.sum(faces[d][0]))
        wband = _axis_slice(band, d, slice(0, -1)) | \
            _axis_slice(band, d, slice(1, None))
        counts.append(jnp.sum(wband))
    return jnp.stack(counts)


def _compact(mask, budget, total):
    """Static-size compaction: flat indices of True entries, padded with the
    sentinel ``total`` (a dummy slot); plus clipped gather indices."""
    (idx,) = jnp.nonzero(mask.ravel(), size=budget, fill_value=total)
    return idx, jnp.minimum(idx, total - 1)


def _scatter_flat(init, idx, values, shape):
    """Scatter compacted values back over an initialized flat array (one
    dummy slot at the end absorbs the sentinel writes)."""
    total = init.size
    out = jnp.concatenate([init.ravel(), jnp.zeros((1,), init.dtype)])
    return out.at[idx].set(values.astype(init.dtype))[:total].reshape(shape)


def _gather_cells(arr, n, gidx):
    return jnp.broadcast_to(arr, n).ravel()[gidx]


def _capacity_impl(body, nodes_list, n, dtype, p, s, compute_centroids,
                   mesh_ref, spacetime=False, np_shape=None,
                   band_budget=None, band_safety=_BAND_DEFAULT_SAFETY,
                   cut_moments=False):
    N = len(n)
    if np_shape is None:
        np_shape = tuple(nd + 1 for nd in n)
    if band_budget is not None and N >= 2:
        return _capacity_impl_band(body, nodes_list, n, dtype, p, s,
                                   compute_centroids, mesh_ref, spacetime,
                                   np_shape, int(band_budget),
                                   float(band_safety),
                                   cut_moments=cut_moments)
    lo, hi = _cell_bounds_from_nodes(nodes_list, n, dtype)
    # For space-time slabs the interface crossing lives in space, so the
    # closed-form axis of the full-box integrals is the last *spatial* axis.
    vol_inner = N - 2 if (spacetime and N >= 2) else None

    # --- volumes + centroids -------------------------------------------------
    V_cells, moms = box_integrals(body, lo, hi, p=p, s=s, inner_axis=vol_inner)
    full_vol = 1.0
    for d in range(N):
        full_vol = full_vol * (hi[d] - lo[d])
    eps = 1e-10 if jnp.dtype(dtype).itemsize >= 8 else 2e-5
    is_empty = V_cells <= eps * full_vol
    is_full = V_cells >= (1.0 - eps) * full_vol
    is_cut = (~is_empty) & (~is_full)
    cell_types = jnp.where(is_empty, 0, jnp.where(is_full, 1, -1)).astype(jnp.int8)
    V_cells = jnp.where(is_empty, 0.0, jnp.where(is_full, full_vol, V_cells))

    box_center = [jnp.broadcast_to(0.5 * (lo[d] + hi[d]), n) for d in range(N)]
    Vsafe = jnp.maximum(V_cells, 1e-300)
    C_cells = [
        jnp.where(is_cut, moms[d] / Vsafe, box_center[d]) for d in range(N)
    ]

    # --- face capacities A[d] ------------------------------------------------
    # Consistency with the volumes: an INTERIOR face with fluid volume on
    # only one side is part of the fluid BOUNDARY, not an interior flux
    # face — its aperture must be 0 so the measure lands in Gamma (the
    # |A_lo - A_hi| divergence identity below) and the closure runs
    # through the interface rows.  Without this, a tangency sliver (the
    # body grazing a grid face: chord aperture O(h) while the far-side
    # volume is below the volume-quadrature floor) leaks flux into
    # identity-pinned empty cells; measured on the r=1 disk at 64²: 8
    # such faces (apertures up to 0.09 h) drag the DISCRETE solution of
    # the constant-state problem off by up to 4.9e-2 and break grid
    # convergence of every solver on 'unlucky' geometries.  Domain-border
    # faces (no far-side cell) are exempt — the border rows own them.
    # Space-time slabs carry moments on the SPATIAL axes only: the moment
    # cut-flux closure corrects the spatial flux/continuity operators, and
    # the Gauss identities behind gamma_half_moments hold verbatim on the
    # slab (the time faces have e_a·n = 0 for every spatial a, so they
    # drop out of the half-box divergence identity) — the slab A/B/V/Vh
    # are simply the time-integrated measures.
    n_mom = (N - 1) if spacetime else N
    do_moms = cut_moments and n_mom >= 2
    # relative measure floor for centroid validity: f32 quadrature noise on
    # near-empty faces is ~1e-7 of the measure scale — an absolute ~tiny
    # gate lets noise/noise centroid ratios through (measured: 1e13-scale
    # junk coordinates NaN'd the f32 DFG solve); centroids are also
    # clamped to their own cell box below
    eps_rel = 1e-12 if jnp.finfo(dtype).bits >= 64 else 1e-5
    A = []
    Am = []
    for d in range(N):
        shp = [1] * N
        shp[d] = n[d] + 1
        fco = jnp.asarray(nodes_list[d], dtype).reshape(shp)
        if N == 1:
            Ad = (body(fco) <= 0.0).astype(dtype)
        else:
            cross_lo = [lo[i] for i in range(N) if i != d]
            cross_hi = [hi[i] for i in range(N) if i != d]

            def phi_face(*cs, _d=d, _f=fco):
                return body(*_insert(cs, _d, _f))

            fshape = tuple(n[i] + 1 if i == d else n[i] for i in range(N))
            # Slab spatial faces keep the default TIME closed form: the
            # moving solvers all interpolate the body linearly in t
            # (Stefan marker fronts, prescribed-motion slabs), making phi
            # exactly linear along t — the crossing-time root is then
            # EXACT and the outer GL sees the smooth spatial dependence.
            # The alternative (spatial closed form, GL in t) was tried in
            # round 5: it is exact for static-in-slab bodies (where the
            # time form leaves a stepped GL integrand, ~1.6% aperture
            # error at 16^2) but broke the Stefan GN balance on moving
            # fronts (Frank-disk radii scattered 0.66-1.09 vs 1.04).
            Ad, Amoms = box_integrals(phi_face, cross_lo, cross_hi, p=p, s=s)
            if do_moms and d < n_mom:
                # wet-face centroid (first moments come free from the
                # quadrature; the d-component is the face coordinate)
                cross_meas_f = 1.0
                for i in range(N):
                    if i != d:
                        cross_meas_f = cross_meas_f * (hi[i] - lo[i])
                eps_m = eps_rel * cross_meas_f
                Asafe = jnp.maximum(Ad, jnp.asarray(
                    jnp.finfo(dtype).tiny, dtype))
                comps, ci = [], 0
                for i in range(N):
                    if i == d:
                        comps.append(jnp.broadcast_to(fco, fshape))
                    else:
                        fc = 0.5 * (cross_lo[ci] + cross_hi[ci])
                        cen = jnp.where(Ad > eps_m, Amoms[ci] / Asafe, fc)
                        cen = jnp.clip(cen, cross_lo[ci], cross_hi[ci])
                        comps.append(jnp.broadcast_to(cen, fshape))
                        ci += 1
                Am.append(jnp.stack(
                    [_pad_cells(c, np_shape) for c in comps], axis=-1))
            Ad = jnp.broadcast_to(Ad, fshape)
        if not spacetime:
            # STATIC builds only: the moving solvers consume space-time
            # capacities whose near-front slivers are handled by their own
            # aperture-gated disconnection (moving_diffusion.py); gating
            # the slab apertures here perturbs the Stefan GN flux balance
            # (diphasic Frank disk develops 3-8% lobes).
            Ad = Ad * _face_open_fraction(V_cells, full_vol, d, n, Ad.dtype)
        A.append(_pad_cells(Ad, np_shape))

    # --- centroid-line capacities B[d] --------------------------------------
    B = []
    Bm = []
    for d in range(N):
        ccoord = C_cells[d]
        if N == 1:
            Bd = (body(ccoord) <= 0.0).astype(dtype) * jnp.where(is_empty, 0.0, 1.0)
        else:
            cross_lo = [lo[i] for i in range(N) if i != d]
            cross_hi = [hi[i] for i in range(N) if i != d]

            def phi_line(*cs, _d=d, _c=ccoord):
                return body(*_insert(cs, _d, _c))

            Bd, Bmoms = box_integrals(phi_line, cross_lo, cross_hi, p=p, s=s)
            if do_moms and d < n_mom:
                cross_meas_f = 1.0
                for i in range(N):
                    if i != d:
                        cross_meas_f = cross_meas_f * (hi[i] - lo[i])
                eps_m = eps_rel * cross_meas_f
                Bsafe = jnp.maximum(Bd, jnp.asarray(
                    jnp.finfo(dtype).tiny, dtype))
                comps, ci = [], 0
                for i in range(N):
                    if i == d:
                        comps.append(jnp.broadcast_to(ccoord, n))
                    else:
                        cen = jnp.where(Bd > eps_m, Bmoms[ci] / Bsafe,
                                        box_center[i])
                        cen = jnp.clip(cen, cross_lo[ci], cross_hi[ci])
                        comps.append(jnp.broadcast_to(cen, n))
                        ci += 1
                Bm.append(jnp.stack(
                    [_pad_cells(c, np_shape) for c in comps], axis=-1))
            Bd = jnp.where(is_empty, 0.0, Bd)
        B.append(_pad_cells(jnp.broadcast_to(Bd, n), np_shape))

    # --- lower-half-cell volumes Vh[d] (cut-moment builds only) -------------
    Vh = []
    if do_moms:
        for d in range(n_mom):
            h_lo = [jnp.broadcast_to(lo[i], n) for i in range(N)]
            h_hi = [jnp.broadcast_to(C_cells[d] if i == d else hi[i], n)
                    for i in range(N)]
            Vh_d, _ = box_integrals(body, h_lo, h_hi, p=p, s=s,
                                    inner_axis=vol_inner)
            Vh_d = jnp.clip(Vh_d, 0.0, V_cells)
            Vh.append(_pad_cells(Vh_d, np_shape))

    # --- staggered volumes W[d] ---------------------------------------------
    W = []
    for d in range(N):
        if n[d] < 2:
            W.append(jnp.zeros(np_shape, dtype))
            continue
        sl_lo = [slice(None)] * N
        sl_hi = [slice(None)] * N
        sl_lo[d] = slice(0, n[d] - 1)
        sl_hi[d] = slice(1, n[d])
        st_lo = [
            (C_cells[d][tuple(sl_lo)] if i == d else jnp.broadcast_to(lo[i], n)[tuple(sl_lo)])
            for i in range(N)
        ]
        st_hi = [
            (C_cells[d][tuple(sl_hi)] if i == d else jnp.broadcast_to(hi[i], n)[tuple(sl_hi)])
            for i in range(N)
        ]
        Wd, _ = box_integrals(body, st_lo, st_hi, p=p, s=s,
                              inner_axis=vol_inner)
        # faces 1..n_d-1 hold values; faces 0 and n_d stay zero (reference
        # convention, src/capacity.jl:394-430)
        pad = [(0, 0)] * N
        pad[d] = (1, 0)
        Wd = jnp.pad(Wd, pad)
        W.append(_pad_cells(Wd, np_shape))

    # --- interface measure Gamma (divergence identity) -----------------------
    is_cut, cell_types, Gamma_cells = _gamma_from_apertures(
        A, is_empty, is_cut, full_vol, lo, hi, n, dtype)

    # --- interface centroids: closest-point projection of cell centers ------
    if compute_centroids:
        ctr = box_center
        phi0 = body(*ctr)
        grads = []
        for d in range(N):
            delta = 1e-4 * (hi[d] - lo[d])
            cp = [ctr[i] + (delta if i == d else 0.0) for i in range(N)]
            cm = [ctr[i] - (delta if i == d else 0.0) for i in range(N)]
            grads.append((body(*cp) - body(*cm)) / (2.0 * delta))
        g2 = sum(g * g for g in grads)
        g2 = jnp.maximum(g2, 1e-300)
        C_ga_cells = [
            jnp.where(is_cut, ctr[d] - phi0 * grads[d] / g2, 0.0) for d in range(N)
        ]
    else:
        C_ga_cells = [jnp.zeros(n, dtype) for _ in range(N)]

    V = _pad_cells(V_cells, np_shape)
    Gamma = _pad_cells(Gamma_cells, np_shape)
    cell_types = _pad_cells(cell_types, np_shape)
    C_om = jnp.stack(
        [_pad_cells(jnp.broadcast_to(C_cells[d], n), np_shape) for d in range(N)], axis=-1
    )
    C_ga = jnp.stack([_pad_cells(C_ga_cells[d], np_shape) for d in range(N)], axis=-1)

    return Capacity(
        A=tuple(A),
        B=tuple(B),
        V=V,
        W=tuple(W),
        C_om=C_om,
        C_ga=C_ga,
        Gamma=Gamma,
        cell_types=cell_types,
        mesh=mesh_ref,
        body=body,
        Am=tuple(Am) if do_moms else None,
        Bm=tuple(Bm) if do_moms else None,
        Vh=tuple(Vh) if do_moms else None,
    )


def _capacity_impl_band(body, nodes_list, n, dtype, p, s, compute_centroids,
                        mesh_ref, spacetime, np_shape, budget, safety,
                        cut_moments=False):
    """Narrow-band capacity pipeline: one nodal SDF pass classifies every
    cell/face; quadrature runs only on the band, compacted into a
    static-size buffer (``jnp.nonzero(size=budget)``), so the cost scales
    with the interface length instead of the grid volume — the decisive
    advantage over the reference's full-grid VOFI sweep
    (src/capacity.jl:81-123).  Budget overflow degrades gracefully: excess
    band cells keep their corner-sign full/empty value."""
    N = len(n)
    ncells = int(np.prod(n))
    lo, hi = _cell_bounds_from_nodes(nodes_list, n, dtype)
    vol_inner = N - 2 if (spacetime and N >= 2) else None

    # stop_gradient: the nodal pass only *classifies* — capacity values are
    # continuous across band-membership flips, so its tangents are exactly
    # zero; cutting them keeps volume-Jacobian autodiff off the full grid.
    phi_nodes = jax.lax.stop_gradient(_nodal_phi(body, nodes_list, n, dtype))
    band, far_full, face_masks = _band_masks(phi_nodes, n, lo, hi,
                                             spacetime, safety)

    full_vol = 1.0
    for d in range(N):
        full_vol = full_vol * (hi[d] - lo[d])
    full_vol = jnp.broadcast_to(full_vol, n)
    box_center = [jnp.broadcast_to(0.5 * (lo[d] + hi[d]), n)
                  for d in range(N)]

    # --- volumes + first moments on the band --------------------------------
    cidx, cg = _compact(band, budget, ncells)
    glo = [_gather_cells(lo[d], n, cg) for d in range(N)]
    ghi = [_gather_cells(hi[d], n, cg) for d in range(N)]
    vol_b, moms_b = box_integrals(body, glo, ghi, p=p, s=s,
                                  inner_axis=vol_inner)
    V_cells = _scatter_flat(jnp.where(far_full, full_vol, 0.0),
                            cidx, vol_b, n)
    moms = [_scatter_flat(jnp.zeros(n, dtype), cidx, moms_b[d], n)
            for d in range(N)]

    eps = 1e-10 if jnp.dtype(dtype).itemsize >= 8 else 2e-5
    is_empty = V_cells <= eps * full_vol
    is_full = V_cells >= (1.0 - eps) * full_vol
    is_cut = (~is_empty) & (~is_full)
    cell_types = jnp.where(is_empty, 0,
                           jnp.where(is_full, 1, -1)).astype(jnp.int8)
    V_cells = jnp.where(is_empty, 0.0, jnp.where(is_full, full_vol, V_cells))
    Vsafe = jnp.maximum(V_cells, 1e-300)
    C_cells = [jnp.where(is_cut, moms[d] / Vsafe, box_center[d])
               for d in range(N)]

    # --- face capacities A[d] on the face band ------------------------------
    # slab builds: moments on the spatial axes only (see the dense path)
    n_mom = (N - 1) if spacetime else N
    do_moms = cut_moments and n_mom >= 2
    # relative measure floor + cell-box clamping — see the dense path
    eps_rel = 1e-12 if jnp.finfo(dtype).bits >= 64 else 1e-5
    tiny_d = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    A = []
    Am = []
    for d in range(N):
        fband, ffull = face_masks[d]
        fshape = fband.shape
        nfaces = int(np.prod(fshape))
        cross = [i for i in range(N) if i != d]
        cross_meas = 1.0
        for i in cross:
            cross_meas = cross_meas * (hi[i] - lo[i])
        cross_meas = jnp.broadcast_to(cross_meas, fshape)

        fidx, fg = _compact(fband, budget, nfaces)
        shp = [1] * N
        shp[d] = n[d] + 1
        fco_full = jnp.broadcast_to(
            jnp.asarray(nodes_list[d], dtype).reshape(shp), fshape)
        fco = fco_full.ravel()[fg]
        cross_lo = [jnp.broadcast_to(lo[i], fshape).ravel()[fg]
                    for i in cross]
        cross_hi = [jnp.broadcast_to(hi[i], fshape).ravel()[fg]
                    for i in cross]

        def phi_face(*cs, _d=d, _f=fco):
            return body(*_insert(cs, _d, _f))

        Ad_b, Amoms_b = box_integrals(phi_face, cross_lo, cross_hi, p=p, s=s)
        Ad = _scatter_flat(jnp.where(ffull, cross_meas, 0.0),
                           fidx, Ad_b, fshape)
        if do_moms and d < n_mom:
            eps_m = eps_rel * jnp.broadcast_to(cross_meas, fshape
                                               ).ravel()[fg]
            Asafe_b = jnp.maximum(Ad_b, tiny_d)
            comps, ci = [], 0
            for i in range(N):
                if i == d:
                    comps.append(_pad_cells(fco_full, np_shape))
                else:
                    fc_full = jnp.broadcast_to(
                        0.5 * (lo[i] + hi[i]), fshape)
                    cen_b = jnp.where(
                        Ad_b > eps_m, Amoms_b[ci] / Asafe_b,
                        0.5 * (cross_lo[ci] + cross_hi[ci]))
                    cen_b = jnp.clip(cen_b, cross_lo[ci], cross_hi[ci])
                    comps.append(_pad_cells(
                        _scatter_flat(fc_full, fidx, cen_b, fshape),
                        np_shape))
                    ci += 1
            Am.append(jnp.stack(comps, axis=-1))
        # boundary-face consistency (see the dense path): interior faces
        # with an empty cell on either side carry no interior flux;
        # static builds only (see the dense path for why)
        if not spacetime:
            Ad = Ad * _face_open_fraction(V_cells, full_vol, d, n, Ad.dtype)
        A.append(_pad_cells(Ad, np_shape))

    # --- centroid-line capacities B[d] on the cell band ---------------------
    B = []
    Bm = []
    for d in range(N):
        cross = [i for i in range(N) if i != d]
        cross_meas = 1.0
        for i in cross:
            cross_meas = cross_meas * (hi[i] - lo[i])
        cross_meas = jnp.broadcast_to(cross_meas, n)
        ccoord = C_cells[d].ravel()[cg]
        cross_lo = [_gather_cells(lo[i], n, cg) for i in cross]
        cross_hi = [_gather_cells(hi[i], n, cg) for i in cross]

        def phi_line(*cs, _d=d, _c=ccoord):
            return body(*_insert(cs, _d, _c))

        Bd_b, Bmoms_b = box_integrals(phi_line, cross_lo, cross_hi, p=p, s=s)
        Bd = _scatter_flat(jnp.where(far_full, cross_meas, 0.0),
                           cidx, Bd_b, n)
        Bd = jnp.where(is_empty, 0.0, Bd)
        B.append(_pad_cells(Bd, np_shape))
        if do_moms and d < n_mom:
            eps_m = eps_rel * cross_meas.ravel()[cg]
            Bsafe_b = jnp.maximum(Bd_b, tiny_d)
            comps, ci = [], 0
            for i in range(N):
                if i == d:
                    comps.append(_pad_cells(C_cells[d], np_shape))
                else:
                    cen_b = jnp.where(Bd_b > eps_m, Bmoms_b[ci] / Bsafe_b,
                                      0.5 * (cross_lo[ci] + cross_hi[ci]))
                    cen_b = jnp.clip(cen_b, cross_lo[ci], cross_hi[ci])
                    comps.append(_pad_cells(
                        _scatter_flat(box_center[i], cidx, cen_b, n),
                        np_shape))
                    ci += 1
            Bm.append(jnp.stack(comps, axis=-1))

    # --- lower-half-cell volumes Vh[d] (cut-moment builds only) -------------
    Vh = []
    if do_moms:
        for d in range(n_mom):
            h_lo = [_gather_cells(lo[i], n, cg) for i in range(N)]
            h_hi = [(C_cells[d].ravel()[cg] if i == d
                     else _gather_cells(hi[i], n, cg)) for i in range(N)]
            Vh_b, _ = box_integrals(body, h_lo, h_hi, p=p, s=s,
                                    inner_axis=vol_inner)
            Vh_d = _scatter_flat(jnp.where(far_full, 0.5 * full_vol, 0.0),
                                 cidx, Vh_b, n)
            Vh_d = jnp.clip(Vh_d, 0.0, V_cells)
            Vh.append(_pad_cells(Vh_d, np_shape))

    # --- staggered volumes W[d] (band = either adjacent cell banded) --------
    W = []
    for d in range(N):
        if n[d] < 2:
            W.append(jnp.zeros(np_shape, dtype))
            continue
        sl0, sl1 = slice(0, n[d] - 1), slice(1, n[d])
        wband = _axis_slice(band, d, sl0) | _axis_slice(band, d, sl1)
        wfull = _axis_slice(far_full, d, sl0) & _axis_slice(far_full, d, sl1)
        wshape = wband.shape
        nw = int(np.prod(wshape))
        # far value: exact slab between the two (box-center) centroids
        Cd0 = _axis_slice(C_cells[d], d, sl0)
        Cd1 = _axis_slice(C_cells[d], d, sl1)
        cross_meas = 1.0
        for i in range(N):
            if i != d:
                cross_meas = cross_meas * _axis_slice(
                    jnp.broadcast_to(hi[i] - lo[i], n), d, sl0)
        w_far = (Cd1 - Cd0) * cross_meas

        widx, wg = _compact(wband, budget, nw)
        st_lo = [(Cd0 if i == d else _axis_slice(
            jnp.broadcast_to(lo[i], n), d, sl0)).ravel()[wg]
            for i in range(N)]
        st_hi = [(Cd1 if i == d else _axis_slice(
            jnp.broadcast_to(hi[i], n), d, sl0)).ravel()[wg]
            for i in range(N)]
        Wd_b, _ = box_integrals(body, st_lo, st_hi, p=p, s=s,
                                inner_axis=vol_inner)
        Wd = _scatter_flat(jnp.where(wfull, w_far, 0.0), widx, Wd_b, wshape)
        pad = [(0, 0)] * N
        pad[d] = (1, 0)
        W.append(_pad_cells(jnp.pad(Wd, pad), np_shape))

    # --- interface measure Gamma (divergence identity, dense & cheap) -------
    is_cut, cell_types, Gamma_cells = _gamma_from_apertures(
        A, is_empty, is_cut, full_vol, lo, hi, n, dtype)

    # --- interface centroids: closest-point projection, band only -----------
    if compute_centroids:
        ctr_g = [_gather_cells(box_center[d], n, cg) for d in range(N)]
        dg = [_gather_cells(hi[d] - lo[d], n, cg) for d in range(N)]
        phi0 = body(*ctr_g)
        grads = []
        for d in range(N):
            delta = 1e-4 * dg[d]
            cp = [ctr_g[i] + (delta if i == d else 0.0) for i in range(N)]
            cm = [ctr_g[i] - (delta if i == d else 0.0) for i in range(N)]
            grads.append((body(*cp) - body(*cm)) / (2.0 * delta))
        g2 = jnp.maximum(sum(g * g for g in grads), 1e-300)
        C_ga_cells = [
            jnp.where(is_cut,
                      _scatter_flat(jnp.zeros(n, dtype), cidx,
                                    ctr_g[d] - phi0 * grads[d] / g2, n),
                      0.0)
            for d in range(N)
        ]
    else:
        C_ga_cells = [jnp.zeros(n, dtype) for _ in range(N)]

    V = _pad_cells(V_cells, np_shape)
    Gamma = _pad_cells(Gamma_cells, np_shape)
    cell_types = _pad_cells(cell_types, np_shape)
    C_om = jnp.stack(
        [_pad_cells(C_cells[d], np_shape) for d in range(N)], axis=-1
    )
    C_ga = jnp.stack([_pad_cells(C_ga_cells[d], np_shape) for d in range(N)],
                     axis=-1)
    return Capacity(A=tuple(A), B=tuple(B), V=V, W=tuple(W), C_om=C_om,
                    C_ga=C_ga, Gamma=Gamma, cell_types=cell_types,
                    mesh=mesh_ref, body=body,
                    Am=tuple(Am) if do_moms else None,
                    Bm=tuple(Bm) if do_moms else None,
                    Vh=tuple(Vh) if do_moms else None)


def _shift_hi(x, d):
    """y[k] = x[k+1] along axis d, zero in the last slot."""
    pad = [(0, 0)] * x.ndim
    pad[d] = (0, 1)
    sl = [slice(None)] * x.ndim
    sl[d] = slice(1, None)
    return jnp.pad(x, pad)[tuple(sl)]


def gamma_half_moments(capacity):
    """Per-axis, per-half-strip interface moments for the moment-consistent
    cut-flux closure.

    The flux operator's uγ coefficients at face k along axis ``a`` are
    ``S_lo(k) = A_a(k) − B_a(k)`` (the lo half of cell k) and
    ``S_hi(k−1) = B_a(k−1) − A_a(k)`` (the hi half of cell k−1) — exactly
    the n_a-weighted interface measures ``∫_Γ∩half n_a dS`` by the
    divergence identity.  The matching first moments follow from Gauss with
    F = x_j e_a over each wet half-cell:

    - lo half:  ``∫ x_j n_a = A·Am_j − B·Bm_j``  (j ≠ a),
                ``∫ x_a n_a = Vh − C_a·B + node_lo·A``
    - hi half:  ``∫ x_j n_a = B·Bm_j − A_hi·Am_hi_j``  (j ≠ a),
                ``∫ x_a n_a = (V−Vh) − node_hi·A_hi + C_a·B``

    Returns a list over axes ``a`` of ``(S_lo, X_lo, S_hi, X_hi)`` with
    ``S_*`` the signed measures (np_shape) and ``X_*`` the centroids
    ``M/S`` (np_shape + (N,)); where |S| is below a tolerance the centroid
    falls back to ``C_ga`` so any ``g(X) − g(C_ga)`` correction vanishes.
    Requires a ``cut_moments=True`` capacity build.
    """
    if capacity.Bm is None:
        raise ValueError("gamma_half_moments needs a cut_moments=True build")
    N = capacity.ndim
    mesh = capacity.mesh
    np_shape = capacity.np_shape
    dt_ = capacity.V.dtype
    V = capacity.V
    C_ga = capacity.C_ga
    out = []
    for a in range(N):
        A_a = capacity.A[a]
        B_a = capacity.B[a]
        A_hi = _shift_hi(A_a, a)
        C_a = capacity.C_om[..., a]
        Vh = capacity.Vh[a]
        Vhi = V - Vh
        # per-cell lo/hi face coordinates on the padded grid
        nd = mesh.n[a] + 1
        nod = np.zeros(np_shape[a])
        nod[:nd] = np.asarray(mesh.nodes[a])
        nod[nd:] = nod[nd - 1]
        shp = [1] * N
        shp[a] = np_shape[a]
        node_lo = jnp.asarray(nod.reshape(shp), dt_)
        node_hi = _shift_hi(jnp.broadcast_to(node_lo, np_shape)
                            * jnp.ones((), dt_), a)
        S_lo = A_a - B_a
        S_hi = B_a - A_hi
        # tolerance: a tiny fraction of the full cross-face measure
        h_all = [float(hv) for hv in mesh.h]
        face_meas = 1.0
        for i in range(N):
            if i != a:
                face_meas *= h_all[i]
        tol = (1e-7 if jnp.finfo(dt_).bits >= 64 else 1e-4) * face_meas
        X_lo, X_hi = [], []
        for j in range(N):
            if j == a:
                M_lo = Vh - C_a * B_a + node_lo * A_a
                M_hi = Vhi - node_hi * A_hi + C_a * B_a
            else:
                AAm = A_a * capacity.Am[a][..., j]
                BBm = B_a * capacity.Bm[a][..., j]
                M_lo = AAm - BBm
                M_hi = BBm - _shift_hi(AAm, a)
            S_lo_safe = jnp.where(jnp.abs(S_lo) > tol, S_lo, 1.0)
            S_hi_safe = jnp.where(jnp.abs(S_hi) > tol, S_hi, 1.0)
            # clamp to the cell box along j: a Γ centroid lives inside its
            # cell; f32 moment noise divided by small |S| can land far
            # outside and blow up the g(X) evaluation
            ndj = mesh.n[j] + 1
            nodj = np.zeros(np_shape[j])
            nodj[:ndj] = np.asarray(mesh.nodes[j])
            nodj[ndj:] = nodj[ndj - 1]
            shpj = [1] * N
            shpj[j] = np_shape[j]
            clo = jnp.asarray(nodj.reshape(shpj), dt_)
            chi = clo + jnp.asarray(mesh.h[j], dt_)
            X_lo.append(jnp.clip(
                jnp.where(jnp.abs(S_lo) > tol, M_lo / S_lo_safe,
                          C_ga[..., j]), clo, chi))
            X_hi.append(jnp.clip(
                jnp.where(jnp.abs(S_hi) > tol, M_hi / S_hi_safe,
                          C_ga[..., j]), clo, chi))
        out.append((S_lo, jnp.stack(X_lo, axis=-1),
                    S_hi, jnp.stack(X_hi, axis=-1)))
    return out


def compute_cell_volumes(body, mesh, p: int = 4, s: int = 1, dtype=None,
                         params=None, band_budget=None,
                         band_safety: float = _BAND_DEFAULT_SAFETY):
    """Cut-cell wetted volumes only (padded cell grid) — the lean path for
    Stefan volume Jacobians (stefan.jl:573-574 builds these per marker
    perturbation; here they are jacfwd'd, so keeping the primal minimal
    matters).  ``band_budget`` as in ``compute_capacity``."""
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    return _cell_volumes_jit(body, mesh, p, s, jnp.dtype(dtype).name,
                             band_budget, float(band_safety), params)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _cell_volumes_jit(body, mesh, p, s, dtype_name, band_budget, band_safety,
                      params):
    dtype = jnp.dtype(dtype_name)
    n = mesh.n
    N = len(n)
    nodes_list = [np.asarray(v, dtype) for v in mesh.nodes]
    wrapped = body if params is None else (lambda *cs: body(*cs, params))
    lo, hi = _cell_bounds_from_nodes(nodes_list, n, dtype)
    if band_budget is None or N < 2:
        V, _ = box_integrals(wrapped, lo, hi, p=p, s=s)
        return _pad_cells(V, mesh.np_shape)
    ncells = int(np.prod(n))
    phi_nodes = jax.lax.stop_gradient(_nodal_phi(wrapped, nodes_list, n,
                                                 dtype))
    h2 = sum((hi[d] - lo[d]) ** 2 for d in range(N))
    margin = 0.5 * band_safety * jnp.sqrt(jnp.broadcast_to(h2, n))
    cmin = _pairwise_reduce(phi_nodes, range(N), jnp.minimum)
    cmax = _pairwise_reduce(phi_nodes, range(N), jnp.maximum)
    band = (cmin <= margin) & (cmax >= -margin)
    far_full = cmax < -margin
    full_vol = 1.0
    for d in range(N):
        full_vol = full_vol * (hi[d] - lo[d])
    cidx, cg = _compact(band, int(band_budget), ncells)
    glo = [_gather_cells(lo[d], n, cg) for d in range(N)]
    ghi = [_gather_cells(hi[d], n, cg) for d in range(N)]
    vol_b, _ = box_integrals(wrapped, glo, ghi, p=p, s=s)
    V = _scatter_flat(jnp.where(far_full, jnp.broadcast_to(full_vol, n), 0.0),
                      cidx, vol_b, n)
    return _pad_cells(V, mesh.np_shape)
