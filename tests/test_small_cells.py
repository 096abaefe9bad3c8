"""Small-cell remedies (reference capacity.jl:693-851): conservation of the
merge transform and the conditioning improvement it exists for."""

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.linsolve import materialize_dense
from penguin_tpu.solvers import DiffusionSteadyMono
from penguin_tpu.utils import clamp_merge_small_cells, remove_small_volumes


def _sliver_capacity(n=20, eps=0.05):
    """Halfspace with its plane a hair past a cell face -> a whole column
    of sliver cut cells of volume ~eps·h².  (Mesh convention: cells are
    centered at j·h, faces at (j±1/2)h.)  eps must exceed the quadrature's
    first Gauss sample offset (~1.7% h at s=2) or the sliver is invisible
    to the capacity engine."""
    mesh = pt.Mesh((n, n), (1.0, 1.0), (0.0, 0.0))
    h = 1.0 / n
    body = pt.geometry.halfspace(0, 0.725 + eps * h)
    cap = pt.compute_capacity(body, mesh, p=6, s=2)
    return mesh, cap


def test_clamp_merge_conserves_and_cleans():
    mesh, cap = _sliver_capacity()
    V = np.asarray(cap.V)
    tol = 1.5e-1 * V.max()
    assert ((V > 0) & (V < tol)).any(), "fixture must contain sliver cells"
    cap2, n_merged = clamp_merge_small_cells(cap, tol)
    assert int(n_merged) > 0
    # conservation of total volume, interface measure, per-axis capacities
    for a, b in ((cap.V, cap2.V), (cap.Gamma, cap2.Gamma),
                 *zip(cap.A, cap2.A), *zip(cap.B, cap2.B),
                 *zip(cap.W, cap2.W)):
        np.testing.assert_allclose(float(jnp.sum(a)), float(jnp.sum(b)),
                                   rtol=1e-12)
    # volume-weighted centroid conserved
    c1 = np.asarray((cap.V[..., None] * cap.C_om).sum((0, 1)))
    c2 = np.asarray((cap2.V[..., None] * cap2.C_om).sum((0, 1)))
    np.testing.assert_allclose(c1, c2, rtol=1e-10)
    # no sliver volumes remain
    V2 = np.asarray(cap2.V)
    assert not ((V2 > 0) & (V2 < tol)).any()


def _cond_of(cap):
    ops = pt.make_diffusion_ops(cap)
    bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                                for k in ("left", "right", "top", "bottom")})
    solver = DiffusionSteadyMono(
        pt.Phase(cap, ops, lambda x, y, z: 1.0, 1.0), bc_b, pt.Dirichlet(0.0))
    b = solver._rhs()
    A, _ = materialize_dense(solver.apply, b)
    A = np.asarray(A)
    ident = (np.abs(A).sum(1) == 1.0) & (np.diagonal(A) == 1.0)
    keep = ~ident
    Ak = A[np.ix_(keep, keep)]
    s = np.linalg.svd(Ak, compute_uv=False)
    return s.max() / s[s > 1e-14].min()


def test_clamp_merge_improves_conditioning():
    """cond(A) of the steady Poisson system drops by a large factor once
    sliver cells are merged (the reason the remedy exists,
    capacity.jl:746-851)."""
    mesh, cap = _sliver_capacity(n=16, eps=0.02)
    V = np.asarray(cap.V)
    tol = 1.5e-1 * V.max()
    assert ((V > 0) & (V < tol)).any()
    c_before = _cond_of(cap)
    cap2, n_merged = clamp_merge_small_cells(cap, tol)
    assert int(n_merged) > 0
    c_after = _cond_of(cap2)
    # measured: 798 -> 129 (6.2x) on this fixture, stable across eps
    assert c_after < c_before / 4, (c_before, c_after)
    # removal also conditions, at the cost of volume conservation
    cap3 = remove_small_volumes(cap, tol)
    assert _cond_of(cap3) < c_before / 4


def test_face_gate_border_faces_stay_open():
    """_face_open_fraction invariant (capacity.py): faces on the domain
    border (slots 0 and n[d]) stay fully open even when the adjacent cell
    is a sub-threshold sliver — the border-condition rows own those faces,
    and gating them would silently cut a prescribed border flux.  Round-3
    regression: the gate used the single adjacent cell at the border."""
    import jax.numpy as jnp
    from penguin_tpu.capacity import _face_open_fraction

    n = (4, 3)
    V = np.ones(n)
    V[0, :] = 1e-4      # sliver column against the low-x border
    V[-1, 1] = 0.0      # empty cell against the high-x border
    g = np.asarray(_face_open_fraction(jnp.asarray(V), 1.0, 0, n,
                                       jnp.float64))
    assert g.shape == (n[0] + 1, n[1])
    # border faces fully open regardless of the adjacent cell state
    np.testing.assert_allclose(g[0, :], 1.0)
    np.testing.assert_allclose(g[-1, :], 1.0)
    # interior face against the sliver is attenuated, against the empty
    # cell exactly closed, between full cells fully open
    assert (g[1, :] < 0.05).all()
    assert g[3, 1] == 0.0
    np.testing.assert_allclose(g[2, :], 1.0)
