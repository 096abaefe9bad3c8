"""Independent numpy reference backend for capacities (test-only).

Mirrors the reference's strategy of cross-validating two independent
geometry backends (``/root/reference/test/capacity_test.jl:6-60`` compares
VOFI against ImplicitIntegration).  This backend uses dense midpoint
subsampling — a completely different algorithm from the quadratic-fit
Gauss-Legendre engine in ``capacity.py`` — so agreement between the two is
meaningful evidence of correctness.  Pure numpy, used only from tests on
coarse grids.
"""

from __future__ import annotations

import numpy as np

__all__ = ["compute_capacity_ref"]


def _np_body(body):
    def f(*coords):
        import jax.numpy as jnp  # body may be written with jnp

        return np.asarray(body(*[jnp.asarray(c) for c in coords]))

    return f


def _box_fraction(f, lo, hi, sub):
    """Midpoint-rule wetted fraction + centroid of one box (ndim from len(lo))."""
    N = len(lo)
    axes = [np.linspace(lo[d], hi[d], sub, endpoint=False) + (hi[d] - lo[d]) / (2 * sub)
            for d in range(N)]
    grid = np.meshgrid(*axes, indexing="ij")
    inside = f(*grid) < 0.0
    frac = inside.mean()
    vol = frac * np.prod([hi[d] - lo[d] for d in range(N)])
    if inside.any():
        cen = [grid[d][inside].mean() for d in range(N)]
    else:
        cen = [0.5 * (lo[d] + hi[d]) for d in range(N)]
    return vol, cen


def compute_capacity_ref(body, mesh, sub=48):
    """Dense-subsampling capacities.  Returns a dict of numpy arrays with the
    same shapes/conventions as ``capacity.compute_capacity``."""
    f = _np_body(body)
    N = mesh.ndim
    n = mesh.n
    np_shape = mesh.np_shape
    nodes = [np.asarray(v) for v in mesh.nodes]

    V = np.zeros(np_shape)
    Gamma = np.zeros(np_shape)
    cell_types = np.zeros(np_shape, dtype=np.int8)
    C_om = np.zeros(np_shape + (N,))
    A = [np.zeros(np_shape) for _ in range(N)]
    B = [np.zeros(np_shape) for _ in range(N)]
    W = [np.zeros(np_shape) for _ in range(N)]

    full_vol = np.prod([nodes[d][1] - nodes[d][0] for d in range(N)])

    for idx in np.ndindex(*n):
        lo = [nodes[d][idx[d]] for d in range(N)]
        hi = [nodes[d][idx[d] + 1] for d in range(N)]
        vol, cen = _box_fraction(f, lo, hi, sub)
        V[idx] = vol
        C_om[idx] = cen
        if vol <= 1e-6 * full_vol:
            cell_types[idx] = 0
            V[idx] = 0.0
            C_om[idx] = [0.5 * (lo[d] + hi[d]) for d in range(N)]
        elif vol >= (1 - 1e-6) * full_vol:
            cell_types[idx] = 1
            V[idx] = full_vol
            C_om[idx] = [0.5 * (lo[d] + hi[d]) for d in range(N)]
        else:
            cell_types[idx] = -1

    # faces A[d]: all faces k=0..n_d, cross dims are cells
    for d in range(N):
        shape_faces = tuple(n[i] + 1 if i == d else n[i] for i in range(N))
        for idx in np.ndindex(*shape_faces):
            fco = nodes[d][idx[d]]
            if N == 1:
                A[d][idx] = 1.0 if f(np.asarray(fco)) <= 0 else 0.0
            else:
                lo = [nodes[i][idx[i]] for i in range(N) if i != d]
                hi = [nodes[i][idx[i] + 1] for i in range(N) if i != d]
                g = lambda *cs: f(*(list(cs[:d]) + [np.full_like(cs[0], fco)] + list(cs[d:])))
                vol, _ = _box_fraction(g, lo, hi, sub)
                A[d][idx] = vol

    # centroid lines B[d]
    for d in range(N):
        for idx in np.ndindex(*n):
            if cell_types[idx] == 0:
                continue
            cco = C_om[idx][d]
            if N == 1:
                B[d][idx] = 1.0 if f(np.asarray(cco)) <= 0 else 0.0
            else:
                lo = [nodes[i][idx[i]] for i in range(N) if i != d]
                hi = [nodes[i][idx[i] + 1] for i in range(N) if i != d]
                g = lambda *cs: f(*(list(cs[:d]) + [np.full_like(cs[0], cco)] + list(cs[d:])))
                vol, _ = _box_fraction(g, lo, hi, sub)
                B[d][idx] = vol

    # staggered volumes W[d] at interior faces 1..n_d-1
    for d in range(N):
        shape_faces = tuple(n[i] if i != d else n[d] for i in range(N))
        for idx in np.ndindex(*shape_faces):
            k = idx[d]
            if k < 1 or k > n[d] - 1:
                continue
            prev_idx = tuple(k - 1 if i == d else idx[i] for i in range(N))
            next_idx = tuple(k if i == d else idx[i] for i in range(N))
            lo = [C_om[prev_idx][d] if i == d else nodes[i][idx[i]] for i in range(N)]
            hi = [C_om[next_idx][d] if i == d else nodes[i][idx[i] + 1] for i in range(N)]
            if hi[d] <= lo[d]:
                continue
            vol, _ = _box_fraction(f, lo, hi, sub)
            W[d][idx] = vol

    # Gamma via aperture-defect identity on the subsampled apertures
    for idx in np.ndindex(*n):
        if cell_types[idx] != -1:
            continue
        s2 = 0.0
        for d in range(N):
            up = tuple(idx[i] + (1 if i == d else 0) for i in range(N))
            s2 += (A[d][idx] - A[d][up]) ** 2
        Gamma[idx] = np.sqrt(s2)

    return dict(A=A, B=B, V=V, W=W, C_om=C_om, Gamma=Gamma, cell_types=cell_types)
