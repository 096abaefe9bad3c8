"""Geometric consistency of the capacity tensors.

Round-3 finding: the volume, face-aperture and centroid-line quadratures
are independent, and at GRAZING configurations (the body tangent to a
grid face) they used to disagree — a face could carry O(h) aperture next
to a volume-empty cell, or a volume-full cell could have partially wet
faces with no Gamma row.  Both leaked flux into masked/identity DOFs:
the DISCRETE solution of the constant-state Dirichlet problem was off by
up to 16%, GROWING under refinement, which silently capped the accuracy
of every solver on unlucky geometries (disks, annuli, Couette).

Two invariants now enforced by construction and pinned here:
1. no interior face has nonzero aperture next to an empty cell;
2. every active cell whose aperture divergence is nonzero carries Gamma
   (so the interface rows close it), making u == const an EXACT discrete
   solution.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyMono


def _disk(c, R):
    def body(x, y):
        return jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2) - R

    return body


GRAZING = [((2.0, 2.0), 1.0, 64), ((2.0, 2.0), 1.0, 128),
           ((2.008, 2.008), 1.0, 64), ((2.008, 2.008), 1.0, 96)]


@pytest.mark.parametrize("c,R,n", GRAZING)
def test_no_open_faces_into_empty_cells(c, R, n):
    mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))
    cap = pt.compute_capacity(_disk(c, R), mesh, p=4, s=1)
    V = np.asarray(cap.V)
    wet = V > 1e-14
    h = 4.0 / n
    for d in (0, 1):
        A = np.asarray(cap.A[d]) / h
        lowwet = np.roll(wet, 1, axis=d)
        # interior faces only (slot 0 has no lower cell)
        sl = [slice(None)] * 2
        sl[d] = slice(1, n)
        leak = (A > 1e-12) & (wet != lowwet)
        assert int(leak[tuple(sl)].sum()) == 0, (d, int(leak.sum()))


@pytest.mark.parametrize("c,R,n", GRAZING)
def test_divergence_carriers_have_gamma(c, R, n):
    mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))
    cap = pt.compute_capacity(_disk(c, R), mesh, p=4, s=1)
    A0 = np.asarray(cap.A[0])
    A1 = np.asarray(cap.A[1])
    G = np.asarray(cap.Gamma)
    V = np.asarray(cap.V)
    h = 4.0 / n
    S = np.zeros((n, n))
    S += (A0[:n, :n] - A0[1:n + 1, :n]) ** 2
    S += (A1[:n, :n] - A1[:n, 1:n + 1]) ** 2
    carrier = (V[:n, :n] > 1e-14) & (np.sqrt(S) > 1e-8 * h)
    assert bool((G[:n, :n][carrier] > 0).all()), int(
        (G[:n, :n][carrier] <= 0).sum())


@pytest.mark.parametrize("c,n", [((2.0, 2.0), 64), ((2.0, 2.0), 128),
                                 ((2.008, 2.008), 64),
                                 ((2.008, 2.008), 128)])
def test_constant_state_exact(c, n):
    """f = 0 with Dirichlet 1 on the interface: the discrete solution must
    be EXACTLY 1 on every wet cell (the regression had 5-16% errors)."""
    mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))
    cap = pt.compute_capacity(_disk(c, 1.0), mesh, p=4, s=1)
    ops = pt.make_diffusion_ops(cap)
    phase = pt.Phase(cap, ops, 0.0, 1.0)
    bc0 = pt.Dirichlet(0.0)
    s = DiffusionSteadyMono(phase, pt.BorderConditions(
        {k: bc0 for k in ("left", "right", "top", "bottom")}),
        pt.Dirichlet(1.0))
    s.solve(method="bicgstab", tol=1e-13, maxiter=8000)
    u = np.asarray(s.x_omega)
    V = np.asarray(cap.V)
    dev = np.abs(u - 1.0)[V > 1e-14].max()
    assert dev < 1e-9, dev


def test_constant_state_exact_annulus():
    c, ri, ro, n = (2.008, 2.008), 0.5, 1.5, 96

    def ann(x, y):
        r = jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2)
        return jnp.maximum(ri - r, r - ro)

    mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))
    cap = pt.compute_capacity(ann, mesh, p=4, s=1)
    ops = pt.make_diffusion_ops(cap)
    phase = pt.Phase(cap, ops, 0.0, 1.0)
    bc0 = pt.Dirichlet(0.0)
    s = DiffusionSteadyMono(phase, pt.BorderConditions(
        {k: bc0 for k in ("left", "right", "top", "bottom")}),
        pt.Dirichlet(2.5))
    s.solve(method="bicgstab", tol=1e-13, maxiter=8000)
    u = np.asarray(s.x_omega)
    V = np.asarray(cap.V)
    dev = np.abs(u - 2.5)[V > 1e-14].max()
    assert dev < 1e-8, dev


def test_constant_state_exact_band_path():
    """The narrow-band capacity path applies the same consistency rules."""
    c, n = (2.008, 2.008), 64
    mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))
    cap = pt.compute_capacity(_disk(c, 1.0), mesh, p=4, s=1,
                              band_budget=2048)
    ops = pt.make_diffusion_ops(cap)
    phase = pt.Phase(cap, ops, 0.0, 1.0)
    bc0 = pt.Dirichlet(0.0)
    s = DiffusionSteadyMono(phase, pt.BorderConditions(
        {k: bc0 for k in ("left", "right", "top", "bottom")}),
        pt.Dirichlet(1.0))
    s.solve(method="bicgstab", tol=1e-13, maxiter=8000)
    u = np.asarray(s.x_omega)
    V = np.asarray(cap.V)
    dev = np.abs(u - 1.0)[V > 1e-14].max()
    assert dev < 1e-9, dev
