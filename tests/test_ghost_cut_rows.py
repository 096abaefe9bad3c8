"""Opt-in Gibou-style ghost cut rows for StokesMono (cut_row="ghost").

Measured verdict (Taylor-Couette annulus, f64): replacing sliver momentum
rows (wet fraction < 0.5) with quadratic one-sided extrapolation rows
along the interface normal gives a REGULAR, Krylov-solvable system whose
profile error is ~1.5x the native cut-FV rows (n=32/64/128:
0.026/0.011/0.024 ghost vs 0.021/0.0066/0.015 center).  This rules out
the sliver-row local truncation as the source of the Couette error
plateau documented in ARCHITECTURE.md — the plateau survives row
replacement, so the bias is broader than any single cut row.  The
feature stays available (it is the standard remedy when sliver rows
destabilize, e.g. under convection) but is not the default.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import StokesMono, PinPressureGauge

ri, ro, Om = 0.5, 1.5, 1.0
A = -Om * ri**2 / (ro**2 - ri**2)
B = Om * ri**2 * ro**2 / (ro**2 - ri**2)
c = (2.0 + 0.008, 2.0 + 0.008)


def _solve(n, cut_row):
    L = 4.0
    d = L / n
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    annulus = lambda x, y: jnp.maximum(
        ri - jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2),
        jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2) - ro)
    caps = [pt.compute_capacity(annulus, m, p=4, s=1)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0]),
                    pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=1.0, rho=1.0, f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0)
    bc = pt.BorderConditions(
        {k: pt.Dirichlet(0.0) for k in ("left", "right", "bottom", "top")})

    def ug_x(x, y, z, t=None):
        r = jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2)
        return jnp.where(r < 0.5 * (ri + ro), -Om * (y - c[1]), 0.0)

    def ug_y(x, y, z, t=None):
        r = jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2)
        return jnp.where(r < 0.5 * (ri + ro), Om * (x - c[0]), 0.0)

    s = StokesMono(fluid, (bc, bc), PinPressureGauge(),
                   (pt.Dirichlet(ug_x), pt.Dirichlet(ug_y)), cut_row=cut_row)
    s.solve(tol=1e-8)
    ux = np.asarray(s.velocity(0))
    Cy = np.asarray(caps[0].C_om)
    j = np.argmin(np.abs(np.asarray(mesh_ux.nodes[0]) + 0.5 * d - c[0]))
    ys = Cy[j, :, 1]
    r = np.abs(ys - c[1])
    sel = (r > ri + 2 * d) & (r < ro - 2 * d)
    u_th = np.where(ys > c[1], -ux[j, :], ux[j, :])
    exact = A * r + B / np.maximum(r, 1e-12)
    return s, float(np.abs(u_th - exact)[sel].max())


def test_ghost_cut_rows_regular_and_bounded():
    """The ghost-row system must be regular (no orphaned pressure columns
    — the build excludes replaced rows from p_feeds) and its solution
    within ~3x of the center-row error on the rotating annulus (measured
    2.5x at n=48; the point is regularity + row consistency, the accuracy
    comparison lives in the module docstring)."""
    s_c, e_center = _solve(48, "center")
    s_g, e_ghost = _solve(48, "ghost")
    n_ghost = sum(0 if g is None else int(np.asarray(g["cwall"]).size)
                  for g in s_g._ghost)
    assert n_ghost > 0  # the annulus does produce sliver rows
    assert np.isfinite(e_ghost)
    assert e_ghost < 3.5 * e_center + 1e-3, (e_ghost, e_center)
    # the replaced rows hold exactly: residual of the ghost rows at the
    # solution equals the rhs (row surgery is consistent)
    y = s_g.apply_steady(s_g.x)
    b = s_g.rhs_steady()
    for d in range(2):
        g = s_g._ghost[d]
        if g is None:
            continue
        r = np.asarray(y[2 * d]).ravel()[np.asarray(g["gpos"])] \
            - np.asarray(b[2 * d]).ravel()[np.asarray(g["gpos"])]
        assert np.abs(r).max() < 1e-6
