"""Lid-driven cavity Re=1000 at 128² vs Ghia et al. (1982) — the
reference's headline NS validation case
(benchmark/navierstokes/lid_driven_cavity_steady.jl:8-22 + ghia/*.ghia).

At this size the saddle point has ~83k unknowns, far past dense
factorization: the matrix-free path time-marches the CN/AB2 unsteady
solver (warm-started GMRES per step, mass-dominated and well-conditioned
for moderate dt) until the flow is statistically steady.

Run (TPU recommended):  python benchmarks/lid_cavity_ghia_re1000.py [n] [t_end]

Recorded results (TPU v5e, f32, steady JFNK over jvp with the robust
fgmres/DCT-Schur inner solves + ghost wall rows; errors at Ghia's
tabulated points, the standard comparison; wall times are WARM-cache —
cold compile adds minutes, docs/BENCHMARKS.md "Cold-start honesty"):
- 128²: ~53 s wall;  max|u-ghia| = 0.0533, max|v-ghia| = 0.0591,
  min u = -0.356 (Ghia -0.38289)
- 256²: ~2-3 min wall;  max|u-ghia| = 0.0144, max|v-ghia| = 0.0065,
  min u = -0.3779, max v = +0.3655 (Ghia -0.38289 / +0.37095)
  (round-3 Chebyshev-path record 0.0145/0.0046-0.0074 — f32 run-to-run
  drift; the Chebyshev inner solver is faster when it works but stalls
  host-dependently, so the robust path is the default)
The 128² -> 256² error drop (x3.7 in u, x12 in v) demonstrates mesh
convergence to the Ghia profile well inside the 0.02 target; the 128²
residue is wall/cut discretization, not solver error.  (Round 1 needed
281 s of time marching at 128² for a worse profile.)  Note: f64 is
emulated on v5e and crashes the TPU worker at this size; run f64
variants on CPU.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))) if "examples" in __file__ else _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

# Ghia, Ghia & Shin (1982), Table I/II, Re=1000
GHIA_Y = np.array([0.0, 0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813,
                   0.4531, 0.5, 0.6172, 0.7344, 0.8516, 0.9531, 0.9609,
                   0.9688, 0.9766, 1.0])
GHIA_U = np.array([0.0, -0.18109, -0.20196, -0.22220, -0.29730, -0.38289,
                   -0.27805, -0.10648, -0.06080, 0.05702, 0.18719, 0.33304,
                   0.46604, 0.51117, 0.57492, 0.65928, 1.0])
GHIA_X = np.array([0.0, 0.0625, 0.0703, 0.0781, 0.0938, 0.1563, 0.2266,
                   0.2344, 0.5, 0.8047, 0.8594, 0.9063, 0.9453, 0.9531,
                   0.9609, 0.9688, 1.0])
GHIA_V = np.array([0.0, 0.27485, 0.29012, 0.30353, 0.32627, 0.37095,
                   0.33075, 0.32235, 0.02526, -0.31966, -0.42665, -0.51550,
                   -0.39188, -0.33714, -0.27669, -0.21388, 0.0])


def run(n=128, t_end=30.0, Re=1000.0, dt=2.5e-3, dtype=None):
    L = 1.0
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    d = L / n
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    body = pt.geometry.full_domain(2)
    dtype = dtype or jnp.float32
    caps = [pt.compute_capacity(body, m, p=4, s=1, dtype=dtype)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=1.0 / Re, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    noslip, lid = pt.Dirichlet(0.0), pt.Dirichlet(1.0)
    bc_ux = pt.BorderConditions(
        {"left": noslip, "right": noslip, "bottom": noslip, "top": lid})
    bc_uy = pt.BorderConditions(
        {k: noslip for k in ("left", "right", "bottom", "top")})
    s = NavierStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                         pt.Dirichlet(0.0), wall_row="ghost")

    t0 = time.time()
    if t_end <= 0:
        # steady path (default): JFNK with block-Schur-preconditioned
        # GMRES(100) over jvp — |R| 1e1 -> f32 floor ~5e-7 in ~24 s at
        # 128² on one v5e chip (the time-marching path below needed 281 s)
        s.solve_steady_newton_krylov(max_iter=30, tol=1e-12,
                                     lin_maxiter=800, picard_warmup=0)
        print(f"JFNK steady: wall={time.time() - t0:.1f}s  residuals="
              + " ".join("%.1e" % r for r in s.residual_history), flush=True)
    else:
        x = None
        chunk = 2.0
        t = 0.0
        while t < t_end - 1e-9:
            span = min(chunk, t_end - t)
            x = s.solve_unsteady(dt, span, scheme="CN", method="pbicgstab",
                                 x0=x,
                                 tol=1e-6 if dtype == jnp.float32 else 1e-10,
                                 maxiter=300)
            iters = getattr(s, "krylov_iters", None)
            t += span
            ux = np.asarray(s.velocity(0))
            it_msg = (f"  krylov its/step={iters.mean():.1f}"
                      if iters is not None else "")
            print(f"t={t:5.1f}  wall={time.time() - t0:7.1f}s  "
                  f"min centerline u={ux[n // 2, :n].min():+.4f}{it_msg}",
                  flush=True)

    ux = np.asarray(s.velocity(0))
    uy = np.asarray(s.velocity(1))
    # ux DOF j sits at y=(j+0.5)h = mesh_ux.nodes[1][j] (empirically pinned
    # by profile symmetry of the body-force channel; no-slip row at the
    # first cell center)
    ys = np.asarray(mesh_ux.nodes[1])[:n]
    xs = np.asarray(mesh_uy.nodes[0])[:n]
    u_c = ux[n // 2, :n]
    v_c = uy[:n, n // 2]
    u_g = np.interp(ys, GHIA_Y, GHIA_U)
    v_g = np.interp(xs, GHIA_X, GHIA_V)
    print("\ny, u_sim, u_ghia (vertical centerline):")
    for yy, us, ug in zip(ys[::8], u_c[::8], u_g[::8]):
        print(f"  {yy:.3f}  {us:+.4f}  {ug:+.4f}")
    # two error conventions:
    #  (a) interpolate the sparse Ghia table onto the dense sim grid —
    #      includes the table's own linear-interpolation error inside the
    #      lid boundary layer (Ghia tabulates only 17 points);
    #  (b) interpolate the dense sim profile at Ghia's own tabulated
    #      points — the standard comparison (what the published cavity
    #      literature reports).
    u_at_g = np.interp(GHIA_Y, ys, u_c, left=0.0, right=1.0)
    v_at_g = np.interp(GHIA_X, xs, v_c, left=0.0, right=0.0)
    err_u_tab = np.abs(u_at_g[1:-1] - GHIA_U[1:-1]).max()
    err_v_tab = np.abs(v_at_g[1:-1] - GHIA_V[1:-1]).max()
    print(f"\nmax|u - ghia| = {np.abs(u_c - u_g).max():.4f}   "
          f"max|v - ghia| = {np.abs(v_c - v_g).max():.4f}   "
          "(Ghia table interpolated onto sim grid)")
    print(f"max|u - ghia| = {err_u_tab:.4f}   "
          f"max|v - ghia| = {err_v_tab:.4f}   "
          "(sim interpolated at Ghia's tabulated points)")
    print(f"min u = {u_c.min():+.4f} (Ghia: -0.38289)   "
          f"max v = {v_c.max():+.4f} (Ghia: +0.37095)")
    return u_c, v_c, err_u_tab, err_v_tab


if __name__ == "__main__":
    # default: steady JFNK (t_end <= 0); pass a positive t_end for the
    # time-marching variant
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    t_end = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    run(n=n, t_end=t_end)
