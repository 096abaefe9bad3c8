"""Frank-disk parametric study: accuracy of the front-tracking Stefan
solver over mesh resolution, marker count and interface smoothing —
reference examples/2D/StefanFT/tests/parame_frank.jl:1-638.

The reference sweeps (mesh size, n_markers, smoothing factor, window
size) over the growing Frank disk and tabulates the radius error vs the
similarity solution R(t) = S√t.  Same study here, with gates the
reference lacks: the radius error shrinks as the mesh refines, every
configuration stays round, and the smoothing variants agree with the
unsmoothed baseline to a fraction of a cell (smoothing must not bias the
front).

Run:  python examples/2D/frank_disk_param_sweep.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp
from scipy.special import exp1

import penguin_tpu as pt
from penguin_tpu.front_tracking import FrontTracker
from penguin_tpu.solvers.stefan2d import StefanMono2D

S = 1.0
St = (S ** 2 / 4) * np.exp(S ** 2 / 4) * exp1(S ** 2 / 4)
T_inf = -St
L, center = 8.0, (4.0, 4.0)
t0 = 1.0
T_span = 0.1
R0 = S * np.sqrt(t0)


def T_analytic(x, y, t):
    r = np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2)
    s = r / np.sqrt(t)
    val = T_inf * (1 - exp1(np.maximum(s ** 2 / 4, 1e-12))
                   / exp1(S ** 2 / 4))
    return np.where(s >= S, val, 0.0)


def run(n, nm, smooth_window=0, smooth_passes=0):
    # refine TIME with the mesh: BE is O(dt) and at fixed dt the temporal
    # error (~0.6% radius at dt=0.02) dominates past n~32, hiding any
    # spatial refinement gain (measured)
    dt = 0.02 * 32 / n
    n_steps = int(round(T_span / dt))
    mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    front = FrontTracker().create_circle(center, R0, n=nm)
    cap0 = pt.compute_capacity(lambda x, y: -front.sdf(x, y), mesh,
                               p=4, s=1)
    C = np.asarray(cap0.C_om)
    Tw0 = jnp.asarray(T_analytic(C[..., 0], C[..., 1], t0))
    bc_b = pt.BorderConditions({k: pt.Dirichlet(float(T_inf))
                                for k in ("left", "right", "top",
                                          "bottom")})
    phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0),
                     lambda x, y, z, t: 0.0, 1.0)
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, 1.0))
    solver = StefanMono2D(phase, bc_b, pt.Dirichlet(0.0), dt,
                          (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE")
    kw = dict(newton_params=(12, 1e-4, 1e-6, 1.0), interior_fluid=False,
              method="bicgstab", p=4, s=1, jac="intercept")
    if smooth_window:
        kw.update(smooth_window=smooth_window, smooth_passes=smooth_passes)
    solver.solve(front, 0.0, n_steps * dt - dt / 2, ic, **kw)
    mk = np.asarray(solver.markers)
    radii = np.sqrt((mk[:, 0] - center[0]) ** 2
                    + (mk[:, 1] - center[1]) ** 2)
    n_solves = solver.residual_log.shape[0]
    R_exact = S * np.sqrt(t0 + n_solves * dt)
    return (abs(radii.mean() - R_exact) / R_exact,
            radii.std() / radii.mean(), L / n)


print(f"Frank disk, BE to t0+{T_span} with dt ~ h (rel radius error vs "
      f"S*sqrt(t)):")
print("  -- mesh-resolution sweep (markers scale with the mesh) --")
err_by_n = {}
for n, nm in ((32, 48), (48, 64), (64, 96)):
    err, rnd, h = run(n, nm)
    err_by_n[n] = err
    print(f"  n={n:3d} nm={nm:3d}: rel err {err:.4f}  roundness {rnd:.4f}")
    assert rnd < 0.03, (n, rnd)

assert err_by_n[64] < err_by_n[32], err_by_n  # refinement helps
assert err_by_n[64] < 0.04, err_by_n

print("  -- smoothing sweep at n=48, nm=64 --")
base_err, _, h48 = run(48, 64)
for (w, p_) in ((3, 1), (5, 1), (5, 2)):
    err, rnd, _ = run(48, 64, smooth_window=w, smooth_passes=p_)
    print(f"  window={w} passes={p_}: rel err {err:.4f} "
          f"(baseline {base_err:.4f})")
    # smoothing must not bias the mean radius by more than ~1/4 cell
    assert abs(err - base_err) * R0 < 0.25 * h48, (w, p_, err, base_err)
print("OK")
