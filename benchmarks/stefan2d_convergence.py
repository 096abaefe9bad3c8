"""2D Stefan front-tracking mesh-refinement study on the Frank disk.

Simultaneous (h, markers, dt) refinement of the flagship GN/LM front-
tracking solver against the exact similarity solution R(t) = S sqrt(t):
grid n x n with nm = n/2 markers (spacing ~1.6 h — inside the stable
window, see below) and dt = 0.64/n, integrating the same physical
interval [t0, t0 + 0.1] from the exact initial field.  Reports the
end-time radius error |mean(R_markers) - R_exact| and the roundness
(marker-radius std).

WHAT THE SCHEME ACTUALLY DELIVERS (measured, f64):

    n=24  nm=12  dt=0.0267   err 0.0095   roundness 0.0066
    n=32  nm=16  dt=0.0200   err 0.0228   roundness 0.0144
    n=48  nm=24  dt=0.0133   err 0.0305   roundness 0.0393
    n=64  nm=32  dt=0.0100   err 0.0034   roundness 0.0133

i.e. radius accuracy bounded at 0.3-3.1% of R across the sweep with NO
clean convergence order.  This is not protocol luck — three protocols
were measured:

- nm = n (spacing 1.57 h .. but >=1 marker/grid-cell by n=64): errors
  0.04-0.08 with rough fronts (roundness 0.08-0.18) — an over-sampled
  marker chain makes the per-cell volume Jacobian rows nearly dependent
  and the damped GN oscillates;
- nm = n/2 at FIXED dt=0.02 (pure spatial refinement): 0.0077 / 0.0228 /
  0.0020 / 0.0021 — n=32 stays an outlier at the same marker/cell ratio
  that is clean at 24/48/64;
- over-tight GN tolerances degrade rather than help: at n=32/nm=32,
  newton_params (12,1e-4,1e-6) gives 0.0007 where (16,1e-6,1e-8) gives
  0.075 with an oscillating step (each GN iteration applies displacement
  smoothing + a marker move; beyond the flux-balance noise floor the
  iteration chases quadrature noise).

Conclusion (the honest capstone): the radius error is dominated by
MARKER-GRID COUPLING — which cells the chain's kinks land in — not by h,
so refinement rearranges rather than shrinks it until the front is well
resolved (n=64: 0.3%).  The gates below pin the measured envelope and the
finest-level accuracy instead of asserting an order the scheme does not
have.  The 1D Stefan study (stefan1d_convergence.py) shows the clean
order the underlying space-time scheme delivers when no marker chain is
involved; the reference has no 2D FT convergence study at all
(/root/reference/examples/2D/StefanFT/ validates at fixed grids only).

Writes benchmarks/stefan2d_convergence.csv.

Run:  python benchmarks/stefan2d_convergence.py            (24..48)
      python benchmarks/stefan2d_convergence.py --fine     (+64)
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from benchmarks.phaseflow.harness import ensure_cpu_f64

ensure_cpu_f64()

import csv
import time

import numpy as np
import jax.numpy as jnp
from scipy.special import exp1

import penguin_tpu as pt
from penguin_tpu.front_tracking import FrontTracker
from penguin_tpu.solvers.stefan2d import StefanMono2D

S = 1.0
St = (S**2 / 4) * np.exp(S**2 / 4) * exp1(S**2 / 4)
T_inf = -St
L, center = 8.0, (4.0, 4.0)
t0, T_span = 1.0, 0.1
R0 = S * np.sqrt(t0)


def run(n):
    mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    dt = 0.64 / n
    nm = n // 2
    front = FrontTracker().create_circle(center, R0, n=nm)
    cap0 = pt.compute_capacity(lambda x, y: -front.sdf(x, y), mesh,
                               p=4, s=1)
    C = np.asarray(cap0.C_om)
    r = np.sqrt((C[..., 0] - center[0]) ** 2 + (C[..., 1] - center[1]) ** 2)
    s_ = r / np.sqrt(t0)
    Tw0 = jnp.asarray(np.where(
        s_ >= S,
        T_inf * (1 - exp1(np.maximum(s_**2 / 4, 1e-12)) / exp1(S**2 / 4)),
        0.0))
    bc_b = pt.BorderConditions({k: pt.Dirichlet(float(T_inf))
                                for k in ("left", "right", "top", "bottom")})
    phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0),
                     lambda x, y, z, t: 0.0, 1.0)
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, 1.0))
    solver = StefanMono2D(phase, bc_b, pt.Dirichlet(0.0), dt,
                          (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE")
    # production GN params (see module docstring: tighter ones DEGRADE)
    solver.solve(front, 0.0, T_span - dt / 2, ic,
                 newton_params=(12, 1e-4, 1e-6, 1.0),
                 interior_fluid=False, method="bicgstab", p=4, s=1)
    mk = np.asarray(solver.markers)
    radii = np.sqrt((mk[:, 0] - center[0]) ** 2
                    + (mk[:, 1] - center[1]) ** 2)
    n_steps = len(solver.residual_log)
    R_exact = S * np.sqrt(t0 + n_steps * dt)
    return (abs(radii.mean() - R_exact), float(radii.std()),
            float(np.abs(np.asarray(solver.residual_log)).max()))


sizes = (24, 32, 48) + ((64,) if "--fine" in _sys.argv else ())
rows = []
for n in sizes:
    t_w = time.time()
    err, rough, res = run(n)
    print(f"n={n:3d} (nm={n // 2}, dt={0.64 / n:.4f}): |R - R_exact| = "
          f"{err:.5f}  roundness {rough:.5f}  max res {res:.2e} "
          f"[{time.time() - t_w:.0f} s]")
    rows.append((n, err, rough))

out = _os.path.join(_os.path.dirname(__file__), "stefan2d_convergence.csv")
with open(out, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["n", "radius_err", "roundness_std"])
    w.writerows(rows)
print(f"wrote {out}")

# gates: the measured accuracy ENVELOPE (see module docstring for why an
# order gate would misrepresent the scheme)
for n, err, rough in rows:
    assert err < 0.035, (n, err)
    assert rough < 0.05, (n, rough)
if sizes[-1] == 64:
    assert rows[-1][1] < 0.01, rows[-1]
print("OK")
