"""3D cut-cell BE heat step scaling (the 3D analogue of the north-star
bench): ms/step and first-step CG iterations vs grid size, embedded
sphere, f32.  FastHeatBE auto-dispatches to the 7-point Pallas stencil
when tile padding is cheap (solvers/heat_fast.py); this records the full
implicit-step cost that the roofline table's per-matvec numbers feed.

Reference analogue: benchmark/Heat3D.jl (accuracy only — the reference
publishes no timings).

Run:  python benchmarks/heat_scaling3d.py [max_n]   (writes heat_scaling3d.csv)
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import csv
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.heat_fast import FastHeatBE

max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
rows = []
for n in (64, 128, 192, 256):
    if n > max_n:
        break
    L = 4.0
    mesh = pt.Mesh((n, n, n), (L, L, L), (0.0, 0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.sphere((2.0, 2.0, 2.0), 1.5), mesh,
                              p=4, s=1, dtype=jnp.float32)
    ops = pt.make_diffusion_ops(cap)
    bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                                for k in ("left", "right", "top", "bottom",
                                          "backward", "forward")})
    dt = 0.25 * (L / n) ** 2
    be = FastHeatBE(cap, ops, 1.0, lambda x, y, z: 0.0, pt.Dirichlet(1.0),
                    bc_b, dt, cg_tol=1e-6, cg_maxiter=32)
    T = jnp.zeros(mesh.np_shape, jnp.float32)
    _, iters = be.step(T)
    # differenced loop lengths + scalar-read sync (see _timing.py: naive
    # block_until_ready timings through the tunnel measure dispatch only)
    n_lo, n_hi = (200, 2000) if n <= 64 else (20, 200) if n <= 128 else (10, 60)
    from _timing import per_step_ms, sync_scalar
    run = lambda k: be.run(T, k)
    sync_scalar(run(n_lo)); sync_scalar(run(n_hi))  # compile + settle
    ms = per_step_ms(run, n_lo, n_hi)
    print(f"n={n}^3: {ms:.3f} ms/step (pallas={be.use_pallas}, "
          f"first-step CG iters={int(iters)})", flush=True)
    rows.append((n, ms, int(iters)))
    del be, cap, ops, T
    jax.clear_caches()

out = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                    "heat_scaling3d.csv")
with open(out, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["n", "ms_per_step", "cg_iters_first"])
    w.writerows(rows)
print(f"wrote {out}")
