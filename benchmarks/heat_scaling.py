"""Cut-cell BE heat step scaling sweep (reference benchmark/
BenchmarkHeatSol.jl + Heat.jl): ms/step and CG iterations vs grid size on
the current backend — writes heat_scaling.csv.

Run:  python benchmarks/heat_scaling.py [max_n]
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

max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
rows = []
for n in (128, 256, 512, 1024, 2048):
    if n > max_n:
        break
    L = 4.0
    mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.circle((2.0, 2.0), 1.5), mesh,
                              p=4, s=1, dtype=jnp.float32)
    ops = pt.make_diffusion_ops(cap)
    bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                                for k in ("left", "right", "top", "bottom")})
    dt = 0.25 * (L / n) ** 2
    be = FastHeatBE(cap, ops, 1.0, lambda x, y, z: 0.0, pt.Dirichlet(1.0),
                    bc_b, dt, cg_tol=1e-6, cg_maxiter=32)
    T = jnp.zeros(mesh.np_shape, jnp.float32)
    _, iters = be.step(T)
    # differenced loop lengths + scalar-read sync (see _timing.py: naive
    # block_until_ready timings through the tunnel measure dispatch only)
    # loop lengths sized so the differenced signal ≫ timing jitter even
    # when the warm-started step costs single-digit microseconds
    n_lo, n_hi = (500, 8000) if n <= 512 else (50, 800) if n <= 1024 else (20, 200)
    from _timing import per_step_ms, sync_scalar
    run = lambda k: be.run(T, k)
    sync_scalar(run(n_lo)); sync_scalar(run(n_hi))  # compile + settle
    ms = per_step_ms(run, n_lo, n_hi)
    rows.append((n, ms, int(iters)))
    print(f"n={n:5d}: {ms:8.3f} ms/step  (first-step CG iters {int(iters)}, "
          f"pallas={'on' if be.use_pallas else 'off'})")

out = _os.path.join(_os.path.dirname(__file__), "heat_scaling.csv")
with open(out, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["n", "ms_per_step", "cg_iters_first"])
    w.writerows(rows)
print(f"wrote {out}")
