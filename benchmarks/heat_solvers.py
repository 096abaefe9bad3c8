"""Linear-solver comparison on the standard heated-disk system —
reference benchmark/BenchmarkHeatSol.jl (BenchmarkHeatIterative): time
the direct and Krylov paths on one implicit heat step and check they
agree.

The system is the 80x80 cut-cell disk (radius 1 at (2.01, 2.01) on
[0,4]^2) with interface Dirichlet 1, BE step dt = 0.5 h^2 — the same
setup as the Scalar_2D heat benchmarks.

Run:  python benchmarks/heat_solvers.py           (ambient backend)
      python benchmarks/heat_solvers.py --cpu     (force CPU f64)
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

if "--cpu" in _sys.argv:
    from benchmarks.phaseflow.harness import ensure_cpu_f64
    ensure_cpu_f64()

import time

import numpy as np
import jax
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyMono

n, L = 80, 4.0
h = L / n
c = (2.01, 2.01)
mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))


def disk(x, y):
    return jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2) - 1.0


cap = pt.compute_capacity(disk, mesh, p=4, s=1)
ops = pt.make_diffusion_ops(cap)
bc0 = pt.Dirichlet(0.0)
bc_b = pt.BorderConditions({k: bc0 for k in
                            ("left", "right", "top", "bottom")})
phase = pt.Phase(cap, ops, 0.0, 1.0)
dt = 0.5 * h * h
t_end = 20.5 * dt

results = {}
for method in ("direct", "cg", "bicgstab", "gmres"):
    u0 = (jnp.zeros(mesh.np_shape), jnp.zeros(mesh.np_shape))
    s = DiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(1.0), dt, u0, "BE")
    t0 = time.time()
    try:
        s.solve(t_end, method=method, tol=1e-10, maxiter=4000)
        jax.block_until_ready(s.x[0])
    except Exception as exc:  # a method genuinely unsupported -> report
        print(f"{method:>9s}: FAILED ({type(exc).__name__}: {exc})")
        continue
    wall = time.time() - t0
    results[method] = np.asarray(s.x[0])
    extra = ""
    if hasattr(s, "krylov_iters") and s.krylov_iters is not None:
        try:
            extra = (f"  iters={int(np.asarray(s.krylov_iters).sum())}"
                     f" relres={float(np.asarray(s.krylov_relres).max()):.1e}")
        except Exception:
            pass
    print(f"{method:>9s}: {wall:6.2f} s{extra}")

ref = results.get("direct", next(iter(results.values())))
V = np.asarray(cap.V)
sel = V > 1e-14
for m, x in results.items():
    dev = float(np.abs(x - ref)[sel].max())
    print(f"{m:>9s}: max|x - direct| = {dev:.2e}")
    assert dev < 1e-6, (m, dev)
print("all solvers agree on the heated-disk step")
