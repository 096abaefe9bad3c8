"""Spectrum printer for the 1D cut-cell Poisson system over mesh sizes
and diffusivity magnitudes — re-design of
/root/reference/scripts/print_poisson_spectrum.jl:1-50 (CSV of
lambda_min / lambda_max / cond2 of the active block) and the
diffusivity-ratio axis of conditioning_sweep.jl.

The matrix-free operator is densified by basis probing
(linsolve.materialize_dense), inert/identity rows are excluded, and the
eigen-extrema of the symmetrized active block are printed as CSV.

Run:  python scripts/poisson_spectrum.py
"""

import sys

sys.path.insert(0, ".")
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import penguin_tpu as pt
from penguin_tpu.linsolve import materialize_dense
from penguin_tpu.solvers import DiffusionSteadyMono

lx, center, radius = 1.0, 0.5, 0.21
body = pt.geometry.complement(
    lambda x: abs(x - center) - radius) if False else (
    lambda x: abs(x - center) - radius)  # solid rod segment, fluid outside

print("scheme,nx,D,lambda_min,lambda_max,cond2,n_active")
rows = []
for nx in (8, 16, 32):
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    cap = pt.compute_capacity(body, mesh)
    ops = pt.make_diffusion_ops(cap)
    for D in (1.0, 10.0, 100.0):
        phase = pt.Phase(cap, ops, lambda x, y, z: x, float(D))
        bc0 = pt.Dirichlet(0.0)
        bc_b = pt.BorderConditions({"bottom": bc0, "top": bc0})
        solver = DiffusionSteadyMono(phase, bc_b, pt.Dirichlet(0.0))
        A, _ = materialize_dense(solver.apply, solver._rhs())
        A = np.asarray(A)
        # active block: rows that are not inert identity (A e_i = e_i)
        n = A.shape[0]
        ident = np.array([abs(A[i, i] - 1.0) < 1e-12
                          and np.abs(A[i]).sum() - abs(A[i, i]) < 1e-12
                          for i in range(n)])
        act = ~ident
        Aa = A[np.ix_(act, act)]
        Asym = 0.5 * (Aa + Aa.T)
        ev = np.linalg.eigvalsh(Asym)
        lmin, lmax = abs(ev).min(), abs(ev).max()
        print(f"poisson,{nx},{D},{lmin:.6e},{lmax:.6e},"
              f"{lmax / lmin:.6e},{act.sum()}")
        rows.append((nx, D, lmax / lmin))

# sanity gates: conditioning grows with mesh refinement; a UNIFORM
# diffusivity rescales both eigen-extrema identically so cond2 is
# D-invariant (the diphasic ratio study is scripts/conditioning_diph_3d)
by = {(nx, D): c for nx, D, c in rows}
assert by[(32, 1.0)] > by[(8, 1.0)]
assert abs(by[(16, 100.0)] / by[(16, 1.0)] - 1.0) < 1e-8
print("# gates OK: cond grows under refinement; uniform-D scale-invariant")
