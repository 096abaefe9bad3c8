"""Condition-number sweep for the cut-cell Poisson system (re-design of
/root/reference/scripts/conditioning_poisson.jl): materialize the masked
operator for a sweep of mesh sizes and report cond(A) and extreme
eigenvalues of the active block.

Run:  python scripts/conditioning_poisson.py
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


def conditioning(n):
    mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.circle((2.0, 2.0), 1.0), mesh)
    ops = pt.make_diffusion_ops(cap)
    bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                                for k in ("left", "right", "top", "bottom")})
    solver = DiffusionSteadyMono(pt.Phase(cap, ops, lambda x, y, z: 1.0, 1.0),
                                 bc_b, pt.Dirichlet(0.0))
    b = solver._rhs()
    A, _ = materialize_dense(solver.apply, b)
    A = np.asarray(A)
    # restrict to the active (non-identity) block
    ident = (np.abs(A).sum(1) == 1.0) & (np.diagonal(A) == 1.0)
    keep = ~ident
    Ak = A[np.ix_(keep, keep)]
    s = np.linalg.svd(Ak, compute_uv=False)
    return s.max() / s[s > 1e-14].min(), s.max(), s[s > 1e-14].min()


if __name__ == "__main__":
    for n in (10, 20, 40):
        c, smax, smin = conditioning(n)
        print(f"n={n:3d}  cond={c:.4e}  smax={smax:.3e}  smin={smin:.3e}")
