"""Diffusivity-ratio × mesh-size conditioning sweep for the 1D diphasic
cut-cell system (re-design of /root/reference/scripts/conditioning_sweep.jl:
ratios D2/D1 in {1, 10, 100} × nx in {8, 16, 32}, interface at x = 4.05 so
the cut lands off-lattice; reports lambda_min / lambda_max / cond2 of the
active block, mirroring the reference's trimmed-matrix stats).

Run:  python scripts/conditioning_sweep.py
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
from penguin_tpu.solvers import DiffusionSteadyDiph

LX, XINT = 8.0, 4.05


def _active_cond(apply_fn, template):
    A, _ = materialize_dense(apply_fn, template)
    A = np.asarray(A)
    ident = (np.abs(A).sum(1) == 1.0) & (np.diagonal(A) == 1.0)
    Ak = A[np.ix_(~ident, ~ident)]
    s = np.linalg.svd(Ak, compute_uv=False)
    smin = s[s > 1e-14].min()
    return s.max() / smin, s.max(), smin


def stats(nx, ratio):
    mesh = pt.Mesh((nx,), (LX,), (0.0,))
    cap1 = pt.compute_capacity(pt.geometry.halfspace(0, XINT), mesh)
    cap2 = pt.compute_capacity(pt.geometry.halfspace(0, XINT, -1.0), mesh)
    ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1),
                   lambda x, y, z: 0.0, 1.0)
    ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2),
                   lambda x, y, z: 0.0, float(ratio))
    bc_b = pt.BorderConditions({"top": pt.Dirichlet(1.0),
                                "bottom": pt.Dirichlet(0.0)})
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, 0.0))
    s = DiffusionSteadyDiph(ph1, ph2, bc_b, ic)
    return _active_cond(s.apply, s._rhs())


print(f"{'nx':>4} {'D2/D1':>7} {'lambda_max':>12} {'lambda_min':>12} "
      f"{'cond2':>12}")
conds = {}
for ratio in (1.0, 10.0, 100.0):
    for nx in (8, 16, 32):
        c, smax, smin = stats(nx, ratio)
        conds[(nx, ratio)] = c
        print(f"{nx:>4} {ratio:>7.1f} {smax:>12.4e} {smin:>12.4e} "
              f"{c:>12.4e}")

# sanity gates: conditioning grows with both mesh refinement and the
# diffusivity contrast, and stays finite/solvable throughout
for ratio in (1.0, 10.0, 100.0):
    assert conds[(32, ratio)] > conds[(8, ratio)], ratio
for nx in (8, 16, 32):
    assert conds[(nx, 100.0)] > conds[(nx, 1.0)], nx
assert all(np.isfinite(v) for v in conds.values())
print("conditioning sweep OK")
