"""Condition-number sweeps for the two-phase 1D system and the 3D Poisson
system, plus a spectrum dump (re-designs of
/root/reference/scripts/conditioning_3D_poisson_2ph.jl and
print_poisson_spectrum.jl).

Run:  python scripts/conditioning_diph_3d.py
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
from penguin_tpu.solvers import DiffusionSteadyDiph, DiffusionSteadyMono


def _active_cond(apply_fn, template, spectrum=False):
    A, _ = materialize_dense(apply_fn, template)
    A = np.asarray(A)
    ident = (np.abs(A).sum(1) == 1.0) & (np.diagonal(A) == 1.0)
    Ak = A[np.ix_(~ident, ~ident)]
    s = np.linalg.svd(Ak, compute_uv=False)
    smin = s[s > 1e-14].min()
    if spectrum:
        print("  spectrum (10 largest):", np.round(s[:10], 4))
        print("  spectrum (10 smallest nonzero):",
              np.round(s[s > 1e-14][-10:], 6))
    return s.max() / smin, s.max(), smin


def diph_1d(n):
    mesh = pt.Mesh((n,), (8.0,), (0.0,))
    cap1 = pt.compute_capacity(pt.geometry.halfspace(0, 4.0), mesh)
    cap2 = pt.compute_capacity(pt.geometry.halfspace(0, 4.0, -1.0), mesh)
    ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z: 1.0, 1.0)
    ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z: 1.0, 2.0)
    bc_b = pt.BorderConditions({"top": pt.Dirichlet(0.0),
                                "bottom": pt.Dirichlet(1.0)})
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 0.5, 0.0),
                                pt.FluxJump(1.0, 1.0, 0.0))
    s = DiffusionSteadyDiph(ph1, ph2, bc_b, ic)
    return _active_cond(s.apply, s._rhs())


def poisson_3d(n):
    mesh = pt.Mesh((n, n, n), (4.0, 4.0, 4.0), (0.0, 0.0, 0.0))
    cap = pt.compute_capacity(
        pt.geometry.sphere((2.0, 2.0, 2.0), 1.0), mesh)
    ops = pt.make_diffusion_ops(cap)
    bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0) for k in
                                ("left", "right", "top", "bottom",
                                 "backward", "forward")})
    s = DiffusionSteadyMono(pt.Phase(cap, ops, lambda x, y, z: 1.0, 1.0),
                            bc_b, pt.Dirichlet(0.0))
    return _active_cond(s.apply, s._rhs(), spectrum=(n == 8))


if __name__ == "__main__":
    print("two-phase 1D Poisson (Henry jump rows):")
    for n in (20, 40, 80):
        c, smax, smin = diph_1d(n)
        print(f"  n={n:3d}  cond={c:.4e}  smax={smax:.3e}  smin={smin:.3e}")
    print("3D Poisson in a sphere:")
    for n in (8, 12, 16):
        c, smax, smin = poisson_3d(n)
        print(f"  n={n:3d}  cond={c:.4e}  smax={smax:.3e}  smin={smin:.3e}")
