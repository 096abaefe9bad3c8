"""2D steady two-phase Poisson across an embedded circle (reference
examples/2D/Diffusion/Poisson_2ph.jl): inner disk and outer annulus with
different conductivities, value and D-weighted flux continuity at the
interface.  The radially symmetric exact solution (source in the disk,
Dirichlet outer data) is piecewise  T = A - r²/(4 D1)  inside and
T = B ln r + C  outside, matched at r=R.

Run:  python examples/2D/poisson_twophase.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyDiph

nx = ny = 64
lx = ly = 4.0
R = 1.0
ctr = (2.0, 2.0)
D1, D2 = 1.0, 5.0
mesh = pt.Mesh((nx, ny), (lx, ly), (0.0, 0.0))
circle = pt.geometry.circle(ctr, R)
cap1 = pt.compute_capacity(circle, mesh)                       # disk
cap2 = pt.compute_capacity(pt.geometry.complement(circle), mesh)  # annulus
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z: 1.0, D1)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z: 0.0, D2)
bc_b = pt.BorderConditions(
    {k: pt.Dirichlet(0.0) for k in ("left", "right", "top", "bottom")})
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(D1, D2, 0.0))

solver = DiffusionSteadyDiph(ph1, ph2, bc_b, ic)
solver.solve(method="bicgstab", tol=1e-10)

T1 = np.asarray(solver.x[0])
T2 = np.asarray(solver.x[2])
C1 = np.asarray(cap1.C_om)
r1 = np.hypot(C1[..., 0] - ctr[0], C1[..., 1] - ctr[1])
core = (np.asarray(cap1.cell_types) == 1) & (r1 < 0.8 * R)

# radial exact (square outer boundary only perturbs the far field; compare
# deep inside the disk): total source Q = pi R^2; flux at r: q = r/2 D1...
# T1(r) = T1(R) + (R^2 - r^2)/(4 D1);  interface T from the annulus log
# solution with T=0 at r_eff ~ half-width 2.0:
r_out = 2.0
Ti = (np.pi * R**2) / (2 * np.pi * D2) * np.log(r_out / R)
T_ex = Ti + (R**2 - r1**2) / (4 * D1)
err = np.abs(T1[core] - T_ex[core]).max()
print(f"center T = {T1[nx//2, ny//2]:.4f}  radial model = {T_ex[nx//2, ny//2]:.4f}")
print(f"max |T - radial model| deep inside the disk = {err:.3f}")
assert np.isfinite(T1[core]).all()
# the square outer boundary perturbs the log far field by ~10%; the core
# profile must match the radial model to that accuracy
assert err < 0.05, err
print("2D two-phase Poisson matches the radial conduction model")
