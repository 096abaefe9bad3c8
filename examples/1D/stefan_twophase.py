"""1D two-phase Stefan (melting with an undercooled solid) vs the analytic
similarity solution — reference examples/1D/LiquidMoving/stefan_2ph.jl and
benchmark/Stefan_1d_2ph.jl.

Run:  python examples/1D/stefan_twophase.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp
from scipy.special import erf, erfc

import penguin_tpu as pt
from penguin_tpu.solvers.stefan1d import (
    MovingLiquidDiffusionUnsteadyDiph,
    find_lambda_stefan_two_phase,
)

st_l, st_s, rhoL = 1.0, 0.2, 1.0
T_l0, T_s0 = st_l * rhoL, -st_s * rhoL
lam = find_lambda_stefan_two_phase(st_l, st_s)

nx, lx = 64, 2.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
dt, t_start, t_end = 1e-3, 0.05, 0.09
xf0 = 2 * lam * np.sqrt(t_start)

cap1 = pt.compute_capacity(pt.geometry.halfspace(0, xf0), mesh)
cap2 = pt.compute_capacity(pt.geometry.halfspace(0, xf0, -1.0), mesh)
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z, t: 0.0, 1.0)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z, t: 0.0, 1.0)
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(T_l0), "top": pt.Dirichlet(T_s0)})
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(1.0, 1.0, rhoL))

C = np.asarray(cap1.C_om[..., 0])
T1w = jnp.asarray(np.where(C <= xf0, T_l0 * (1 - erf(C / (2 * np.sqrt(t_start))) / erf(lam)), 0.0))
T2w = jnp.asarray(np.where(C >= xf0, T_s0 * (1 - erfc(C / (2 * np.sqrt(t_start))) / erfc(lam)), 0.0))
z = jnp.zeros(mesh.np_shape)
solver = MovingLiquidDiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, dt,
                                           (T1w, z, T2w, z), mesh, "BE")
solver.solve(xf0, t_start, t_end, newton_params=(200, 1e-10, 1e-10, 1.0), p=6, s=1)

n_solves = len(solver.xf_log)
s_exact = 2 * lam * np.sqrt(t_start + n_solves * dt)
print(f"front: computed {solver.xf:.4f}, analytic {s_exact:.4f}, "
      f"error {abs(solver.xf - s_exact):.4f} (gate < 0.02)")
assert abs(solver.xf - s_exact) < 0.02
