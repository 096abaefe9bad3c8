"""Two-phase 2D Stefan front tracking: Frank disk with a conducting solid —
reference examples/2D/StefanFT/stefan_disk_2ph.jl.

The solid stays at Tm, so the two-phase result tracks the one-phase Frank
similarity solution.

Run:  python examples/2D/stefan_twophase_disk.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp
from scipy.special import exp1

import penguin_tpu as pt
from penguin_tpu.front_tracking import FrontTracker
from penguin_tpu.solvers.stefan2d import StefanDiph2D

S = 1.0
St = (S**2 / 4) * np.exp(S**2 / 4) * exp1(S**2 / 4)
T_inf = -St
L, center = 8.0, (4.0, 4.0)
nx = ny = 32
mesh = pt.Mesh((nx, ny), (L, L), (0.0, 0.0))
t0, dt = 1.0, 0.02
R0 = S * np.sqrt(t0)

front = FrontTracker().create_circle(center, R0, n=32)
cap1 = pt.compute_capacity(lambda x, y: front.sdf(x, y), mesh, p=4, s=1)
cap2 = pt.compute_capacity(lambda x, y: -front.sdf(x, y), mesh, p=4, s=1)
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z, t: 0.0, 1.0)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z, t: 0.0, 1.0)
C = np.asarray(cap2.C_om)
r = np.sqrt((C[..., 0] - center[0]) ** 2 + (C[..., 1] - center[1]) ** 2)
s_ = r / np.sqrt(t0)
T2w = jnp.asarray(np.where(
    s_ >= S, T_inf * (1 - exp1(np.maximum(s_**2 / 4, 1e-12)) / exp1(S**2 / 4)),
    0.0))
z = jnp.zeros(mesh.np_shape)
bc_b = pt.BorderConditions({k: pt.Dirichlet(float(T_inf))
                            for k in ("left", "right", "top", "bottom")})
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(1.0, 1.0, 1.0))
solver = StefanDiph2D(ph1, ph2, bc_b, ic, dt, (z, z, T2w, z), mesh, "BE")
solver.solve(front, 0.0, 0.1 - dt / 2, newton_params=(12, 1e-4, 1e-6, 1.0),
             interior_phase1=True, latent_sign=-1.0,
             enable_stencil_fusion=False, extrapolation_factor=0.5,
             jac="intercept", p=4, s=1)

mk = np.asarray(solver.markers)
radii = np.sqrt((mk[:, 0] - center[0]) ** 2 + (mk[:, 1] - center[1]) ** 2)
n_steps = len(solver.marker_log)
R_exact = S * np.sqrt(t0 + n_steps * dt)
print(f"two-phase Frank disk: mean radius {radii.mean():.4f} "
      f"(analytic {R_exact:.4f}, err {abs(radii.mean()-R_exact)/R_exact:.1%})")
assert abs(radii.mean() - R_exact) / R_exact < 0.03
