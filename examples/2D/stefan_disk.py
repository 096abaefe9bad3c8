"""2D Stefan with front tracking: Frank-disk growth into undercooled liquid
(the flagship configuration, reference examples/2D/StefanFT/stefan_disk.jl).

Run:  python examples/2D/stefan_disk.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))) if "examples" in __file__ else _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from scipy.special import exp1

import penguin_tpu as pt
from penguin_tpu.front_tracking import FrontTracker
from penguin_tpu.solvers.stefan2d import StefanMono2D
from penguin_tpu import viz

S = 1.0
St = (S**2 / 4) * np.exp(S**2 / 4) * exp1(S**2 / 4)
T_inf = -St

L, center = 8.0, (4.0, 4.0)
nx = ny = 48
mesh = pt.Mesh((nx, ny), (L, L), (0.0, 0.0))
t0 = 1.0
dt = 0.02
R0 = S * np.sqrt(t0)

front = FrontTracker().create_circle(center, R0, n=48)
cap0 = pt.compute_capacity(lambda x, y: -front.sdf(x, y), mesh, p=4, s=1)
C = np.asarray(cap0.C_om)
r = np.sqrt((C[..., 0] - center[0]) ** 2 + (C[..., 1] - center[1]) ** 2)
s_ = r / np.sqrt(t0)
Tw0 = jnp.asarray(np.where(
    s_ >= S, T_inf * (1 - exp1(np.maximum(s_**2 / 4, 1e-12)) / exp1(S**2 / 4)), 0.0
))

bc_b = pt.BorderConditions({k: pt.Dirichlet(float(T_inf))
                            for k in ("left", "right", "top", "bottom")})
phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0), lambda x, y, z, t: 0.0, 1.0)
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0), pt.FluxJump(1.0, 1.0, 1.0))

solver = StefanMono2D(phase, bc_b, pt.Dirichlet(0.0), dt,
                      (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE")
solver.solve(front, 0.0, 0.2, ic, newton_params=(12, 1e-4, 1e-6, 1.0),
             interior_fluid=False, method="bicgstab", p=4, s=1)

mk = np.asarray(solver.markers)
radii = np.sqrt((mk[:, 0] - center[0]) ** 2 + (mk[:, 1] - center[1]) ** 2)
n = len(solver.residual_log)
R_exact = S * np.sqrt(t0 + n * dt)
print(f"mean radius {radii.mean():.4f}  analytic {R_exact:.4f}  "
      f"roundness std {radii.std():.4f}")
assert abs(radii.mean() - R_exact) / R_exact < 0.07, (radii.mean(), R_exact)
assert radii.std() / radii.mean() < 0.12, radii.std()
viz.plot_interface_evolution(solver.marker_log, filename="stefan_disk_front.png")
print("wrote stefan_disk_front.png")
