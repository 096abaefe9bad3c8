"""Crystal growth showcase: a perturbed seed (crystal marker shape) growing
into undercooled liquid with the full Gibbs-Thomson interface condition
(curvature + kinetic undercooling) — the
front-tracking configuration behind dendritic solidification studies
(reference crystal generator front_tracking.jl:91-271 + GibbsThomson BC).

Run:  python examples/2D/dendrite_crystal.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.front_tracking import FrontTracker
from penguin_tpu.solvers.stefan2d import StefanMono2D
from penguin_tpu import viz

L, center = 8.0, (4.0, 4.0)
n = 48
mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
dt = 0.005
T_inf = -0.5  # undercooling

front = FrontTracker().create_crystal(center, 0.8, n=64, n_lobes=6,
                                      amplitude=0.12)
cap0 = pt.compute_capacity(lambda x, y: -front.sdf(x, y), mesh, p=4, s=1)
Tw0 = jnp.full(mesh.np_shape, T_inf) * (cap0.V > 0)

bc_b = pt.BorderConditions({k: pt.Dirichlet(T_inf)
                            for k in ("left", "right", "top", "bottom")})
# Gibbs-Thomson: curvature undercooling (eps_k) regularizes the lobes and
# kinetic attachment resistance (eps_v) undercools the SOLIDIFYING front
# (g = Tm - eps_v * v_solid), slowing and stabilizing growth
gt = pt.GibbsThomson(Tm=0.0, eps_k=0.01, eps_v=0.05)
phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0), lambda x, y, z, t: 0.0, 1.0)
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(1.0, 1.0, 1.0))

solver = StefanMono2D(phase, bc_b, gt, dt, (Tw0, jnp.zeros(mesh.np_shape)),
                      mesh, "BE")
solver.solve(front, 0.0, 0.05, ic, newton_params=(8, 1e-4, 1e-6, 1.0),
             interior_fluid=False, method="bicgstab",
             smooth_window=7, smooth_passes=2, extrapolation_factor=0.5,
             max_disp_cells=0.4, jac="intercept", p=4, s=1)

mk = np.asarray(solver.markers)
r = np.sqrt((mk[:, 0] - 4) ** 2 + (mk[:, 1] - 4) ** 2)
print(f"crystal radius: mean {r.mean():.3f}, lobes preserved "
      f"(max-min {r.max() - r.min():.3f})")
assert 0.7 < r.mean() < 1.2, r.mean()           # seed-scale crystal survives
assert r.max() - r.min() > 0.1, (r.max(), r.min())  # lobes not smoothed away
viz.plot_interface_evolution(solver.marker_log, filename="dendrite_fronts.png")
print("wrote dendrite_fronts.png")
