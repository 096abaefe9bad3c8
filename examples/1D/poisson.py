"""1D steady Poisson in an embedded interval, Dirichlet and Robin borders —
reference examples/1D/Diffusion/Poisson.jl and Heat_robin.jl.

Analytic gate: -u'' = 1 on (c-R, c+R), u = 0 at the interface
=> u(x) = (R^2 - (x-c)^2) / 2.

Run:  python examples/1D/poisson.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyMono

nx, lx = 160, 4.0
c, R = 2.0, 1.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
cap = pt.compute_capacity(pt.geometry.interval(c, R), mesh)
phase = pt.Phase(cap, pt.make_diffusion_ops(cap), lambda x, y, z: 1.0, 1.0)
bc_b = pt.BorderConditions({"top": pt.Dirichlet(0.0), "bottom": pt.Dirichlet(0.0)})
solver = DiffusionSteadyMono(phase, bc_b, pt.Dirichlet(0.0))
solver.solve(method="direct")

x = np.asarray(cap.C_om[..., 0])
u_exact = np.maximum(R**2 - (x - c) ** 2, 0.0) / 2
u = np.asarray(solver.x[0])
mask = np.asarray(cap.V) > 1e-12
err = np.abs(u - u_exact)[mask].max()
print(f"Poisson interval: max|u - exact| = {err:.2e} (gate < 1e-2)")
assert err < 1e-2

# Robin *interface* variant (reference Heat_robin.jl uses Robin at the
# embedded boundary): α T + β ∇T·n = 0 with α→∞ recovers the Dirichlet
# solution above; α=β=1 lets the interface value float above it.
solver_rob = DiffusionSteadyMono(phase, bc_b, pt.Robin(1e4, 1.0, 0.0))
solver_rob.solve(method="direct")
solver_weak = DiffusionSteadyMono(phase, bc_b, pt.Robin(1.0, 1.0, 0.0))
solver_weak.solve(method="direct")
u_stiff = np.asarray(solver_rob.x[0])
u_weak = np.asarray(solver_weak.x[0])
d_stiff = np.abs(u_stiff - u)[mask].max()
print(f"Robin(1e4) vs Dirichlet: {d_stiff:.2e} (→0);  "
      f"weak-Robin max {u_weak[mask].max():.3f} > Dirichlet max {u[mask].max():.3f}")
assert d_stiff < 1e-2 and u_weak[mask].max() > u[mask].max()
