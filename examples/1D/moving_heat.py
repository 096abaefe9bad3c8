"""1D prescribed-motion diffusion: an interval body translating through the
rod (space-time slab capacities rebuilt inside the jitted scan) — reference
examples/1D/SolidMoving/MovingHeat.jl.

Run:  python examples/1D/moving_heat.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_diffusion import MovingDiffusionUnsteadyMono

nx, lx = 80, 8.0
mesh = pt.Mesh((nx,), (lx,), (0.0,))
v = 1.0  # body velocity
body_st = lambda x, t: -(jnp.abs(x - 3.0 - v * t) - 1.5)  # fluid inside |x-c(t)|<1.5

cap0 = pt.compute_capacity(lambda x: body_st(x, 0.0), mesh)
phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0), lambda x, y, z, t: 0.0, 1.0)
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(0.0), "top": pt.Dirichlet(0.0)})
T0 = jnp.where(jnp.asarray(cap0.V) > 0, 1.0, 0.0)
solver = MovingDiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(1.0), 5e-3,
                                     (T0, jnp.zeros(mesh.np_shape)), mesh, "BE")
solver.solve(body_st, 0.0, 0.5, p=6, s=1)

T = np.asarray(solver.x[0])
capT = pt.compute_capacity(lambda x: body_st(x, 0.5), mesh)
inside = np.asarray(capT.V) > 1e-10
print(f"final field range inside moving body: [{T[inside].min():.4f}, "
      f"{T[inside].max():.4f}] (Dirichlet g=1 at the moving walls)")
print(f"Krylov iters/step: max {np.asarray(solver.krylov_iters).max()}")
assert np.isfinite(T).all() and T[inside].min() > -1e-6 and T[inside].max() < 1.2
