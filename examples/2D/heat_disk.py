"""2D unsteady heat diffusion inside a disk — the reference quick-start
(examples/2D/Diffusion/Heat.jl): Dirichlet interface on an embedded circle,
backward Euler.

Run:  python examples/2D/heat_disk.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))) if "examples" in __file__ else _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyMono
from penguin_tpu import viz

nx, ny = 80, 80
lx = ly = 4.0
mesh = pt.Mesh((nx, ny), (lx, ly), (0.0, 0.0))

radius, center = ly / 4, (lx / 2 + 0.01, ly / 2 + 0.01)
circle = pt.geometry.circle(center, radius)

capacity = pt.compute_capacity(circle, mesh)
operator = pt.make_diffusion_ops(capacity)

bc = pt.Dirichlet(1.0)  # interface temperature
bc0 = pt.Dirichlet(0.0)
bc_b = pt.BorderConditions({k: bc0 for k in ("left", "right", "top", "bottom")})

phase = pt.Phase(capacity, operator, lambda x, y, z, t: 0.0, 1.0)

z = jnp.zeros(mesh.np_shape)
dt = 0.25 * (lx / nx) ** 2
solver = DiffusionUnsteadyMono(phase, bc_b, bc, dt, (z, z), "BE")
solver.solve(0.1, method="bicgstab")

maxT = float(jnp.abs(solver.x_omega).max())
print("max T:", maxT)
assert 0.9 < maxT <= 1.0 + 1e-6, maxT  # warmed toward the unit cut BC, maximum principle
viz.plot_solution(solver, mesh, circle, capacity, filename="heat_disk.png")
print("wrote heat_disk.png")
