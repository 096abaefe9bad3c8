"""Darcy flow through a porous medium: an array of circular grains cut out
of the domain, pressure drop across — reference
examples/2D/Darcy/PorousMedia.jl.

Run:  python examples/2D/porous_media.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.darcy import DarcyFlow, solve_darcy_velocity

n, L = 96, 1.0
mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))

# 4x4 staggered grain lattice
grains = []
rng = [(i, j) for i in range(4) for j in range(4)]
for i, j in rng:
    cx = (i + 0.5) / 4 + (0.06 if j % 2 else -0.04) / 4
    cy = (j + 0.5) / 4
    grains.append(pt.geometry.circle((cx, cy), 0.085))
solid = pt.geometry.union(*grains)
pore = pt.geometry.complement(solid)

cap = pt.compute_capacity(pore, mesh, p=4, s=1)
ops = pt.make_diffusion_ops(cap)
phase = pt.Phase(cap, ops, lambda x, y, z: 0.0, 1.0)
bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(1.0),  # x = 0 inlet
                            "top": pt.Dirichlet(0.0)})    # x = 1 outlet
solver = DarcyFlow(phase, bc_b, pt.Neumann(0.0))  # impermeable grains
solver.solve(method="pgmres", tol=1e-10)

p = np.asarray(solver.x_omega)
q = solve_darcy_velocity(solver, phase)
qx = np.asarray(q[0])
wet = np.asarray(cap.V) > 1e-12
porosity = float(np.asarray(cap.V).sum()) / L**2
# effective permeability from the mean flux through a mid-plane
mid = n // 2
col = qx[mid, :]
flux = np.nansum(np.where(wet[mid, :], col, 0.0)) * (L / n)
print(f"porosity {porosity:.3f}; mid-plane Darcy flux {flux:.4f} "
      f"(< open-channel 1.07: grains obstruct)")
print(f"pressure range [{p[wet].min():.3f}, {p[wet].max():.3f}]")
assert np.isfinite(p[wet]).all()
assert 0.0 < flux < 1.0
assert 0.55 < porosity < 0.8
