"""2D unsteady heat with NO embedded body (reference
examples/2D/Diffusion/Heat_Nobody.jl): full-domain capacity, uniform
source, Dirichlet borders — the no-interface sanity case where the
cut-cell machinery must reduce exactly to a plain finite-volume scheme.

Gate: the long-time field matches the separable steady solution of
-ΔT = 1 with homogeneous Dirichlet data (Fourier series), evaluated at
the discrete border placement.

Run:  python examples/2D/heat_nobody.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyMono

nx = ny = 40
lx = ly = 1.0
mesh = pt.Mesh((nx, ny), (lx, ly), (0.0, 0.0))
cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh)
ops = pt.make_diffusion_ops(cap)
phase = pt.Phase(cap, ops, lambda x, y, z, t: 1.0, 1.0)
bc0 = pt.Dirichlet(0.0)
bc_b = pt.BorderConditions({k: bc0 for k in ("left", "right", "top", "bottom")})

z = jnp.zeros(mesh.np_shape)
solver = DiffusionUnsteadyMono(phase, bc_b, bc0, 2e-3, (z, z), "CN")
solver.solve(1.0, method="cg")

T = np.asarray(solver.x_omega)[:nx, :ny]
C = np.asarray(cap.C_om)
x, y = C[:nx, :ny, 0], C[:nx, :ny, 1]
# Fourier-series steady solution of -ΔT=1 on the DISCRETE domain spanned
# by the border cell centers [a, b]^2 (border rows pin T at cell centers)
a, b = x.min(), x.max()
L = b - a
xs, ys = x - a, y - a
T_ex = np.zeros_like(T)
for m in range(1, 40, 2):
    for n in range(1, 40, 2):
        T_ex += (16.0 / (np.pi**4 * m * n * (m**2 + n**2)) * L**2
                 * np.sin(m * np.pi * xs / L) * np.sin(n * np.pi * ys / L))
err = np.abs(T - T_ex).max()
print(f"center T = {T[nx//2, ny//2]:.5f}  series exact = {T_ex[nx//2, ny//2]:.5f}")
print(f"max |T - exact| = {err:.2e}")
assert err < 2e-3, err
print("2D no-body heat matches the separable steady solution")
