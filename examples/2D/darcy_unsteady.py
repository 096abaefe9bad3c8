"""2D UNSTEADY Darcy flow (reference examples/2D/Darcy/DarcyFlow_uns.jl):
compressible-storage pressure transient  S ∂p/∂t = ∇·(K ∇p)  in a porous
slab between fixed-head ends; the transient relaxes to the steady linear
head profile and the recovered Darcy velocity becomes uniform.

Run:  python examples/2D/darcy_unsteady.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DarcyFlowUnsteady, solve_darcy_velocity

nx, ny = 48, 24
lx, ly = 2.0, 1.0
K = 0.5  # permeability/viscosity
mesh = pt.Mesh((nx, ny), (lx, ly), (0.0, 0.0))
cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh)
ops = pt.make_diffusion_ops(cap)
phase = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, K)
# NOTE scalar-solver border keys follow the reference's classification
# (src/solver.jl:379-409): "bottom"/"top" are the FIRST-axis (x) ends,
# "left"/"right" the second (y) — the head drop along x uses bottom/top.
bc_b = pt.BorderConditions({
    "bottom": pt.Dirichlet(1.0), "top": pt.Dirichlet(0.0),
    "left": pt.Neumann(0.0), "right": pt.Neumann(0.0),
})

z = jnp.zeros(mesh.np_shape)
dt = 2e-3
solver = DarcyFlowUnsteady(phase, bc_b, pt.Dirichlet(0.0), dt, (z, z), "BE")

# early transient: pressure front still travelling
solver.solve(0.05, method="bicgstab", tol=1e-10)
p_mid_early = float(np.asarray(solver.x_omega)[nx // 2, ny // 2])
# late: relax to the steady linear head (BE is unconditionally stable, so
# the relaxation leg takes a 25x larger step; steady state is dt-exact)
late = DarcyFlowUnsteady(phase, bc_b, pt.Dirichlet(0.0), 0.05,
                         solver.x, "BE")
late.solve(12.0, method="bicgstab", tol=1e-11, keep_states=False)
p = np.asarray(late.x_omega)
C = np.asarray(cap.C_om)
x = C[:nx, :ny, 0]
a, b = x.min(), x.max()
p_ex = 1.0 - (x - a) / (b - a)
err = np.abs(p[:nx, :ny] - p_ex).max()
print(f"mid-cell pressure: early {p_mid_early:.4f} -> steady "
      f"{p[nx//2, ny//2]:.4f} (exact {1 - (x[nx//2, 0] - a)/(b - a):.4f} "
      "at the mid cell)")
print(f"max |p - linear head| = {err:.2e}")

# reference parity: solve_darcy_velocity returns -grad p on the faces
# (darcy.jl:26-40 -- no K factor; multiply by K for the Darcy flux)
u = solve_darcy_velocity(late, phase, state_i=-1)
gx = np.asarray(u[0])[1:nx - 1, 1:ny - 1]
gx = gx[np.isfinite(gx)]
g_ex = 1.0 / (b - a)
print(f"face gradient: mean {gx.mean():.4f}  exact dH/L = {g_ex:.4f}  "
      f"-> Darcy flux K dH/L = {K * g_ex:.4f}")
assert p_mid_early < 0.45          # transient not yet relaxed
assert err < 1e-5                  # steady head is discretely linear
assert abs(gx.mean() - g_ex) < 1e-5 * g_ex
print("2D unsteady Darcy transient relaxes to the exact steady head")
