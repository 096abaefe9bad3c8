"""UNSTEADY Stokes lid-driven cavity: creeping-flow spin-up — reference
examples/2D/Stokes/lid_driven_cavity_unsteady_2d.jl.

From rest, the Stokes (no inertia) cavity diffuses lid momentum inward;
the transient converges to the steady Stokes solution.  Creeping cavity
flow is left-right symmetric (unlike NS): the vortex center sits on the
vertical midline.  Asserts monotone spin-up, convergence to the separate
steady solve, and the symmetry property.

Run:  python examples/2D/stokes_cavity_unsteady.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import StokesMono, PinPressureGauge

n, L, mu = 32, 1.0, 1.0
d = L / n
mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
body = pt.geometry.full_domain(2)
caps = [pt.compute_capacity(body, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=mu, rho=1.0,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)
noslip, lid = pt.Dirichlet(0.0), pt.Dirichlet(1.0)
bc_ux = pt.BorderConditions(
    {"left": noslip, "right": noslip, "bottom": noslip, "top": lid})
bc_uy = pt.BorderConditions(
    {k: noslip for k in ("left", "right", "bottom", "top")})


def make():
    return StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                      pt.Dirichlet(0.0))


# spin-up: momentum diffusion time scale L^2 rho/mu = 1
s_uns = make()
mids = []
for t_end in (0.02, 0.05, 0.2):
    s_uns2 = make()
    s_uns2.solve_unsteady(dt=0.01, t_end=t_end, scheme="CN",
                          method="pbicgstab", tol=1e-9)
    mids.append(float(np.asarray(s_uns2.velocity(0))[n // 2, n // 2]))
print("mid-cavity u at t=0.02/0.05/0.2:",
      " ".join(f"{m:+.5f}" for m in mids))

s_st = make()
s_st.solve(method="schur_gmres", tol=1e-10)
ux_st = np.asarray(s_st.velocity(0))
mid_st = float(ux_st[n // 2, n // 2])
print(f"steady Stokes mid-cavity u = {mid_st:+.5f}")

s_fin = make()
s_fin.solve_unsteady(dt=0.01, t_end=3.0, scheme="CN",
                     method="pbicgstab", tol=1e-9)
ux_fin = np.asarray(s_fin.velocity(0))
dev = np.abs(ux_fin[:n, :n] - ux_st[:n, :n]).max()
print(f"t=3 vs steady: max |du| = {dev:.2e}")

# creeping flow symmetry: u(x, y) = u(L-x, y).  The staggered ux node i
# sits at x = (i - 1/2) h, whose mirror is node n+1-i.  The max-norm
# asymmetry is dominated by the lid-corner singularity (u varies O(1)
# across a cell there at any h) and the one-sided wall staggering, so the
# gate is on the CENTRAL box, where the measured asymmetry converges at
# O(h): 3.0e-2 / 1.7e-2 / 8.9e-3 at n = 16/32/64.
diff = np.abs(ux_fin[1:n + 1, :] - ux_fin[n:0:-1, :])
lo, hi = n // 4, 3 * n // 4
asym = diff[lo:hi, lo:hi].max()
print(f"left-right asymmetry of u at t=3 (central box): {asym:.2e}")

assert abs(mids[0]) < abs(mids[1]) < abs(mids[2])   # monotone spin-up
assert dev < 5e-4                                    # converged to steady
assert asym < 0.025                                  # Stokes symmetry, O(h)
print("unsteady Stokes cavity OK")
