"""Taylor-Green vortex convergence study (reference
benchmark/navierstokes/TaylorGreen.jl: ns=[8,16,32,64], dt=1e-3,
t_end=0.1, CN) — writes taylor_green_convergence.csv.

Run:  python benchmarks/taylor_green.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))) if "examples" in __file__ else _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import csv

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge


def tg_error(n, dt=1e-3, t_end=0.1, nu=1.0):
    L = 2 * np.pi
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    d = L / n
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
        mu=nu, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    ue = lambda x, y, t: -np.cos(x) * np.sin(y) * np.exp(-2 * nu * t)
    ve = lambda x, y, t: np.sin(x) * np.cos(y) * np.exp(-2 * nu * t)
    bc_ux = pt.BorderConditions({
        k: pt.Dirichlet(lambda x, y, z, t: -jnp.cos(x) * jnp.sin(y) * jnp.exp(-2 * nu * t))
        for k in ("left", "right", "bottom", "top")})
    bc_uy = pt.BorderConditions({
        k: pt.Dirichlet(lambda x, y, z, t: jnp.sin(x) * jnp.cos(y) * jnp.exp(-2 * nu * t))
        for k in ("left", "right", "bottom", "top")})
    solver = NavierStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                              pt.Dirichlet(0.0))
    hx, hy = mesh_ux.h  # DOF positions = cell centroids (nodes + h/2)
    Xux, Yux = np.meshgrid(np.asarray(mesh_ux.nodes[0]) + 0.5 * hx,
                           np.asarray(mesh_ux.nodes[1]) + 0.5 * hy,
                           indexing="ij")
    Xuy, Yuy = np.meshgrid(np.asarray(mesh_uy.nodes[0]) + 0.5 * hx,
                           np.asarray(mesh_uy.nodes[1]) + 0.5 * hy,
                           indexing="ij")
    x0 = (jnp.asarray(ue(Xux, Yux, 0.0)), jnp.asarray(ue(Xux, Yux, 0.0)),
          jnp.asarray(ve(Xuy, Yuy, 0.0)), jnp.asarray(ve(Xuy, Yuy, 0.0)),
          jnp.zeros(fluid.capacity_p.V.shape))
    method = "direct" if n <= 32 else "gmres"
    solver.solve_unsteady(dt, t_end, scheme="CN", method=method, x0=x0)
    nst = int(np.ceil(t_end / dt - 1e-12))
    tf = nst * dt
    uxf = np.asarray(solver.velocity(0))
    err = uxf[1:n, 1:n] - ue(Xux, Yux, tf)[1:n, 1:n]
    V = np.asarray(caps[0].V)[1:n, 1:n]
    return float(np.sqrt((err**2 * V).sum() / V.sum()))


if __name__ == "__main__":
    rows = []
    for n in (8, 16, 32):
        e = tg_error(n)
        rows.append((n, 2 * np.pi / n, e))
        print(f"n={n:3d}  h={2*np.pi/n:.4f}  L2={e:.6e}")
    orders = [np.log(rows[i][2] / rows[i + 1][2]) / np.log(2) for i in range(len(rows) - 1)]
    print("observed orders:", np.round(orders, 2))
    with open("taylor_green_convergence.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["n", "h", "l2_error"])
        w.writerows(rows)
    print("wrote taylor_green_convergence.csv")
