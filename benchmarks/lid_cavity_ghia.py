"""Lid-driven cavity centerline profiles vs Ghia et al. (1982)
(reference benchmark/navierstokes/lid_driven_cavity_steady.jl + ghia/*.ghia).

Run:  python benchmarks/lid_cavity_ghia.py [Re] [n]
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))) if "examples" in __file__ else _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

# Ghia, Ghia & Shin (1982), u on the vertical centerline, Re=100
GHIA_RE100_Y = np.array([0.0, 0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813,
                         0.4531, 0.5, 0.6172, 0.7344, 0.8516, 0.9531, 0.9609,
                         0.9688, 0.9766, 1.0])
GHIA_RE100_U = np.array([0.0, -0.03717, -0.04192, -0.04775, -0.06434, -0.10150,
                         -0.15662, -0.21090, -0.20581, -0.13641, 0.00332,
                         0.23151, 0.68717, 0.73722, 0.78871, 0.84123, 1.0])


def run(Re=100.0, n=32):
    L = 1.0
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
        mu=1.0 / Re, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    noslip, lid = pt.Dirichlet(0.0), pt.Dirichlet(1.0)
    bc_ux = pt.BorderConditions(
        {"left": noslip, "right": noslip, "bottom": noslip, "top": lid})
    bc_uy = pt.BorderConditions(
        {k: noslip for k in ("left", "right", "bottom", "top")})
    s = NavierStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                         pt.Dirichlet(0.0))
    s.solve_steady_newton(max_iter=15, tol=1e-10, picard_warmup=3,
                          verbose=True)
    ux = np.asarray(s.velocity(0))
    ys = np.asarray(mesh_ux.nodes[1])[:n]
    u_center = ux[n // 2, :n]
    u_ghia = np.interp(ys, GHIA_RE100_Y, GHIA_RE100_U)
    err = np.abs(u_center - u_ghia)
    print("y, u_sim, u_ghia:")
    for yy, us, ug in zip(ys[::4], u_center[::4], u_ghia[::4]):
        print(f"  {yy:.3f}  {us:+.4f}  {ug:+.4f}")
    print(f"max |u - ghia| on centerline: {err.max():.4f}")
    return err.max()


if __name__ == "__main__":
    Re = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    run(Re, n)
