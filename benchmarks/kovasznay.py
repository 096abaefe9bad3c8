"""Kovasznay flow convergence (reference
benchmark/navierstokes/kovasznay_convergence.jl): steady NS with the exact
analytic solution imposed on all borders; L2/L-inf error vs resolution.

u = 1 - e^{λx} cos(2πy),  v = (λ/2π) e^{λx} sin(2πy),
λ = Re/2 - sqrt(Re²/4 + 4π²).

Run:  python benchmarks/kovasznay.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))) if "examples" in __file__ else _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge


def kovasznay_error(n, Re=40.0):
    lam = Re / 2 - np.sqrt(Re**2 / 4 + 4 * np.pi**2)
    Lx, Ly = 1.0, 1.0
    x0, y0 = -0.5, 0.0
    mesh_p = pt.Mesh((n, n), (Lx, Ly), (x0, y0))
    d = Lx / n
    mesh_ux = pt.Mesh((n, n), (Lx, Ly), (x0 - 0.5 * d, y0))
    mesh_uy = pt.Mesh((n, n), (Lx, Ly), (x0, y0 - 0.5 * d))
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

    ue = lambda x, y: 1 - jnp.exp(lam * x) * jnp.cos(2 * jnp.pi * y)
    ve = lambda x, y: lam / (2 * jnp.pi) * jnp.exp(lam * x) * jnp.sin(2 * jnp.pi * y)
    bc_ux = pt.BorderConditions({k: pt.Dirichlet(lambda x, y, z: ue(x, y))
                                 for k in ("left", "right", "bottom", "top")})
    bc_uy = pt.BorderConditions({k: pt.Dirichlet(lambda x, y, z: ve(x, y))
                                 for k in ("left", "right", "bottom", "top")})
    solver = NavierStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                              pt.Dirichlet(0.0))
    solver.solve_steady_newton(max_iter=12, tol=1e-10, picard_warmup=3)
    hx, hy = mesh_ux.h  # DOF positions = cell centroids (nodes + h/2)
    X, Y = np.meshgrid(np.asarray(mesh_ux.nodes[0]) + 0.5 * hx,
                       np.asarray(mesh_ux.nodes[1]) + 0.5 * hy,
                       indexing="ij")
    uex = np.asarray(ue(jnp.asarray(X), jnp.asarray(Y)))
    uxs = np.asarray(solver.velocity(0))
    err = uxs[1:n, 1:n] - uex[1:n, 1:n]
    V = np.asarray(caps[0].V)[1:n, 1:n]
    l2 = float(np.sqrt((err**2 * V).sum() / V.sum()))
    linf = float(np.abs(err).max())
    return l2, linf


if __name__ == "__main__":
    prev = None
    for n in (8, 16):
        l2, linf = kovasznay_error(n)
        rate = f"  rate={np.log(prev / l2) / np.log(2):.2f}" if prev and n in (16,) else ""
        print(f"n={n:3d}  L2={l2:.5e}  Linf={linf:.5e}{rate}")
        prev = l2
