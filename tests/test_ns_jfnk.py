"""Jacobian-free Newton-Krylov steady NS + block-Schur preconditioner
(VERDICT round-1 items 3 and 8).

Gates: JFNK converges superlinearly on Kovasznay flow; the block-Schur
preconditioned unsteady solve matches the dense-LU path."""

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge, StokesMono


def _kovasznay(n, Re=40.0):
    lam = Re / 2 - np.sqrt(Re**2 / 4 + 4 * np.pi**2)
    Lx, Ly, x0, y0 = 1.0, 1.0, -0.5, 0.0
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
        operator_u=(pt.make_diffusion_ops(caps[0]),
                    pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=1.0 / Re, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    ue = lambda x, y: 1 - jnp.exp(lam * x) * jnp.cos(2 * jnp.pi * y)
    ve = lambda x, y: (lam / (2 * jnp.pi) * jnp.exp(lam * x)
                       * jnp.sin(2 * jnp.pi * y))
    bc_ux = pt.BorderConditions({k: pt.Dirichlet(lambda x, y, z: ue(x, y))
                                 for k in ("left", "right", "bottom", "top")})
    bc_uy = pt.BorderConditions({k: pt.Dirichlet(lambda x, y, z: ve(x, y))
                                 for k in ("left", "right", "bottom", "top")})
    solver = NavierStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                              pt.Dirichlet(0.0))
    return solver, caps, mesh_ux, ue


def test_jfnk_kovasznay_converges():
    n = 32
    solver, caps, mesh_ux, ue = _kovasznay(n)
    solver.solve_steady_newton_krylov(max_iter=12, tol=1e-8)
    hist = solver.residual_history
    assert hist[-1] < 1e-6 or min(hist) < 1e-6
    # superlinear: at least one contraction by 10x between consecutive iters
    ratios = [hist[k + 1] / hist[k] for k in range(min(4, len(hist) - 1))]
    assert min(ratios) < 0.15, hist
    # DOF positions are cell centroids (nodes + h/2) — the border rows
    # evaluate their Dirichlet data there since round 4
    hx, hy = mesh_ux.h
    X, Y = np.meshgrid(np.asarray(mesh_ux.nodes[0]) + 0.5 * hx,
                       np.asarray(mesh_ux.nodes[1]) + 0.5 * hy,
                       indexing="ij")
    uex = np.asarray(ue(jnp.asarray(X), jnp.asarray(Y)))
    err = np.asarray(solver.velocity(0))[1:n, 1:n] - uex[1:n, 1:n]
    V = np.asarray(caps[0].V)[1:n, 1:n]
    l2 = float(np.sqrt((err**2 * V).sum() / V.sum()))
    assert l2 < 2e-2


def test_mom_cg_solves_viscous_block():
    """The momentum inner-CG option (make_block_preconditioner mom="cg")
    actually reduces the masked viscous-block residual well below one
    Jacobi sweep — the building block for a fine-grid-robust JFNK
    preconditioner.  NOTE (measured): swapping mom="cg" into the block
    LDU while keeping the GᵀD⁻¹G Schur surrogate does NOT converge —
    a better momentum elimination needs the matching (1/μ)-mass Schur
    scaling; until that pairing lands, mom="cg" stays experimental and
    the default is "jacobi"."""
    solver, caps, mesh_ux, ue = _kovasznay(32)
    M = solver.make_block_preconditioner(dt=None, theta=1.0,
                                         schur="dct_cg", mom="cg",
                                         mom_cg_iters=8)
    d = 0
    idm = jnp.where(solver.u_active[d], 1.0, 0.0)
    for item in solver.borders[d].items:
        idm = jnp.where(item[5], 0.0, idm)
    act = idm > 0.5

    def Aop(um):
        um = jnp.where(act, um, 0.0)
        y = solver._visc(d, um, jnp.zeros_like(um))
        return jnp.where(act, y, 0.0)

    rng = np.random.RandomState(0)
    bm = jnp.where(act, jnp.asarray(rng.randn(*solver.zero_state()[0].shape)),
                   0.0)
    x = M.mom_solve(d, bm)
    nb = float(jnp.linalg.norm(bm))
    res = float(jnp.linalg.norm(Aop(jnp.where(act, x, 0.0)) - bm))
    assert np.isfinite(res)
    assert res < 0.3 * nb, (res, nb)  # measured 6.16 vs ||b|| 29.2


def _stokes_fluid_2d(n=20, L=1.0):
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    d = L / n
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    body = pt.geometry.full_domain(2)
    caps = [pt.compute_capacity(body, m)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    return pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0]),
                    pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=1.0, rho=1.0,
        f_u=lambda x, y, z: 1.0, f_p=lambda x, y, z: 0.0,
    )


def test_block_preconditioned_unsteady_matches_direct():
    """Stokes unsteady: block-Schur BiCGStab == dense LU to solver tol,
    with few iterations (the preconditioner actually works)."""
    n = 20
    noslip = pt.Dirichlet(0.0)
    bc = pt.BorderConditions({k: noslip
                              for k in ("left", "right", "bottom", "top")})
    s1 = StokesMono(_stokes_fluid_2d(n), (bc, bc), PinPressureGauge(),
                    pt.Dirichlet(0.0))
    xd = s1.solve_unsteady(1e-2, 0.05, scheme="CN", method="direct")
    s2 = StokesMono(_stokes_fluid_2d(n), (bc, bc), PinPressureGauge(),
                    pt.Dirichlet(0.0))
    xp = s2.solve_unsteady(1e-2, 0.05, scheme="CN", method="pbicgstab",
                           tol=1e-11)
    for a, b in zip(xd, xp):
        assert float(jnp.abs(a - b).max()) < 1e-7
    # cold start pays full price; warm-started steps must be cheap.  (The
    # cold bound moved 200 -> 320 when the block preconditioner switched
    # to power-estimated Chebyshev bounds: slightly more cold iterations
    # on easy geometries in exchange for converging on the cut annuli the
    # fixed [0.04, 2] window diverged on.)
    assert s2.krylov_iters[0] <= 320, s2.krylov_iters
    assert s2.krylov_iters[1:].max() <= 40, s2.krylov_iters
    assert s2.krylov_relres.max() < 1e-10
