"""Stream-vorticity and NS-scalar coupling smoke/physics tests."""

import numpy as np
import jax.numpy as jnp
import pytest

import penguin_tpu as pt
from penguin_tpu.solvers.streamvort import StreamVorticity
from penguin_tpu.solvers.ns_scalar import (
    NavierStokesScalarCoupler,
    PassiveCoupling,
    PicardCoupling,
)
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge


def test_streamvorticity_gaussian_decay():
    n = 24
    mesh = pt.Mesh((n, n), (1.0, 1.0), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh, p=4, s=1)
    ops = pt.make_diffusion_ops(cap)
    z = jnp.zeros(mesh.np_shape)
    C = np.asarray(cap.C_om)
    w0 = np.exp(-((C[..., 0] - 0.5) ** 2 + (C[..., 1] - 0.5) ** 2) / 0.01)
    w0[np.asarray(cap.V) == 0] = 0.0
    bc0 = pt.Dirichlet(0.0)
    bords = pt.BorderConditions({k: bc0 for k in ("left", "right", "top", "bottom")})
    sv = StreamVorticity(cap, 0.05, 1e-3, ops,
                         bc_stream_border=bords, bc_vorticity_border=bords,
                         omega0=(jnp.asarray(w0), z))
    e0 = float((jnp.asarray(w0) ** 2 * cap.V).sum())
    sv.run(4)
    w = np.asarray(sv.omega[0])
    assert np.isfinite(w).all()
    e1 = float((sv.omega[0] ** 2 * cap.V).sum())
    # viscous decay of enstrophy
    assert 0 < e1 < e0
    # velocity field was reconstructed and is nontrivial
    assert np.abs(np.asarray(sv.velocity[0])).max() > 0


@pytest.mark.slow
def test_buoyant_cavity_coupling():
    """Heated-left-wall Boussinesq cavity: buoyancy must start a clockwise
    circulation (hot fluid rises at the left wall)."""
    n = 16
    L = 1.0
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    d = L / n
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    body = pt.geometry.full_domain(2)
    cap_ux = pt.compute_capacity(body, mesh_ux, p=4, s=1)
    cap_uy = pt.compute_capacity(body, mesh_uy, p=4, s=1)
    cap_p = pt.compute_capacity(body, mesh_p, p=4, s=1)
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(cap_ux, cap_uy),
        operator_u=(pt.make_diffusion_ops(cap_ux), pt.make_diffusion_ops(cap_uy)),
        capacity_p=cap_p, operator_p=pt.make_diffusion_ops(cap_p),
        mu=1e-2, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    noslip = pt.Dirichlet(0.0)
    bc_wall = pt.BorderConditions(
        {k: noslip for k in ("left", "right", "bottom", "top")}
    )
    mom = NavierStokesMono(fluid, (bc_wall, bc_wall), PinPressureGauge(),
                           pt.Dirichlet(0.0))

    cap_T = cap_p
    ops_T = fluid.operator_p
    bc_T = pt.BorderConditions(
        {"left": pt.Dirichlet(1.0), "right": pt.Dirichlet(0.0)}
    )
    # start from a linear hot-left temperature field
    C = np.asarray(cap_T.C_om)
    T0w = jnp.asarray(np.clip(1.0 - C[..., 0], 0.0, 1.0) * (np.asarray(cap_T.V) > 0))
    coupler = NavierStokesScalarCoupler(
        mom, cap_T, ops_T, kappa=1e-2,
        scalar_source=lambda x, y, z, t: 0.0,
        bc_scalar=bc_T, bc_scalar_cut=pt.Dirichlet(0.0),
        strategy=PassiveCoupling(), beta=10.0, gravity=(0.0, -1.0),
        T_ref=0.0, T0=(T0w, T0w),
    )
    coupler.run(dt=0.01, t_end=0.05)
    uy = np.asarray(coupler.x[2])
    T = np.asarray(coupler.T[0])
    assert np.isfinite(uy).all() and np.isfinite(T).all()
    # hot left wall: upward flow near x=0, downward near x=1
    left_col = uy[1:4, 1:n - 1].mean()
    right_col = uy[n - 4:n - 1, 1:n - 1].mean()
    assert left_col > 0 and right_col < 0, (left_col, right_col)
    assert np.abs(uy).max() > 1e-4


@pytest.mark.slow
def test_monolithic_coupling_matches_picard():
    """One monolithic Newton step must agree with tightly converged Picard
    on the buoyant cavity."""
    from penguin_tpu.solvers.ns_scalar import MonolithicCoupling

    n = 10
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
        mu=1e-2, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    noslip = pt.Dirichlet(0.0)
    bc_wall = pt.BorderConditions({k: noslip
                                   for k in ("left", "right", "bottom", "top")})
    bc_T = pt.BorderConditions({"left": pt.Dirichlet(1.0), "right": pt.Dirichlet(0.0)})
    C = np.asarray(caps[2].C_om)
    T0w = jnp.asarray(np.clip(1.0 - C[..., 0], 0.0, 1.0) * (np.asarray(caps[2].V) > 0))

    def make(strategy):
        mom = NavierStokesMono(fluid, (bc_wall, bc_wall), PinPressureGauge(),
                               pt.Dirichlet(0.0))
        return NavierStokesScalarCoupler(
            mom, caps[2], fluid.operator_p, kappa=1e-2,
            scalar_source=lambda x, y, z, t: 0.0,
            bc_scalar=bc_T, bc_scalar_cut=pt.Dirichlet(0.0),
            strategy=strategy, beta=10.0, gravity=(0.0, -1.0),
            T_ref=0.0, T0=(T0w, T0w),
        )

    c1 = make(PicardCoupling(tol_T=1e-12, tol_U=1e-12, maxiter=30))
    c1.step(0.01)
    c2 = make(MonolithicCoupling(tol=1e-11, maxiter=10))
    c2.step(0.01)
    # the couplings differ at O(dt * du) (explicit vs implicit convection
    # within the step); fields must agree to that order
    for a, b in zip(c1.x, c2.x):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 5e-3
    assert np.abs(np.asarray(c1.T[0]) - np.asarray(c2.T[0])).max() < 5e-3


def test_run_fast_matches_step():
    """The compiled-scan Krylov fast path must reproduce the host-loop
    Picard stepper (dense solves) to solver precision."""
    n = 10
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
        operator_u=(pt.make_diffusion_ops(caps[0]),
                    pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=1e-2, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    noslip = pt.Dirichlet(0.0)
    bc_wall = pt.BorderConditions({k: noslip
                                   for k in ("left", "right", "bottom", "top")})
    bc_T = pt.BorderConditions({
        "bottom": pt.Dirichlet(1.0), "top": pt.Dirichlet(0.0),
        "left": pt.Neumann(0.0), "right": pt.Neumann(0.0),
    })
    C = np.asarray(caps[2].C_om)
    T0w = jnp.asarray(np.clip(1.0 - C[..., 0], 0.0, 1.0)
                      * (np.asarray(caps[2].V) > 0))

    def make():
        mom = NavierStokesMono(fluid, (bc_wall, bc_wall), PinPressureGauge(),
                               pt.Dirichlet(0.0))
        return NavierStokesScalarCoupler(
            mom, caps[2], fluid.operator_p, kappa=1e-2,
            scalar_source=lambda x, y, z, t: 0.0,
            bc_scalar=bc_T, bc_scalar_cut=pt.Dirichlet(0.0),
            strategy=PicardCoupling(tol_T=0.0, tol_U=0.0, maxiter=2),
            beta=10.0, gravity=(0.0, -1.0), T_ref=0.5, T0=(T0w, T0w),
        )

    dt = 0.01
    a = make()
    a.step(dt, scheme="BE")
    a.step(dt, scheme="BE")
    b = make()
    b.run_fast(dt, 2 * dt, scheme="BE", picard_iters=2, tol=1e-13)
    for xa, xb in zip(a.x, b.x):
        assert np.abs(np.asarray(xa) - np.asarray(xb)).max() < 1e-8
    for Ta, Tb in zip(a.T, b.T):
        assert np.abs(np.asarray(Ta) - np.asarray(Tb)).max() < 1e-8
    assert b.time == a.time
