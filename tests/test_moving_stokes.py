"""Moving (prescribed) Stokes: for a static body the slab formulation must
reduce to the unsteady Stokes theta-scheme."""

import numpy as np
import jax.numpy as jnp
import pytest

import penguin_tpu as pt
from penguin_tpu.solvers.moving_stokes import MovingStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge, StokesMono


@pytest.mark.slow
def test_moving_stokes_static_body_matches_unsteady():
    n, L = 12, 1.0
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
        mu=1.0, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    lid = pt.Dirichlet(1.0)
    noslip = pt.Dirichlet(0.0)
    bc_ux = pt.BorderConditions(
        {"left": noslip, "right": noslip, "bottom": noslip, "top": lid}
    )
    bc_uy = pt.BorderConditions(
        {"left": noslip, "right": noslip, "bottom": noslip, "top": noslip}
    )
    dt, t_end = 0.02, 0.06

    ref = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(), pt.Dirichlet(0.0))
    ref.solve_unsteady(dt, t_end, scheme="BE", method="direct")

    body_st = lambda x, y, tau, params: pt.geometry.full_domain(2)(x, y)
    mov = MovingStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                           pt.Dirichlet(0.0))
    mov.solve(body_st, dt, 0.0, t_end, scheme="BE", p=4, s=1)

    for d_ in range(2):
        a = np.asarray(mov.velocity(d_))[:n, :n]
        b = np.asarray(ref.velocity(d_))[:n, :n]
        assert np.abs(a - b).max() < 1e-6, (d_, np.abs(a - b).max())
