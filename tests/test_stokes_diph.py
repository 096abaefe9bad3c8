"""Two-phase Couette flow: piecewise-linear profile with viscosity ratio
(interface velocity + traction continuity) — validates StokesDiph."""

import numpy as np
import jax.numpy as jnp
import pytest

import penguin_tpu as pt
from penguin_tpu.solvers.stokes_diph import StokesDiph
from penguin_tpu.solvers.stokes import PinPressureGauge


def _phase_fluid(body, n, L, mu):
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    d = L / n
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    caps = [pt.compute_capacity(body, m, p=6, s=1)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    return pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=mu, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )


@pytest.mark.slow
def test_two_layer_couette():
    n, L = 16, 1.0
    yint = 0.5 + 0.011  # keep the interface off the grid lines
    mu1, mu2 = 1.0, 0.25
    body_a = pt.geometry.halfspace(1, yint)          # lower fluid y < yint
    body_b = pt.geometry.halfspace(1, yint, -1.0)    # upper fluid y > yint
    fa = _phase_fluid(body_a, n, L, mu1)
    fb = _phase_fluid(body_b, n, L, mu2)

    noslip = pt.Dirichlet(0.0)
    lid = pt.Dirichlet(1.0)
    tau = 1.0 / (yint / mu1 + (L - yint) / mu2)
    prof1 = pt.Dirichlet(lambda x, y, z: tau * y / mu1)
    prof2 = pt.Dirichlet(lambda x, y, z: tau * yint / mu1 + tau * (y - yint) / mu2)
    bc_a = (
        pt.BorderConditions({"left": prof1, "right": prof1, "bottom": noslip}),
        pt.BorderConditions({"left": noslip, "right": noslip, "bottom": noslip}),
    )
    bc_b = (
        pt.BorderConditions({"left": prof2, "right": prof2, "top": lid}),
        pt.BorderConditions({"left": noslip, "right": noslip, "top": noslip}),
    )
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, 0.0))
    solver = StokesDiph(fa, fb, bc_a, bc_b, ic)
    solver.solve(method="lstsq")

    ux1 = np.asarray(solver.velocity(0, 0))
    ux2 = np.asarray(solver.velocity(1, 0))
    ys = np.asarray(fa.mesh_u[0].nodes[1])  # u-node y coordinates
    u_exact1 = tau * ys / mu1
    u_exact2 = tau * yint / mu1 + tau * (ys - yint) / mu2

    # volume-weighted relative L2 over interior full cells (wall rows carry
    # the O(h) border-position offset inherent to this discretization)
    def l2(u, ue, fl):
        full = (np.asarray(fl.capacity_u[0].cell_types) == 1)
        full[0, :] = full[-1, :] = full[:, 0] = full[:, -1] = False
        V = np.asarray(fl.capacity_u[0].V)
        e = (u - ue[None, :])[full]
        w = V[full]
        return np.sqrt((e**2 * w).sum() / w.sum())

    # prototype-grade accuracy gate (the reference keeps its stokes_diph
    # test out of CI, test/runtests.jl:37); interface coupling is O(h)
    assert l2(ux1, u_exact1, fa) < 0.12
    assert l2(ux2, u_exact2, fb) < 0.12
    # interface velocity continuity
    ug1 = np.asarray(solver.velocity(0, 0, gamma=True))
    ug2 = np.asarray(solver.velocity(1, 0, gamma=True))
    cut1 = np.asarray(fa.capacity_u[0].cell_types) == -1
    cut1[0, :] = cut1[n - 1, :] = cut1[-1, :] = False  # border/wall columns
    assert np.abs(ug1[cut1] - ug2[cut1]).max() < 1e-6
