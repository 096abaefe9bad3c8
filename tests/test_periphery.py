"""Utilities, 1D front tracking, interpolation, viz, VTK smoke tests."""

import os

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu import utils, viz, vtk
from penguin_tpu.front_tracking1d import FrontTracker1D
from penguin_tpu.interpolation import cubic_interpol, lin_interpol, quad_interpol


def test_front_tracker_1d():
    ft = FrontTracker1D([0.4, 0.6], first_inside=False)  # fluid in [0.4, 0.6]
    x = jnp.asarray([0.0, 0.45, 0.5, 0.61, 1.0])
    inside = np.asarray(ft.inside(x))
    np.testing.assert_array_equal(inside, [False, True, True, False, False])
    d = np.asarray(ft.sdf(x))
    np.testing.assert_allclose(d, [0.4, -0.05, -0.1, 0.01, 0.4], atol=1e-12)
    assert abs(ft.fluid_length((0.0, 1.0)) - 0.2) < 1e-12
    # capacity from the 1D front tracker matches the interval level set
    mesh = pt.Mesh((40,), (1.0,), (0.0,))
    cap_ft = pt.compute_capacity(ft.body(), mesh)
    cap_ls = pt.compute_capacity(pt.geometry.interval(0.5, 0.1), mesh)
    np.testing.assert_allclose(np.asarray(cap_ft.V), np.asarray(cap_ls.V),
                               atol=1e-10)


def test_interpolation():
    xs = np.linspace(0, 1, 11)
    ys = xs**2
    xq = np.asarray([0.05, 0.33, 0.77])
    for interp, tol in ((lin_interpol, 5e-3), (quad_interpol, 1e-10),
                        (cubic_interpol, 5e-3)):
        got = np.asarray(interp(xs, ys, jnp.asarray(xq)))
        np.testing.assert_allclose(got, xq**2, atol=tol)


def test_initializers_and_adapt():
    mesh = pt.Mesh((16, 16), (1.0, 1.0), (0.0, 0.0))
    Tw, Tg = utils.initialize_temperature_uniform(mesh, 2.5)
    assert float(Tw.max()) == 2.5
    Tw, _ = utils.initialize_temperature_circle(mesh, (0.5, 0.5), 0.2, 1.0)
    assert 0 < float(Tw.sum()) < Tw.size
    ux, uy = utils.initialize_rotating_velocity_field(mesh)
    assert np.abs(np.asarray(ux)).max() > 0
    dt_new, cfl = utils.adapt_timestep(np.asarray([0.5]), mesh, 0.5, 1e-2,
                                       1e-5, 1.0)
    assert dt_new > 0 and cfl > 0


def test_small_cell_removal():
    mesh = pt.Mesh((20, 20), (4.0, 4.0), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.circle((2.0, 2.0), 1.0), mesh)
    tol = 1e-3 * float(cap.V.max())
    cap2 = utils.remove_small_volumes(cap, tol)
    V2 = np.asarray(cap2.V)
    assert ((V2 > 0) & (V2 < tol)).sum() == 0


def test_viz_and_vtk(tmp_path):
    mesh = pt.Mesh((16, 16), (4.0, 4.0), (0.0, 0.0))
    body = pt.geometry.circle((2.0, 2.0), 1.0)
    cap = pt.compute_capacity(body, mesh)
    ops = pt.make_diffusion_ops(cap)
    bc = pt.Dirichlet(0.0)
    bc1 = pt.Dirichlet(1.0)
    bc_b = pt.BorderConditions({k: bc1 for k in ("left", "right", "top", "bottom")})
    from penguin_tpu.solvers import DiffusionSteadyMono

    solver = DiffusionSteadyMono(pt.Phase(cap, ops, lambda x, y, z: 4.0, 1.0),
                                 bc_b, bc)
    solver.solve(method="direct")
    png = viz.plot_solution(solver, mesh, body, cap,
                            filename=str(tmp_path / "sol.png"))
    assert os.path.exists(png)
    f = vtk.write_vtk(str(tmp_path / "sol"), mesh, solver)
    assert os.path.exists(f) and os.path.getsize(f) > 1000
    pvd = vtk.write_vtk_series(str(tmp_path / "series"), mesh,
                               [solver.x, solver.x], times=[0.0, 1.0])
    assert os.path.exists(pvd)
    from penguin_tpu.front_tracking import markers_circle

    amp = viz.interface_spectrum(markers_circle((2, 2), 1.0, 64), (2, 2))
    assert amp.shape[0] == 33 and amp[1:].max() < 1e-10


def test_isotherms_and_spectrum(tmp_path):
    """plot_isotherms (vizualize.jl:637-720) renders; interface_spectrum of
    a 6-lobe crystal peaks at wavenumber 6."""
    from penguin_tpu import viz
    from penguin_tpu.front_tracking import markers_crystal

    mesh = pt.Mesh((16, 16), (2.0, 2.0), (0.0, 0.0))
    body = pt.geometry.circle((1.0, 1.0), 0.6)
    cap = pt.compute_capacity(body, mesh)
    from penguin_tpu.solvers import DiffusionSteadyMono
    bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                                for k in ("left", "right", "top", "bottom")})
    phase = pt.Phase(cap, pt.make_diffusion_ops(cap),
                     lambda x, y, z: 1.0, 1.0)
    s = DiffusionSteadyMono(phase, bc_b, pt.Dirichlet(0.0))
    s.solve(method="direct")
    out = tmp_path / "iso.png"
    viz.plot_isotherms(s, mesh, body=body, filename=str(out))
    assert out.exists() and out.stat().st_size > 0

    mk = markers_crystal((0.0, 0.0), 1.0, n=96, n_lobes=6, amplitude=0.1)
    amp = viz.interface_spectrum(mk, (0.0, 0.0))
    assert int(np.argmax(amp[1:])) + 1 == 6


def test_preconditioner_hook_improves_fixed_budget_residual():
    """M= hook on KrylovSolver (reference preconditioner hook test,
    stokes_test.jl:64+): with a fixed 5-iteration budget on an ill-scaled
    SPD system, Jacobi-preconditioned CG reaches a far smaller residual.
    (Note: matvec counting via a Python wrapper only sees traces under
    jitted Krylov loops, so the observable is the achieved residual.)"""
    import jax.numpy as jnp2
    import numpy as np2
    from penguin_tpu.linsolve import KrylovSolver

    d = jnp2.asarray(np2.logspace(0, 4, 100))
    A = lambda v: d * v
    b = jnp2.ones(100)

    def res(x):
        return float(jnp2.linalg.norm(d * x - b))

    x_plain = KrylovSolver(A, method="cg", tol=0.0, maxiter=5).solve(b)
    x_prec = KrylovSolver(A, method="cg", tol=0.0, maxiter=5,
                          M=lambda v: v / d).solve(b)
    assert res(x_prec) < 1e-6
    assert res(x_prec) < 1e-3 * res(x_plain)


def test_stefan_newton_telemetry_and_plots(tmp_path):
    """StefanMono2D records per-iteration GN residual curves and (opt-in)
    residual grids; the analytics surface consumes them (task: moving-
    solver debugging parity with the reference's vizualize_mov.jl)."""
    import numpy as np
    import jax.numpy as jnp

    import penguin_tpu as pt
    from penguin_tpu import viz
    from penguin_tpu.diagnostics import convergence_rates
    from penguin_tpu.front_tracking import FrontTracker
    from penguin_tpu.solvers.stefan2d import StefanMono2D
    from scipy.special import exp1

    S = 1.0
    St = (S ** 2 / 4) * np.exp(S ** 2 / 4) * exp1(S ** 2 / 4)
    T_inf = -St
    L, center = 8.0, (4.0, 4.0)
    mesh = pt.Mesh((24, 24), (L, L), (0.0, 0.0))
    front = FrontTracker().create_circle(center, 1.0, n=24)
    cap0 = pt.compute_capacity(lambda x, y: -front.sdf(x, y), mesh,
                               p=4, s=1)
    C = np.asarray(cap0.C_om)
    r = np.sqrt((C[..., 0] - center[0]) ** 2 + (C[..., 1] - center[1]) ** 2)
    Tw0 = jnp.asarray(np.where(r > 1.0, T_inf, 0.0))
    bc_b = pt.BorderConditions({k: pt.Dirichlet(float(T_inf))
                                for k in ("left", "right", "top",
                                          "bottom")})
    phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0),
                     lambda x, y, z, t: 0.0, 1.0)
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, 1.0))
    solver = StefanMono2D(phase, bc_b, pt.Dirichlet(0.0), 0.02,
                          (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE")
    solver.solve(front, 0.0, 0.05, ic, newton_params=(6, 1e-5, 1e-6, 1.0),
                 interior_fluid=False, method="bicgstab", p=4, s=1,
                 jac="intercept", capture_residual_field=True)

    H = solver.residual_hist
    assert H.ndim == 2 and H.shape[1] == 6
    # at least one recorded residual per step, decreasing within steps
    first = H[:, 0]
    assert np.isfinite(first).all() and (first > 0).all()
    rates = convergence_rates(H)
    assert rates.shape == (H.shape[0],)
    assert (rates <= 0.0).any()  # somewhere it actually converged

    F = solver.residual_fields
    assert F is not None and F.shape[0] == H.shape[0]
    assert np.isfinite(F).all()

    p1 = viz.plot_newton_rates(H, filename=str(tmp_path / "rates.png"))
    p2 = viz.plot_residual_fields(F, filename=str(tmp_path / "fields.png"))
    import os
    assert os.path.exists(p1) and os.path.exists(p2)
