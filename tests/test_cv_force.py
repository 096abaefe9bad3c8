"""Control-volume force (steady host + traced unsteady recorder) and the
O(h²) least-squares pressure probe (navierstokes.py diagnostics; no
reference analogue — the reference reports the cut-rim integral only,
navierstokes.jl:2977-3082, and raw nearest-cell pressure probes)."""

import numpy as np
import jax.numpy as jnp
import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge


_CACHE = {}


def _solved_cylinder():
    """One shared steady solve (the ~100 s CPU cost is the picard jit
    compile + dense solve; both CV tests only READ the solved state)."""
    if "s" not in _CACHE:
        s = _cylinder_solver()
        s.solve_steady(max_iter=6, tol=1e-12)
        _CACHE["s"] = s
    return _CACHE["s"]


def _cylinder_solver(n=24, mu=0.05):
    L = 4.0
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    d = L / n
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    cyl = pt.geometry.circle((2.01, 2.01), 0.5)
    body = lambda x, y: -cyl(x, y)
    caps = [pt.compute_capacity(body, m, p=4, s=1)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0]),
                    pt.make_diffusion_ops(caps[1])),
        capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
        mu=mu, rho=1.0,
        f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
    )
    stream, still = pt.Dirichlet(1.0), pt.Dirichlet(0.0)
    bc_ux = pt.BorderConditions({k: stream for k in
                                 ("left", "right", "bottom", "top")})
    bc_uy = pt.BorderConditions({k: still for k in
                                 ("left", "right", "bottom", "top")})
    return NavierStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                            pt.Dirichlet(0.0))


def test_cv_recorder_matches_host_steady():
    """The traced recorder's surface integral must agree with the host
    (scipy map_coordinates) control_volume_force on the same box — same
    bilinear interpolation, same gradient stencil, same trapezoid rule."""
    s = _solved_cylinder()
    box = (1.2, 2.8, 1.2, 2.8)
    Fx_h, Fy_h = s.control_volume_force(box)
    cvf = s.make_control_volume_recorder(box)
    Fsx, Fsy, Mx, My = (float(v) for v in cvf(s.x))
    assert abs(Fsx - Fx_h) < 1e-8 * max(1.0, abs(Fx_h)), (Fsx, Fx_h)
    assert abs(Fsy - Fy_h) < 1e-8 * max(1.0, abs(Fy_h)), (Fsy, Fy_h)
    # the momentum integral is finite and of the expected magnitude
    # (box area x rho x O(u)); exact value is flow-dependent
    assert np.isfinite([Mx, My]).all()
    assert abs(Mx) < 1.6 * 1.6 * 1.5


def test_cv_recorder_box_insensitive():
    """Steady state: the surface integral is box-independent (closed-
    surface momentum balance) to discretization error."""
    s = _solved_cylinder()
    f1 = s.control_volume_force((1.2, 2.8, 1.2, 2.8))
    f2 = s.control_volume_force((1.0, 3.0, 1.0, 3.0))
    assert abs(f1[0] - f2[0]) < 0.08 * abs(f1[0]), (f1, f2)


def test_pressure_probe_linear_field_exact():
    """A linear pressure field is reproduced EXACTLY (to lstsq roundoff)
    at arbitrary probe points — the property that makes the probe O(h²)
    where nearest-centroid is O(h)."""
    s = _solved_cylinder()
    pc = np.asarray(s.fluid.capacity_p.C_om)
    p_lin = 2.0 + 3.0 * pc[..., 0] + 4.0 * pc[..., 1]
    x = list(s.zero_state())
    x[2 * s.N] = jnp.asarray(-p_lin)  # state stores -p_phys
    pts = [(1.73, 2.41), (2.52, 2.01), (0.5, 0.5)]
    got = s.pressure_probe(pts, x=tuple(x))
    for (px, py), v in zip(pts, got):
        assert abs(v - (2.0 + 3.0 * px + 4.0 * py)) < 1e-9, (px, py, v)
    # the traced probe (static MLS gather+dot) agrees with the host one
    traced = s.make_pressure_probe(pts)(tuple(x))
    np.testing.assert_allclose(np.asarray(traced), got, rtol=1e-12)
