"""The BenchPhaseFlow Scalar_* baseline diffusion suite.

Ports of /root/reference/BenchPhaseFlow/problems/scalar/
Scalar_{1D,2D,3D}_Diffusion_* — the named analytic cut-cell benchmarks
that anchor the literature suite:

- 1D heating slab (Fourier sine series), |x-0.5| < 0.25.
- 1D Robin erfc half-space (u = erf + e^{k xi + a k^2 t} erfc), a = 5.
- 1D interval Poisson with cubic exact solution, f = x.
- 2D disk heated from its rim (Dirichlet J0 Bessel series), R = 1.
- 2D disk with Robin rim (Robin J0 eigen-series alpha J1 = kR J0).
- 2D Robin rim, sub-cell center shifts (error must be shift-robust).
- 2D Robin rim, dt-refinement at fixed grid: BE vs CN time order.
- 2D Neumann mass conservation (u == 1, zero flux: mass drift == 0).
- 2D disk Poisson, u = 1 - r^2, f = 4.
- 3D cooling/heating sphere (Dirichlet sine series), R = 1.
- 3D Robin sphere (mu cot mu + kR - 1 = 0 eigen-series).
- 3D sphere Poisson, u = (R^2 - r^2)/6, f = 1.

Series/special-function machinery uses scipy (J0 zeros, brentq roots);
solutions are evaluated on numpy centroid arrays.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

from benchmarks.phaseflow.harness import (convergence_study, ensure_cpu_f64,
                                          fit_order, write_csv)

ensure_cpu_f64()

import numpy as np
from scipy import special
from scipy.optimize import brentq
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyMono, DiffusionUnsteadyMono


def _run_unsteady(mesh, body, bc_i, bc_b_map, u0_bulk, u0_gamma, dt, t_end,
                  exact, scheme="CN", tol=1e-11):
    cap = pt.compute_capacity(body, mesh)
    ops = pt.make_diffusion_ops(cap)
    bc_b = pt.BorderConditions(bc_b_map)
    phase = pt.Phase(cap, ops, 0.0, 1.0)
    u0 = (jnp.full(mesh.np_shape, float(u0_bulk)),
          jnp.full(mesh.np_shape, float(u0_gamma)))
    s = DiffusionUnsteadyMono(phase, bc_b, bc_i, dt, u0, scheme)
    s.solve(t_end, method="bicgstab", tol=tol, maxiter=4000)
    _, _, g, f, c, e = pt.check_convergence(exact, s, cap, 2, verbose=False)
    return s, cap, {"all": g, "full": f, "cut": c, "empty": e}


# ----------------------------------------------------- 1D heating slab

def slab_series(center, radius, t, kappa=1.0, nterms=400):
    """Scalar_1D_Diffusion_Heat_Dirichlet.jl heating_slab_solution: slab
    initially at 1, rim clamped to 0."""
    L = 2 * radius
    n = 2 * np.arange(nterms) + 1
    lam = n * np.pi / L

    def u(x):
        xi = np.asarray(x)[..., None] - (center - radius)
        terms = (np.sin(lam * xi) / n) * np.exp(-kappa * lam ** 2 * t)
        return (4.0 / np.pi) * terms.sum(-1)

    return u


def run_heat1d_slab(sizes=(8, 16, 32, 64), t_end=0.1, verbose=True):
    exact = slab_series(0.5, 0.25, t_end)

    def solve_one(n):
        h = 1.0 / n
        mesh = pt.Mesh((n,), (1.0,), (0.0,))
        bc0 = pt.Dirichlet(0.0)
        _, _, e = _run_unsteady(
            mesh, lambda x: jnp.abs(x - 0.5) - 0.25, bc0,
            {"left": bc0, "right": bc0}, 1.0, 0.0, 0.5 * h * h, t_end,
            exact)
        return h, e

    return convergence_study("sc_heat1d_slab", solve_one, sizes, verbose)


# ------------------------------------------------- 1D Robin erfc case

def robin_erfc_solution(center, a=5.0, k=1.0):
    """Scalar_1D_Diffusion_Heat_Robin.jl robin_erf_solution."""

    def u(x, t):
        xi = np.asarray(x) - center
        eta = xi / (2 * np.sqrt(a * t))
        return (special.erf(eta)
                + np.exp(k * xi + a * k * k * t)
                * special.erfc(eta + k * np.sqrt(a * t)))

    return u


def run_heat1d_robin_erfc(sizes=(32, 64, 128, 256), t_end=1.0, verbose=True):
    a, k, center = 5.0, 1.0, 0.51
    sol = robin_erfc_solution(center, a, k)

    def sol_border(x, t):
        # jit-safe (jnp) exact value for the far-field border row; the
        # reference's own :left/:right entries are dead code in 1D (its
        # border keys for the x-axis are :bottom/:top, solver.jl:379-409),
        # so it silently runs a no-surgery far boundary — here the far
        # border carries the analytic value instead.
        from jax.scipy.special import erf, erfc
        ts = jnp.maximum(t, 1e-12)
        xi = x - center
        eta = xi / (2 * jnp.sqrt(a * ts))
        return (erf(eta) + jnp.exp(k * xi + a * k * k * ts)
                * erfc(eta + k * jnp.sqrt(a * ts)))

    def solve_one(n):
        h = 10.0 / n
        mesh = pt.Mesh((n,), (10.0,), (0.0,))
        cap = pt.compute_capacity(lambda x: -(x - center), mesh)
        ops = pt.make_diffusion_ops(cap)
        bc_b = pt.BorderConditions({
            "bottom": pt.Dirichlet(1.0),
            "top": pt.Dirichlet(sol_border)})
        phase = pt.Phase(cap, ops, 0.0, a)
        u0 = (jnp.ones(mesh.np_shape), jnp.ones(mesh.np_shape))
        s = DiffusionUnsteadyMono(phase, bc_b, pt.Robin(k, 1.0, 0.0),
                                  0.5 * h * h / a, u0, "CN")
        s.solve(t_end, method="bicgstab", tol=1e-11, maxiter=4000)
        _, _, g, f, c, e = pt.check_convergence(lambda x: sol(x, t_end), s,
                                                cap, 2, verbose=False)
        return h, {"all": g, "full": f, "cut": c, "empty": e}

    return convergence_study("sc_heat1d_robin_erfc", solve_one, sizes,
                             verbose)


# ----------------------------------------------- 1D interval Poisson

def run_poisson1d_interval(sizes=(16, 32, 64, 128, 256), verbose=True):
    """f = x on |x-0.5| < 0.11 with interface Dirichlet 0:
    u'' = -x  ->  u = -x^3/6 + a x + b pinned at both interface points."""
    xl, xr = 0.5 - 0.11, 0.5 + 0.11
    a = (xr ** 3 - xl ** 3) / (6.0 * (xr - xl))
    b = xl ** 3 / 6.0 - a * xl

    def exact(x):
        return -np.asarray(x) ** 3 / 6.0 + a * np.asarray(x) + b

    def solve_one(n):
        mesh = pt.Mesh((n,), (1.0,), (0.0,))
        cap = pt.compute_capacity(lambda x: jnp.abs(x - 0.5) - 0.11, mesh)
        ops = pt.make_diffusion_ops(cap)
        bc0 = pt.Dirichlet(0.0)
        phase = pt.Phase(cap, ops, lambda x, y, z: x, 1.0)
        s = DiffusionSteadyMono(phase, pt.BorderConditions(
            {"left": bc0, "right": bc0}), bc0)
        s.solve(method="bicgstab", tol=1e-12, maxiter=4000)
        _, _, g, f, c, e = pt.check_convergence(exact, s, cap, 2,
                                                verbose=False)
        return 1.0 / n, {"all": g, "full": f, "cut": c, "empty": e}

    return convergence_study("sc_poisson1d_interval", solve_one, sizes,
                             verbose)


# --------------------------------------------- 2D disk Bessel series

CENTER2D = (2.01, 2.01)


def disk_dirichlet_series(R=1.0, t=0.1, nterms=200):
    """u(r,t) = 1 - sum 2 e^{-a_n^2 t/R^2} J0(a_n r/R)/(a_n J1(a_n)),
    a_n the J0 zeros: disk at 0 heated to 1 from the rim."""
    al = special.jn_zeros(0, nterms)
    w = 2.0 * np.exp(-al ** 2 * t / R ** 2) / (al * special.j1(al))

    def u(x, y):
        r = np.hypot(np.asarray(x) - CENTER2D[0],
                     np.asarray(y) - CENTER2D[1])
        s = (w * special.j0(np.multiply.outer(r, al) / R)).sum(-1)
        return np.where(r >= R, 0.0, 1.0 - s)

    return u


def robin_disk_alphas(k, R, nterms):
    """Roots of alpha J1(alpha) - k R J0(alpha) = 0."""
    def eq(al):
        return al * special.j1(al) - k * R * special.j0(al)

    roots = []
    for m in range(1, nterms + 1):
        lo = max((m - 0.25 - 0.5) * np.pi, 1e-6)
        hi = (m - 0.25 + 0.5) * np.pi
        roots.append(brentq(eq, lo, hi))
    return np.asarray(roots)


def disk_robin_series(R=1.0, t=0.1, k=1.0, nterms=200, center=CENTER2D):
    al = robin_disk_alphas(k, R, nterms)
    An = 2.0 * k * R / ((k * k * R * R + al ** 2) * special.j0(al))
    w = An * np.exp(-al ** 2 * t / R ** 2)

    def u(x, y):
        r = np.hypot(np.asarray(x) - center[0], np.asarray(y) - center[1])
        s = (w * special.j0(np.multiply.outer(r, al) / R)).sum(-1)
        return np.where(r >= R, 0.0, 1.0 - s)

    return u


def _disk_case(n, bc_i, exact, t_end, center=CENTER2D, scheme="CN"):
    h = 4.0 / n
    mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))

    def body(x, y):
        return jnp.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2) - 1.0

    bc0 = pt.Dirichlet(0.0)
    _, _, e = _run_unsteady(mesh, body, bc_i,
                            {q: bc0 for q in
                             ("left", "right", "top", "bottom")},
                            0.0, 0.0, 0.5 * h * h, t_end, exact,
                            scheme=scheme)
    return h, e


def run_heat2d_disk_dirichlet(sizes=(16, 32, 64), t_end=0.1, verbose=True):
    exact = disk_dirichlet_series(t=t_end)
    return convergence_study(
        "sc_heat2d_disk_dirichlet",
        lambda n: _disk_case(n, pt.Dirichlet(1.0), exact, t_end),
        sizes, verbose)


def run_heat2d_disk_dirichlet_ft(sizes=(16, 32, 64), t_end=0.1,
                                 verbose=True):
    """Front-tracking variant of the heated disk (benchmark/HeatFT.jl):
    the capacity comes from a marker polyline's SDF instead of the
    analytic circle — cross-validates the FrontTracker geometry pipeline
    against the same Bessel-series exact solution."""
    from penguin_tpu.front_tracking import FrontTracker

    exact = disk_dirichlet_series(t=t_end)

    def solve_one(n):
        h = 4.0 / n
        mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))
        front = FrontTracker().create_circle(CENTER2D, 1.0,
                                             n=max(8 * n // 4, 32))

        def body(x, y):
            return front.sdf(x, y)

        bc0 = pt.Dirichlet(0.0)
        _, _, e = _run_unsteady(mesh, body, pt.Dirichlet(1.0),
                                {q: bc0 for q in
                                 ("left", "right", "top", "bottom")},
                                0.0, 0.0, 0.5 * h * h, t_end, exact)
        return h, e

    return convergence_study("sc_heat2d_disk_dirichlet_ft", solve_one,
                             sizes, verbose)


def run_heat2d_disk_robin(sizes=(16, 32, 64), t_end=0.1, verbose=True):
    exact = disk_robin_series(t=t_end)
    return convergence_study(
        "sc_heat2d_disk_robin",
        lambda n: _disk_case(n, pt.Robin(1.0, 1.0, 1.0), exact, t_end),
        sizes, verbose)


def run_heat2d_robin_shifted(n=48, t_end=0.1, verbose=True):
    """Scalar_2D_Diffusion_Heat_Robin_Shifted.jl: sweep the disk center by
    sub-cell offsets; the error must not blow up at unlucky cut positions."""
    h = 4.0 / n
    errs, rows = [], []
    for sx, sy in ((0.0, 0.0), (h / 3, 0.0), (h / 2, h / 3), (h / 2, h / 2)):
        c = (2.0 + sx, 2.0 + sy)
        exact = disk_robin_series(t=t_end, center=c)
        _, e = _disk_case(n, pt.Robin(1.0, 1.0, 1.0), exact, t_end, center=c)
        errs.append(e["all"])
        rows.append((sx, sy, e["all"], e["cut"]))
        if verbose:
            print(f"sc_robin_shifted shift=({sx:.3f},{sy:.3f}) "
                  f"L2={e['all']:.4e}")
    if verbose:  # tests run reduced sizes; don't clobber the full CSV
        write_csv("sc_heat2d_robin_shifted", rows,
                  ["shift_x", "shift_y", "err_all", "err_cut"])
    return {"errs": errs, "ratio": max(errs) / min(errs)}


def run_heat2d_robin_time_order(n=48, t_end=0.1, dts=(0.02, 0.01, 0.005),
                                verbose=True):
    """Scalar_2D_Diffusion_Heat_Robin_Time.jl: dt refinement at a fixed
    grid, BE vs CN."""
    c = (2.0, 2.0)
    exact = disk_robin_series(t=t_end, center=c)
    mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))

    def body(x, y):
        return jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2) - 1.0

    bc0 = pt.Dirichlet(0.0)
    out = {}
    rows = []
    for scheme in ("BE", "CN"):
        errs = []
        for dt in dts:
            _, _, e = _run_unsteady(
                mesh, body, pt.Robin(1.0, 1.0, 1.0),
                {q: bc0 for q in ("left", "right", "top", "bottom")},
                0.0, 0.0, dt, t_end, exact, scheme=scheme)
            errs.append(e["all"])
            rows.append((scheme, dt, e["all"]))
            if verbose:
                print(f"sc_robin_time {scheme} dt={dt}: L2={e['all']:.4e}")
        out[scheme] = errs
    write_csv("sc_heat2d_robin_time", rows, ["scheme", "dt", "err_all"])
    return out


def run_heat2d_neumann_mass(n=64, t_end=0.1, verbose=True):
    """Scalar_2D_Diffusion_Heat_NeumannMass.jl: u == 1 with zero-flux
    interface; the discrete mass integral must not drift."""
    h = 1.0 / n
    mesh = pt.Mesh((n, n), (1.0, 1.0), (0.0, 0.0))

    def body(x, y):
        return jnp.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.25

    cap = pt.compute_capacity(body, mesh)
    ops = pt.make_diffusion_ops(cap)
    bc0 = pt.Dirichlet(1.0)
    bc_b = pt.BorderConditions({q: bc0 for q in
                                ("left", "right", "top", "bottom")})
    phase = pt.Phase(cap, ops, 0.0, 1.0)
    u0 = (jnp.ones(mesh.np_shape), jnp.ones(mesh.np_shape))
    s = DiffusionUnsteadyMono(phase, bc_b, pt.Neumann(0.0), 0.25 * h * h,
                              u0, "CN")
    s.solve(t_end, method="bicgstab", tol=1e-12, maxiter=4000)
    V = np.asarray(cap.V)
    m0 = float(V.sum())                      # mass of u0 == 1
    m1 = float((V * np.asarray(s.x_omega)).sum())
    drift = abs(m1 - m0) / m0
    dev = float(np.abs(np.asarray(s.x_omega)[V > 1e-14] - 1.0).max())
    if verbose:
        print(f"sc_neumann_mass n={n}: relative drift={drift:.3e} "
              f"max|u-1|={dev:.3e}")
    return {"drift": drift, "max_dev": dev}


def run_poisson2d_disk(sizes=(16, 32, 64, 128), verbose=True):
    """u = 1 - r^2 in the unit disk at (2,2), f = 4, interface Dirichlet 0."""
    c = (2.0, 2.0)

    def exact(x, y):
        return 1.0 - (np.asarray(x) - c[0]) ** 2 - (np.asarray(y) - c[1]) ** 2

    def solve_one(n):
        mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))

        def body(x, y):
            return jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2) - 1.0

        cap = pt.compute_capacity(body, mesh)
        ops = pt.make_diffusion_ops(cap)
        bc0 = pt.Dirichlet(0.0)
        phase = pt.Phase(cap, ops, 4.0, 1.0)
        s = DiffusionSteadyMono(phase, pt.BorderConditions(
            {q: bc0 for q in ("left", "right", "top", "bottom")}), bc0)
        s.solve(method="bicgstab", tol=1e-12, maxiter=4000)
        _, _, g, f, cc, e = pt.check_convergence(exact, s, cap, 2,
                                                 verbose=False)
        return 4.0 / n, {"all": g, "full": f, "cut": cc, "empty": e}

    return convergence_study("sc_poisson2d_disk", solve_one, sizes, verbose)


# ------------------------------------------------- 3D sphere series

CENTER3D = (2.0, 2.0, 2.0)


def sphere_dirichlet_series(R=1.0, t=0.1, nterms=200):
    """Sphere initially at 0 heated to 1 from the surface:
    u = 1 - (2R/(pi r)) sum ((-1)^{n+1}/n) sin(n pi r/R) e^{-n^2 pi^2 t/R^2}."""
    nn = np.arange(1, nterms + 1)
    lam = nn * np.pi / R
    w = ((-1.0) ** (nn + 1) / nn) * np.exp(-lam ** 2 * t)

    def u(x, y, z):
        r = np.sqrt((np.asarray(x) - CENTER3D[0]) ** 2
                    + (np.asarray(y) - CENTER3D[1]) ** 2
                    + (np.asarray(z) - CENTER3D[2]) ** 2)
        rs = np.maximum(r, 1e-12)
        s = (w * np.sin(np.multiply.outer(rs, lam))).sum(-1)
        interior = 1.0 - (2.0 * R / (np.pi * rs)) * s
        at0 = 1.0 - 2.0 * w.sum()
        val = np.where(r < 1e-12, at0, interior)
        return np.where(r >= R, 1.0, val)

    return u


def robin_sphere_mus(k, R, nterms):
    """Roots of mu cot(mu) + kR - 1 = 0."""
    def eq(mu):
        return mu / np.tan(mu) + k * R - 1.0

    roots = []
    for m in range(1, nterms + 1):
        lo = (m - 1) * np.pi + 1e-9
        hi = m * np.pi - 1e-9
        flo, fhi = eq(lo + 1e-6), eq(hi - 1e-6)
        if flo * fhi > 0:
            continue
        roots.append(brentq(eq, lo + 1e-6, hi - 1e-6))
    return np.asarray(roots)


def sphere_robin_series(R=1.0, t=0.1, k=1.0, a=1.0, w0=1.0, nterms=200):
    """Sphere initially at w0 cooled through Robin k u + du/dn = 0."""
    mus = robin_sphere_mus(k, R, nterms)
    C = (np.sin(mus) * (mus ** 2 + (k * R - 1.0) ** 2)
         / (mus ** 2 * (mus ** 2 + k * R * (k * R - 1.0))))
    pref = 2.0 * k * R ** 2 * w0
    w = C * np.exp(-a * mus ** 2 * t / R ** 2)

    def u(x, y, z):
        r = np.sqrt((np.asarray(x) - CENTER3D[0]) ** 2
                    + (np.asarray(y) - CENTER3D[1]) ** 2
                    + (np.asarray(z) - CENTER3D[2]) ** 2)
        rs = np.maximum(r, 1e-12)
        s = (w * np.sin(np.multiply.outer(rs, mus) / R)).sum(-1)
        at0 = (w * mus / R).sum()
        val = np.where(r < 1e-12, pref * at0, pref * s / rs)
        return np.where(r >= R, w0, val)

    return u


def _sphere_case(n, bc_i, exact, t_end, u0_bulk, scheme="CN"):
    h = 4.0 / n
    mesh = pt.Mesh((n, n, n), (4.0, 4.0, 4.0), (0.0, 0.0, 0.0))

    def body(x, y, z):
        return jnp.sqrt((x - CENTER3D[0]) ** 2 + (y - CENTER3D[1]) ** 2
                        + (z - CENTER3D[2]) ** 2) - 1.0

    bc0 = pt.Dirichlet(0.0)
    _, _, e = _run_unsteady(mesh, body, bc_i,
                            {q: bc0 for q in
                             ("left", "right", "top", "bottom",
                              "forward", "backward")},
                            u0_bulk, u0_bulk, 0.5 * h * h, t_end, exact,
                            scheme=scheme)
    return h, e


def run_heat3d_sphere_dirichlet(sizes=(8, 16, 24), t_end=0.1, verbose=True):
    exact = sphere_dirichlet_series(t=t_end)
    return convergence_study(
        "sc_heat3d_sphere_dirichlet",
        lambda n: _sphere_case(n, pt.Dirichlet(1.0), exact, t_end, 0.0),
        sizes, verbose)


def run_heat3d_sphere_robin(sizes=(8, 16, 24), t_end=0.1, verbose=True):
    exact = sphere_robin_series(t=t_end)
    return convergence_study(
        "sc_heat3d_sphere_robin",
        lambda n: _sphere_case(n, pt.Robin(1.0, 1.0, 0.0), exact, t_end,
                               1.0),
        sizes, verbose)


def run_poisson3d_sphere(sizes=(16, 24, 32), verbose=True):
    """u = (R^2 - r^2)/6 inside the R = 0.5 sphere at (2,2,2), f = 1."""
    R = 0.5

    def exact(x, y, z):
        r2 = ((np.asarray(x) - CENTER3D[0]) ** 2
              + (np.asarray(y) - CENTER3D[1]) ** 2
              + (np.asarray(z) - CENTER3D[2]) ** 2)
        return (R * R - r2) / 6.0

    def solve_one(n):
        mesh = pt.Mesh((n, n, n), (4.0, 4.0, 4.0), (0.0, 0.0, 0.0))

        def body(x, y, z):
            return jnp.sqrt((x - CENTER3D[0]) ** 2 + (y - CENTER3D[1]) ** 2
                            + (z - CENTER3D[2]) ** 2) - R

        cap = pt.compute_capacity(body, mesh)
        ops = pt.make_diffusion_ops(cap)
        bc0 = pt.Dirichlet(0.0)
        phase = pt.Phase(cap, ops, 1.0, 1.0)
        s = DiffusionSteadyMono(phase, pt.BorderConditions(
            {q: bc0 for q in ("left", "right", "top", "bottom",
                              "forward", "backward")}), bc0)
        s.solve(method="bicgstab", tol=1e-12, maxiter=4000)
        _, _, g, f, c, e = pt.check_convergence(exact, s, cap, 2,
                                                verbose=False)
        return 4.0 / n, {"all": g, "full": f, "cut": c, "empty": e}

    return convergence_study("sc_poisson3d_sphere", solve_one, sizes,
                             verbose)


if __name__ == "__main__":
    res = {}
    res["slab"] = run_heat1d_slab()
    res["robin1d"] = run_heat1d_robin_erfc()
    res["poisson1d"] = run_poisson1d_interval()
    res["disk_dir"] = run_heat2d_disk_dirichlet()
    res["disk_rob"] = run_heat2d_disk_robin()
    res["poisson2d"] = run_poisson2d_disk()
    shifted = run_heat2d_robin_shifted()
    torder = run_heat2d_robin_time_order()
    mass = run_heat2d_neumann_mass()
    res["sph_dir"] = run_heat3d_sphere_dirichlet()
    res["sph_rob"] = run_heat3d_sphere_robin()
    res["poisson3d"] = run_poisson3d_sphere()

    for k, r in res.items():
        assert r["orders"]["all"] > 0.9, (k, r["orders"])
        e = r["err"]["all"]
        assert all(e[i + 1] < e[i] for i in range(len(e) - 1)), (k, e)
    assert shifted["ratio"] < 3.0, shifted
    assert mass["drift"] < 1e-10 and mass["max_dev"] < 1e-8, mass
    # the sudden Robin switch-on at t=0 is an incompatible initial layer:
    # CN loses its second order (and can trail BE slightly); gate that both
    # schemes converge in dt toward the fixed-grid spatial floor
    for scheme in ("BE", "CN"):
        e = torder[scheme]
        assert all(e[i + 1] < e[i] for i in range(len(e) - 1)), (scheme, e)
        assert e[-1] < 0.5 * e[0], (scheme, e)
    print("Scalar_* suite green")
