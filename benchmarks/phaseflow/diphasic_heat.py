"""Diphasic heat benchmarks with analytic two-phase solutions.

Ports of /root/reference/BenchPhaseFlow/problems/scalar/diphasic/
Heat_2ph_1D.jl and Heat_2ph_2D.jl:

- 1D Henry problem: two half-spaces meeting at x = 4 on [0, 8] with
  ScalarJump(1, He, 0) + FluxJump(1, 1, 0); phase 1 starts at 0,
  phase 2 at 1.  Exact: the matched erfc pair
  u1 = pref (erfc(xi/2 sqrt(D1 t)) - 2), u2 = pref erfc(xi/2 sqrt(D2 t)) + 1
  with pref = -He / (1 + He sqrt(D1/D2)).
- 2D dissolving disk: disk R = 2 at the center of [0, 8]^2, gas phase
  (inside, c = 1) dissolving into liquid (outside, c = 0) through a
  Henry jump.  Exact: the Weber-Orr transform integrals (J0/Y0 kernels),
  evaluated with scipy quadrature.
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

from benchmarks.phaseflow.harness import convergence_study, ensure_cpu_f64

ensure_cpu_f64()

import numpy as np
from scipy import special
from scipy.integrate import quad
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionUnsteadyDiph


# ----------------------------------------------------------- 1D Henry

def run_heat_2ph_1d(sizes=(40, 80, 160), He=100.0, D1=1.0, D2=1.0,
                    t_end=0.1, verbose=True):
    lx, xint = 8.0, 4.0
    pref = -He / (1.0 + He * np.sqrt(D1 / D2))

    def u1_exact(x):
        xi = np.asarray(x) - xint
        return pref * (special.erfc(xi / (2 * np.sqrt(D1 * t_end))) - 2.0)

    def u2_exact(x):
        xi = np.asarray(x) - xint
        return pref * special.erfc(xi / (2 * np.sqrt(D2 * t_end))) + 1.0

    def solve_one(n):
        h = lx / n
        mesh = pt.Mesh((n,), (lx,), (0.0,))
        body = pt.geometry.halfspace(0, xint)          # phase 1: x < xint
        body_c = pt.geometry.halfspace(0, xint, -1.0)  # phase 2: x > xint
        cap1 = pt.compute_capacity(body, mesh)
        cap2 = pt.compute_capacity(body_c, mesh)
        ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), 0.0, D1)
        ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), 0.0, D2)
        bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(0.0),
                                    "top": pt.Dirichlet(1.0)})
        ic = pt.InterfaceConditions(pt.ScalarJump(1.0, He, 0.0),
                                    pt.FluxJump(1.0, 1.0, 0.0))
        z = jnp.zeros(mesh.np_shape)
        o = jnp.ones(mesh.np_shape)
        u0 = (z, z, o, o)
        s = DiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, 0.5 * h * h, u0, "CN")
        s.solve(t_end, method="bicgstab", tol=1e-11, maxiter=4000)
        _, _, g, f, c, e = pt.check_convergence_diph(
            u1_exact, u2_exact, s, cap1, cap2, 2, verbose=False)
        return h, {"all": g[2], "full": f[2], "cut": c[2], "empty": e[2]}

    return convergence_study("diph_heat_2ph_1d_henry", solve_one, sizes,
                             verbose)


# ------------------------------------------ 2D dissolving disk (Weber-Orr)

class Disk2phParams:
    def __init__(self, lx=8.0, center=(4.0, 4.0), radius=2.0, t_end=0.1,
                 Dg=1.0, Dl=1.0, He=1.0, cg0=1.0):
        self.lx, self.center, self.radius = lx, center, radius
        self.t_end, self.Dg, self.Dl, self.He, self.cg0 = (t_end, Dg, Dl,
                                                           He, cg0)


def _phi_psi(u, p):
    D = np.sqrt(p.Dg / p.Dl)
    j1R = special.j1(u * p.radius)
    j0R = special.j0(u * p.radius)
    phi = (p.Dg * np.sqrt(p.Dl) * j1R * special.y0(D * u * p.radius)
           - p.He * p.Dl * np.sqrt(p.Dg) * j0R * special.y1(D * u * p.radius))
    psi = (p.Dg * np.sqrt(p.Dl) * j1R * special.j0(D * u * p.radius)
           - p.He * p.Dl * np.sqrt(p.Dg) * j0R * special.j1(D * u * p.radius))
    return phi, psi


def disk2ph_exact(p):
    """Returns (cg(x, y), cl(x, y)) evaluated pointwise via quadrature of
    the Weber-Orr inversion integrals (Heat_2ph_2D.jl:38-93)."""
    umax = 5.0 / np.sqrt(p.Dg * p.t_end)
    D = np.sqrt(p.Dg / p.Dl)
    pref_g = 4 * p.cg0 * p.Dg * p.Dl ** 2 * p.He / (np.pi ** 2 * p.radius)
    pref_l = 2 * p.cg0 * p.Dg * np.sqrt(p.Dl) * p.He / np.pi

    def cg_point(r):
        def f(u):
            phi, psi = _phi_psi(u, p)
            den = u * u * (phi * phi + psi * psi)
            if den == 0.0:
                return 0.0
            return (np.exp(-p.Dg * u * u * p.t_end) * special.j0(u * r)
                    * special.j1(u * p.radius) / den)

        val, _ = quad(f, 0, umax, limit=400, epsabs=1e-9, epsrel=1e-9)
        return pref_g * val

    def cl_point(r):
        def f(u):
            phi, psi = _phi_psi(u, p)
            den = u * (phi * phi + psi * psi)
            if den == 0.0:
                return 0.0
            contrib = special.j0(D * u * r) * phi - special.y0(D * u * r) * psi
            return (np.exp(-p.Dg * u * u * p.t_end)
                    * special.j1(u * p.radius) * contrib / den)

        val, _ = quad(f, 0, umax, limit=400, epsabs=1e-9, epsrel=1e-9)
        return pref_l * val

    # the exact solution is radial: tabulate on a fine radial grid once
    # and interpolate, instead of one quadrature per centroid
    rmax = np.hypot(p.lx, p.lx)
    rg_in = np.linspace(0.0, p.radius, 600)
    rg_out = np.linspace(p.radius, rmax, 900)
    tab_in = np.array([cg_point(ri) for ri in rg_in])
    tab_out = np.array([cl_point(ri) for ri in rg_out])

    def cg(x, y):
        r = np.hypot(np.asarray(x, float) - p.center[0],
                     np.asarray(y, float) - p.center[1])
        val = np.interp(r, rg_in, tab_in)
        return np.where(r < p.radius, val, 0.0)

    def cl(x, y):
        r = np.hypot(np.asarray(x, float) - p.center[0],
                     np.asarray(y, float) - p.center[1])
        val = np.interp(r, rg_out, tab_out)
        return np.where(r >= p.radius, val, 0.0)

    return cg, cl


def run_heat_2ph_2d(sizes=(32, 64, 96), params=None, verbose=True):
    p = params or Disk2phParams()
    cg_exact, cl_exact = disk2ph_exact(p)

    def solve_one(n):
        h = p.lx / n
        mesh = pt.Mesh((n, n), (p.lx, p.lx), (0.0, 0.0))

        def disk(x, y):
            return jnp.sqrt((x - p.center[0]) ** 2
                            + (y - p.center[1]) ** 2) - p.radius

        def disk_c(x, y):
            return p.radius - jnp.sqrt((x - p.center[0]) ** 2
                                       + (y - p.center[1]) ** 2)

        cap1 = pt.compute_capacity(disk, mesh)
        cap2 = pt.compute_capacity(disk_c, mesh)
        ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), 0.0, p.Dg)
        ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), 0.0, p.Dl)
        bc_b = pt.BorderConditions({})
        ic = pt.InterfaceConditions(pt.ScalarJump(1.0, p.He, 0.0),
                                    pt.FluxJump(1.0, 1.0, 0.0))
        o = jnp.ones(mesh.np_shape)
        z = jnp.zeros(mesh.np_shape)
        u0 = (o, o, z, z)
        s = DiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, 0.5 * h * h, u0, "BE")
        s.solve(p.t_end, method="bicgstab", tol=1e-11, maxiter=6000)
        _, _, g, f, c, e = pt.check_convergence_diph(
            cg_exact, cl_exact, s, cap1, cap2, 2, verbose=False)
        return h, {"all": g[2], "full": f[2], "cut": c[2], "empty": e[2]}

    return convergence_study("diph_heat_2ph_2d_disk", solve_one, sizes,
                             verbose)


if __name__ == "__main__":
    r1 = run_heat_2ph_1d()
    r2 = run_heat_2ph_2d()
    assert r1["orders"]["all"] > 1.2, r1["orders"]
    e = r2["err"]["all"]
    assert e[-1] < e[0], e
    assert r2["orders"]["all"] > 0.8, r2["orders"]
    print("diphasic heat suite green")
