"""Graetz problem with a quantitative fully-developed Nusselt gate —
reference benchmark/navierstokes_coupled/graetz_channel.jl (which gates
the near-outlet local Nusselt against parallel-plate theory Nu = 7.541).

Prescribed Poiseuille flow between isothermal cold plates, hot inlet;
STEADY advection-diffusion solve (the reference marches the coupled
solver; the scalar subproblem is linear, so the steady system is solved
directly here).  Local Nusselt uses the hydraulic diameter Dh = 2*Ly:

    Nu(x) = 2*Ly * dT/dy|wall / (T_wall - T_m(x)),  Nu_inf = 7.541

Gates: the plateau mean over the fully-developed window within 8% of
7.541, and the mixed-mean decay exponential (positive, monotone).

Run:  python benchmarks/graetz_channel.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import AdvectionDiffusionSteadyMono

nx, ny = 192, 48
Lx, Ly = 8.0, 1.0
Pe = 15.0  # u_mean * Ly / kappa


def main():
    mesh = pt.Mesh((nx, ny), (Lx, Ly), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh)
    C = np.asarray(cap.C_om)
    Y = C[..., 1]
    u_pois = jnp.asarray(6.0 * Y * (Ly - Y) / Ly**2)  # mean 1
    zero = jnp.zeros(mesh.np_shape)
    conv = pt.make_convection_ops(cap, (u_pois, zero), zero)
    bc_b = pt.BorderConditions({
        "bottom": pt.Dirichlet(1.0),   # inlet (x=0): hot
        "top": pt.Outflow(),           # outlet
        "left": pt.Dirichlet(0.0),     # cold walls (y=0, y=Ly)
        "right": pt.Dirichlet(0.0),
    })
    phase = pt.Phase(cap, conv, lambda x, y, z: 0.0, 1.0 / Pe)
    s = AdvectionDiffusionSteadyMono(phase, bc_b, pt.Dirichlet(0.0))
    s.solve(method="pgmres", tol=1e-10)

    T = np.asarray(s.x_omega)
    up = np.asarray(u_pois)
    dy = Ly / ny
    xs = C[:, 0, 0]

    # mixed-mean temperature and wall gradient (2nd-order one-sided)
    Tm = (T * up).sum(axis=1) / np.maximum(up.sum(axis=1), 1e-12)
    dTdy = (-1.5 * T[:, 0] + 2.0 * T[:, 1] - 0.5 * T[:, 2]) / dy
    Nu = 2.0 * Ly * dTdy / np.maximum(Tm, 1e-12)

    # fully-developed window: past the thermal entrance, clear of the
    # outlet; thermal development x* ~ 0.05 * Dh * Pe_Dh = 0.05*2*(2*Pe)
    x_fd = 0.05 * 2.0 * (2.0 * Pe)
    sel = (xs > x_fd) & (xs < Lx - 1.0) & (Tm > 1e-7)
    Nu_fd = float(Nu[sel].mean())
    Nu_ref = 7.541

    fit = np.polyfit(xs[sel], np.log(Tm[sel]), 1)
    print(f"grid {nx}x{ny}, Pe={Pe}: plateau window x in "
          f"[{x_fd:.1f}, {Lx-1.0:.1f}] ({int(sel.sum())} columns)")
    print(f"Nu_fd = {Nu_fd:.4f}  (theory {Nu_ref}, "
          f"dev {100*(Nu_fd/Nu_ref-1):+.2f}%)")
    print(f"mixed-mean decay rate = {-fit[0]:.4f} 1/x")
    assert abs(Nu_fd - Nu_ref) / Nu_ref <= 0.08, Nu_fd
    assert -fit[0] > 0.05
    assert np.all(np.diff(Tm[sel]) < 0)
    print("graetz gates OK")
    return Nu_fd


if __name__ == "__main__":
    main()
