"""Mesh-refinement sweep for the embedded-wall Poiseuille channel —
reference examples/2D/Stokes/poiseuille_refinement_2d.jl.

The channel walls sit strictly between grid lines at every n, so the cut
rows are always active; the sweep fits the observed L2 convergence order
of the velocity against the exact parabola (reference: order ~2 in the
bulk with first-order cut rows at the two wall bands).

Run:  python examples/2D/poiseuille_refinement.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import StokesMono, PinPressureGauge

L, mu = 1.0, 1.0
y_lo, y_hi = 0.181, 0.823   # embedded walls, never on a grid line
W = y_hi - y_lo
G = 8.0 * mu / W**2          # peak velocity 0.25


def solve(n):
    d = L / n
    mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
    mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
    mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
    chan = lambda x, y: jnp.maximum(y_lo - y, y - y_hi)
    caps = [pt.compute_capacity(chan, m, p=4, s=1)
            for m in (mesh_ux, mesh_uy, mesh_p)]
    per_ax = (True, False)  # streamwise-periodic OPERATORS (not just rows)
    fluid = pt.Fluid(
        mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
        capacity_u=(caps[0], caps[1]),
        operator_u=(pt.make_diffusion_ops(caps[0], periodic=per_ax),
                    pt.make_diffusion_ops(caps[1], periodic=per_ax)),
        capacity_p=caps[2],
        operator_p=pt.make_diffusion_ops(caps[2], periodic=per_ax),
        mu=mu, rho=1.0,
        f_u=(lambda x, y, z: G, lambda x, y, z: 0.0),
        f_p=lambda x, y, z: 0.0,
    )
    per = pt.Periodic()
    ns = pt.Dirichlet(0.0)
    bc_ux = pt.BorderConditions({"left": per, "right": per,
                                 "bottom": ns, "top": ns})
    bc_uy = pt.BorderConditions({"left": per, "right": per,
                                 "bottom": ns, "top": ns})
    s = StokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                   pt.Dirichlet(0.0))
    s.solve(method="schur_gmres", tol=1e-11)
    ux = np.asarray(s.velocity(0))[:n, :n]
    C = np.asarray(caps[0].C_om)[:n, :n]
    V = np.asarray(caps[0].V)[:n, :n]
    y = C[..., 1]
    u_ex = G / (2 * mu) * np.maximum((y - y_lo) * (y_hi - y), 0.0)
    live = V > 1e-12
    num = ((ux - u_ex) ** 2 * V)[live].sum()
    den = (u_ex ** 2 * V)[live].sum()
    return float(np.sqrt(num / den))


ns = [16, 32, 64]
errs = [solve(n) for n in ns]
for n, e in zip(ns, errs):
    print(f"n={n:3d}: weighted L2 rel err = {e:.3e}")
p = np.polyfit(np.log(ns), np.log(errs), 1)[0]
print(f"fitted convergence order = {-p:.2f}")
assert all(np.isfinite(errs)) and errs[-1] < errs[0]
assert 0.9 < -p < 2.6   # reference window: between the cut-row order and 2
assert errs[-1] < 2e-2
print("Poiseuille refinement sweep OK")
