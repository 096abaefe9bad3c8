"""Steady lid-driven cavity (Navier-Stokes, Picard) — reference
benchmark/navierstokes/lid_driven_cavity_steady.jl.

Run:  python examples/2D/lid_driven_cavity.py [Re]
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))) if "examples" in __file__ else _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

Re = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
n, L = 32, 1.0
mesh_p = pt.Mesh((n, n), (L, L), (0.0, 0.0))
d = L / n
mesh_ux = pt.Mesh((n, n), (L, L), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((n, n), (L, L), (0.0, -0.5 * d))
body = pt.geometry.full_domain(2)
caps = [pt.compute_capacity(body, m, p=4, s=1) for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=1.0 / Re, rho=1.0,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)
noslip, lid = pt.Dirichlet(0.0), pt.Dirichlet(1.0)
bc_ux = pt.BorderConditions({"left": noslip, "right": noslip, "bottom": noslip, "top": lid})
bc_uy = pt.BorderConditions({k: noslip for k in ("left", "right", "bottom", "top")})
solver = NavierStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(), pt.Dirichlet(0.0))
solver.solve_steady(max_iter=50, tol=1e-9, method="lstsq", verbose=True)

ux = np.asarray(solver.velocity(0))
center = ux[n // 2, :n]
print("vertical centerline u:", np.round(center, 4))
print("min u on centerline:", center.min())
assert center[-1] > 0.8, center[-1]     # lid speed reaches the top row
assert center.min() < -0.1, center.min()  # return-flow recirculation
