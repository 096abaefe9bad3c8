"""Prescribed-motion Stokes CONSISTENCY check: a wall that does not move
must reproduce the static cut-cell Stokes solution exactly — reference
examples/1D/Stokes/prescribedmotion/static_consistency.jl:13-50.

The space-time slab machinery with a time-independent body collapses to
the static capacities; the moving solver's answer must equal the plain
StokesMono solve on the same half-domain to machine precision.

Run:  python examples/1D/stokes_static_consistency.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_stokes import MovingStokesMono
from penguin_tpu.solvers.stokes import StokesMono, PinPressureGauge

n, L = 40, 1.0
d = L / n
mesh_p = pt.Mesh((n,), (L,), (0.0,))
mesh_u = pt.Mesh((n,), (L,), (-0.5 * d,))
wall = 0.5 * L + 0.013  # static wall off the grid lines
G = 2.0                  # body force drives the open half

body_static = lambda x: wall - x      # fluid (sdf<0) at x > wall
body_st = lambda x, tau, params: wall - x


def make_fluid():
    cap_u = pt.compute_capacity(body_static, mesh_u, p=4, s=1)
    cap_p = pt.compute_capacity(body_static, mesh_p, p=4, s=1)
    return pt.Fluid(
        mesh_u=(mesh_u,), mesh_p=mesh_p,
        capacity_u=(cap_u,), operator_u=(pt.make_diffusion_ops(cap_u),),
        capacity_p=cap_p, operator_p=pt.make_diffusion_ops(cap_p),
        mu=1.0, rho=1.0,
        f_u=lambda x, y, z: G, f_p=lambda x, y, z: 0.0,
    )


# the column is DRIVEN: both the outer end and the (frozen) wall slide at
# V, so the incompressible 1D column must sit at exactly u == V — a
# nontrivial field the moving machinery must reproduce without drift
V = 0.4
bc_u = pt.BorderConditions({"bottom": pt.Dirichlet(V),
                            "top": pt.Dirichlet(V)})

# static solve
s_static = StokesMono(make_fluid(), (bc_u,), PinPressureGauge(),
                      pt.Dirichlet(V))
s_static.solve(method="direct")
u_static = np.asarray(s_static.velocity(0))

# moving solver, body frozen: a few slabs, the answer must not drift
s_mov = MovingStokesMono(make_fluid(), (bc_u,), PinPressureGauge(),
                         pt.Dirichlet(V))
s_mov.solve(body_st, 0.05, 0.0, 0.25, scheme="BE", p=4, s=1)
u_mov = np.asarray(s_mov.velocity(0))

live = np.asarray(pt.compute_capacity(body_static, mesh_u, p=4, s=1).V) > 1e-12
dev = np.abs(u_mov - u_static)[live].max()
scale = np.abs(u_static[live]).max()
print(f"moving(frozen wall) vs static Stokes: max |du| = {dev:.2e} "
      f"(field scale {scale:.3f})")
assert np.isfinite(u_mov[live]).all()
assert dev < 1e-8 * max(scale, 1.0)
print("prescribed-motion Stokes is static-consistent")
