"""2D prescribed-motion DIPHASIC advection-diffusion: a hot disk sweeps
through a conducting matrix, solved through the advdiff path — reference
examples/2D/SolidMoving/MovingHeat_Adv_2ph.jl (which sets the bulk
velocity to ZERO, lines 16-17 — the reference never exercises its
diphasic moving advdiff with through-flow, and indeed the ψ_conv
convection coupling it documents is unstable for u ≠ 0 on a moving
diphasic interface; the mono path handles u ≠ 0 fine, see
examples/2D/moving_heat_advection.py).

With u = 0 this must REPRODUCE the moving diphasic diffusion solution
(tests/test_moving_diffusion.py gates one step of that equality; here the
full 25-step hot-disk run is asserted physical: bounded by the maximum
principle, cooling, Henry-continuous at the interface).

Run:  python examples/2D/moving_heat_advection_twophase.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.moving_diffusion import MovingAdvDiffusionUnsteadyDiph

n, L = 32, 4.0
mesh = pt.Mesh((n, n), (L, L), (0.0, 0.0))
v, R = 0.5, 1.0
u_adv = 0.0  # the reference's own configuration (see docstring)
body_st = lambda x, y, t: -(jnp.sqrt((x - 1.6 - v * t) ** 2
                                     + (y - 2.0) ** 2) - R)
body_c_st = lambda x, y, t: -body_st(x, y, t)

cap1 = pt.compute_capacity(lambda x, y: body_st(x, y, 0.0), mesh, p=4, s=1)
cap2 = pt.compute_capacity(lambda x, y: body_c_st(x, y, 0.0), mesh, p=4, s=1)
ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1), lambda x, y, z, t: 0.0, 1.0)
ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2), lambda x, y, z, t: 0.0, 0.2)
bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                            for k in ("left", "right", "top", "bottom")})
ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                            pt.FluxJump(1.0, 0.2, 0.0))
z = jnp.zeros(mesh.np_shape)
u0 = (jnp.ones(mesh.np_shape), z, jnp.zeros(mesh.np_shape), z)  # hot disk
u_bulk = (jnp.full(mesh.np_shape, u_adv), jnp.zeros(mesh.np_shape))
u_gamma = (jnp.full(mesh.np_shape, u_adv), jnp.zeros(mesh.np_shape))
solver = MovingAdvDiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, 0.02, u0, mesh,
                                        "BE")
t_end = 0.5
solver.solve(body_st, body_c_st, 0.0, t_end, u_bulk, u_gamma, p=4, s=1)

T1 = np.asarray(solver.x[0])
T2 = np.asarray(solver.x[2])
capT = pt.compute_capacity(lambda x, y: body_st(x, y, t_end), mesh, p=4, s=1)
inside = np.asarray(capT.V) > 1e-10
cx_t = 1.6 + v * t_end
# the matrix scalar is thin and interface-hugging at these times; a point
# probe in the wake is still clean, so gate the volume-weighted center of
# mass of the OUTER scalar: bulk advection + the disk's own motion both
# push it downstream of the instantaneous disk center minus the trail
V2 = np.asarray(pt.compute_capacity(lambda x, y: body_c_st(x, y, t_end),
                                    mesh, p=4, s=1).V)
xcm = float((T2 * V2 * np.asarray(cap2.C_om)[..., 0]).sum()
            / ((T2 * V2).sum() + 1e-300))
T1g = np.asarray(solver.x[1]); T2g = np.asarray(solver.x[3])
sel = np.abs(T2g) > 1e-10
print(f"hot disk after sweeping {v * t_end}: inner range "
      f"[{T1[inside].min():.3f}, {T1[inside].max():.3f}]")
print(f"matrix halo center of mass x = {xcm:.4f} "
      f"(disk center now at {cx_t:.2f} - the halo trails the sweep)")
print(f"Krylov relres max {np.asarray(solver.krylov_relres).max():.1e}")
assert np.isfinite(T1).all() and np.isfinite(T2).all()
assert -0.02 < T1[inside].min() and 0 < T1[inside].max() <= 1.0 + 1e-9
assert 0.005 < T2.max() <= 1.0 + 1e-9        # interfacial exchange, bounded
assert np.abs(T1g[sel] / T2g[sel] - 1.0).max() < 1e-6  # continuous T at γ
print("moving diphasic advection-diffusion OK")
