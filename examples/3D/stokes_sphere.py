"""3D Stokes flow around an embedded sphere in a box (uniform stream walls)
— reference examples/3D/Stokes/flow_around_sphere_3d.jl.

Run:  python examples/3D/stokes_sphere.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.stokes import StokesMono, PinPressureGauge

n, L, R = 8, 4.0, 0.9
d = L / n
mesh_p = pt.Mesh((n, n, n), (L, L, L), (0.0, 0.0, 0.0))
meshes_u = [pt.Mesh((n, n, n), (L, L, L),
                    tuple(-0.5 * d if i == a else 0.0 for i in range(3)))
            for a in range(3)]
body = pt.geometry.complement(
    pt.geometry.sphere((L / 2 + 0.01,) * 3, R))  # fluid outside
caps_u = [pt.compute_capacity(body, m, p=4, s=1) for m in meshes_u]
cap_p = pt.compute_capacity(body, mesh_p, p=4, s=1)
fluid = pt.Fluid(
    mesh_u=tuple(meshes_u), mesh_p=mesh_p,
    capacity_u=tuple(caps_u),
    operator_u=tuple(pt.make_diffusion_ops(c) for c in caps_u),
    capacity_p=cap_p, operator_p=pt.make_diffusion_ops(cap_p),
    mu=1.0, rho=1.0,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)
U = 1.0
stream, still = pt.Dirichlet(U), pt.Dirichlet(0.0)
keys = ("left", "right", "bottom", "top", "backward", "forward")
bc_ux = pt.BorderConditions({k: stream for k in keys})
bc_uy = pt.BorderConditions({k: still for k in keys})
bc_uz = pt.BorderConditions({k: still for k in keys})
solver = StokesMono(fluid, (bc_ux, bc_uy, bc_uz), PinPressureGauge(),
                    pt.Dirichlet(0.0))
solver.solve(method="lstsq")

F = solver.interface_force()
drag = -F[0]
side = np.hypot(F[1], F[2])
stokes_free = 6 * np.pi * 1.0 * U * R  # unconfined Stokes drag
print(f"sphere drag {drag:.2f} (free-space 6πμUR = {stokes_free:.2f}; "
      f"confinement raises it), side force {side:.3f}")
ux = np.asarray(solver.velocity(0))
assert np.isfinite(ux).all()
assert drag > stokes_free          # wall confinement increases drag
assert side < 0.1 * drag           # symmetric (coarse-grid staggering)
