"""Steady flow around a circular cylinder in a channel (cut-cell NS with
JFNK), drag diagnostics — reference
examples/2D/NavierStokes/flow_around_circle_2d_steady.jl and
benchmark/navierstokes/flow_around_circle_cd_cl.jl.

Run:  python examples/2D/flow_around_cylinder.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

nx, ny = 64, 32
Lx, Ly = 4.0, 2.0
R, cx, cy = 0.2, 1.0, 1.0
Re = 20.0
U = 1.0
d = Lx / nx
mesh_p = pt.Mesh((nx, ny), (Lx, Ly), (0.0, 0.0))
mesh_ux = pt.Mesh((nx, ny), (Lx, Ly), (-0.5 * d, 0.0))
mesh_uy = pt.Mesh((nx, ny), (Lx, Ly), (0.0, -0.5 * d))
body = pt.geometry.complement(pt.geometry.circle((cx, cy), R))  # fluid outside
caps = [pt.compute_capacity(body, m, p=4, s=1)
        for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=U * 2 * R / Re, rho=1.0,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)
inlet = pt.Dirichlet(U)
noslip = pt.Dirichlet(0.0)
bc_ux = pt.BorderConditions({"left": inlet, "right": pt.Outflow(),
                             "bottom": inlet, "top": inlet})
bc_uy = pt.BorderConditions({"left": noslip, "right": pt.Outflow(),
                             "bottom": noslip, "top": noslip})
solver = NavierStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                          pt.Dirichlet(0.0))
solver.solve_steady_newton_krylov(max_iter=20, tol=1e-8)
print("Newton residual history:",
      np.array2string(np.asarray(solver.residual_history), precision=2))

fx, fy = solver.interface_force()
fx, fy = -fx, -fy  # force on the body
cd = 2 * fx / (1.0 * U**2 * 2 * R)
# mesh-converged value for THIS confined configuration (64x32 -> 256x128
# JFNK sweep: 3.3535 / 3.3465 / 3.3259): Cd ~ 3.33.  The unconfined
# literature value is ~2.0; the 20% blockage with free-stream side walls
# raises it.  Published-range validation lives in
# benchmarks/dfg_cylinder_steady.py (DFG 2D-1) and
# benchmarks/dfg_cylinder_shedding.py (DFG 2D-2).
print(f"Re=20 cylinder: body drag {fx:+.4f} -> Cd = {cd:.2f} "
      f"(mesh-converged 3.33 for this confined setup), lift {fy:+.4f}")
ux = np.asarray(solver.velocity(0))
wake = float(ux[int((cx + 2.0 * R) / d), int(cy / (Ly / ny))])
print(f"wake centerline velocity just behind the body: {wake:.3f} "
      f"(deficit vs U={U})")
assert np.isfinite(ux).all()
assert fx > 0 and abs(fy) < 0.35 * fx
assert abs(cd - 3.33) < 0.25  # +-7.5% of the converged value
assert wake < 0.8 * U
