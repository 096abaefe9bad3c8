"""DFG 2D-1 STEADY benchmark (Schaefer & Turek 1996): laminar flow around
a cylinder at Re=20 with published drag/lift/pressure-drop ranges —
the quantitative steady companion of benchmarks/dfg_cylinder_shedding.py
(mirrors /root/reference/benchmark/navierstokes/flow_around_circle_cd_cl.jl
geometry; the reference script only runs the unsteady case).

Geometry: channel 2.2 x 0.41, cylinder r=0.05 at (0.2, 0.2); parabolic
inflow with Umax = 0.3 -> Ubar = 0.2, nu = 1e-3 -> Re = Ubar D / nu = 20.
Published ranges: Cd in [5.5700, 5.5900], Cl in [0.0104, 0.0110],
dP in [0.1172, 0.1176].

Measured (TPU v5e, f32, round 5 — fgmres/DCT-Schur JFNK; EXACT wall
geometry via the -h/2 origin shift + ghost wall rows + DOF-centroid BC
sampling; moment-consistent cut flux DEFAULT; forces by BOTH the rim
traction integral and the control-volume momentum-deficit integral;
pressure probes by the O(h²) least-squares fit at the exact DFG points):

- 256x128 (R/dx ~ 5.8):  **Cd 5.5810 — INSIDE the published band**,
  Cl +0.01033 (0.7% under the band edge), **dP 0.1177 (+0.08% above
  the band edge; the legacy nearest-centroid probe reads 0.1161/-1.1%
  — the probe offset WAS most of the dP "error")**; JFNK digs to
  |R| ~ 2e-8
- 512x256 (`--fine`):    Cd 5.6517 (+1.3%), Cl +0.01259, dP 0.1178;
  JFNK stalls at |R| ~ 1.6e-5 (f32); rim and three CV boxes agree to
  0.5%, so the fine-grid Cd excess is the resolved flow, not the
  force measurement (refinement trend: docs/benchmarks/dfg_cylinder.md)

Two honesty notes: (a) the round-3 record (Cd 5.4685/-2.0%, dP -8.3%)
came from a JFNK run that silently STALLED at |R| ~ 2e-2 (the
Chebyshev-Schur preconditioner's power-iteration bounds are f32-fragile
here; fgmres/DCT-Schur converges every run); (b) before the geometry fix
the channel walls sat h/2 high (mesh convention) and the inflow profile
was sampled half a cell off the DOF centroids — at 256x128 that was
worth +7% on Cd (6.19 -> 5.79).

Run (TPU):  python benchmarks/dfg_cylinder_steady.py [--coarse|--fine]
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.navierstokes import NavierStokesMono
from penguin_tpu.solvers.stokes import PinPressureGauge

coarse = "--coarse" in _sys.argv
fine = "--fine" in _sys.argv
grid_probe = "--grid" in _sys.argv
if grid_probe:  # refinement-trend probe: --grid NX (ny=NX/2), no gates
    nx = int(_sys.argv[_sys.argv.index("--grid") + 1])
    nx, ny = nx, nx // 2
else:
    nx, ny = (128, 64) if coarse else ((512, 256) if fine else (256, 128))
Lx, Ly = 2.2, 0.41
R, cx, cy = 0.05, 0.2, 0.2
D = 2 * R
Umax, Ubar = 0.3, 0.2
rho, nu = 1.0, 1e-3

dx = Lx / nx
dy = Ly / ny
# mesh convention: integration cells span [x0 + h/2, x0 + L + h/2]
# (mesh.py), so shift the origin half a cell to put the channel walls
# exactly at y = 0 and y = Ly (ghost wall rows impose no-slip THERE) —
# otherwise the walls sit h/2 high and the midline misses the cylinder
# offset that seeds the DFG asymmetry
mesh_p = pt.Mesh((nx, ny), (Lx, Ly), (-0.5 * dx, -0.5 * dy))
mesh_ux = pt.Mesh((nx, ny), (Lx, Ly), (-dx, -0.5 * dy))
mesh_uy = pt.Mesh((nx, ny), (Lx, Ly), (-0.5 * dx, -dy))
body = pt.geometry.complement(pt.geometry.circle((cx, cy), R))
# moment-consistent cut flux by default (--centroid reverts)
moment = "--centroid" not in _sys.argv
caps = [pt.compute_capacity(body, m, p=4, s=1, dtype=jnp.float32,
                            cut_moments=moment)
        for m in (mesh_ux, mesh_uy, mesh_p)]
fluid = pt.Fluid(
    mesh_u=(mesh_ux, mesh_uy), mesh_p=mesh_p,
    capacity_u=(caps[0], caps[1]),
    operator_u=(pt.make_diffusion_ops(caps[0]), pt.make_diffusion_ops(caps[1])),
    capacity_p=caps[2], operator_p=pt.make_diffusion_ops(caps[2]),
    mu=rho * nu, rho=rho,
    f_u=lambda x, y, z: 0.0, f_p=lambda x, y, z: 0.0,
)


def inflow(x, y, z=0.0, t=None):
    xi = y / Ly
    return Umax * 4.0 * xi * (1.0 - xi)


noslip = pt.Dirichlet(0.0)
bc_ux = pt.BorderConditions({"left": pt.Dirichlet(inflow),
                             "right": pt.Outflow(),
                             "bottom": noslip, "top": noslip})
bc_uy = pt.BorderConditions({"left": noslip, "right": noslip,
                             "bottom": noslip, "top": noslip})
solver = NavierStokesMono(fluid, (bc_ux, bc_uy), PinPressureGauge(),
                          pt.Dirichlet(0.0), wall_row="ghost",
                          cut_flux="moment" if moment else "centroid")

iters = (int(_sys.argv[_sys.argv.index("--iters") + 1])
         if "--iters" in _sys.argv else 25)
restart = (int(_sys.argv[_sys.argv.index("--restart") + 1])
           if "--restart" in _sys.argv else 100)
mom = "cg" if "--mom-cg" in _sys.argv else "jacobi"
t0 = time.time()
solver.solve_steady_newton_krylov(max_iter=iters, tol=1e-10,
                                  lin_maxiter=800, restart=restart,
                                  mom=mom)
wall = time.time() - t0
print(f"{nx}x{ny} steady JFNK: {wall:.1f} s, residuals "
      + " ".join("%.1e" % r for r in solver.residual_history))
print("inner fgmres iters/newton: "
      + " ".join(str(i) for i in solver.newton_lin_iters))

fx, fy = solver.interface_force()
fx, fy = -fx, -fy
scale = 0.5 * rho * Ubar**2 * D
Cd_rim, Cl_rim = fx / scale, fy / scale
# control-volume (momentum-deficit) force on grid lines ~6 cells off the
# rim: converges at the bulk order instead of the O(h) cut-rim rate
fcx, fcy = solver.control_volume_force((0.10, 0.32, 0.08, 0.32))
Cd, Cl = fcx / scale, fcy / scale
print(f"rim-integral   Cd = {Cd_rim:.4f}  Cl = {Cl_rim:+.5f}")
# CV-box sensitivity: a correct steady state makes the surface integral
# box-independent; spread across boxes = the CV discretization error bar
for bx in ((0.08, 0.36, 0.06, 0.34), (0.12, 0.28, 0.10, 0.30),
           (0.10, 0.44, 0.08, 0.32)):
    bfx, bfy = solver.control_volume_force(bx)
    print(f"  CV box {bx}: Cd = {bfx / scale:.4f}  Cl = {bfy / scale:+.5f}")
if "--save" in _sys.argv:
    np.savez(f"/tmp/dfg_steady_{nx}x{ny}.npz",
             **{f"x{i}": np.asarray(a) for i, a in enumerate(solver.x)})
    print(f"state saved to /tmp/dfg_steady_{nx}x{ny}.npz")

# front/back pressure probes (DFG points A/B) — O(h²) least-squares fit
# at the EXACT surface points; the nearest-active-centroid probe reads
# the pressure up to ~h away from a stagnation point (O(h): -1.1% on dP
# at this grid, measured)
pA, pB = solver.pressure_probe([(0.15, 0.2), (0.25, 0.2)])
dP = pA - pB  # physical front-minus-back pressure drop

# legacy nearest-centroid probe, printed for the record
pc = np.asarray(caps[2].C_om)
act = np.asarray(solver.p_active)


def probe(pt_xy):
    d2 = (pc[..., 0] - pt_xy[0]) ** 2 + (pc[..., 1] - pt_xy[1]) ** 2
    d2 = np.where(act, d2, np.inf)
    return np.unravel_index(np.argmin(d2), d2.shape)


p = np.asarray(solver.x[2 * solver.N])
dP_near = p[probe((0.25, 0.2))] - p[probe((0.15, 0.2))]  # state = -p_phys
print(f"dP nearest-centroid = {dP_near:.4f}  (legacy O(h) probe)")

print(f"Cd = {Cd:.4f}   (DFG 2D-1: 5.5700-5.5900)")
print(f"Cl = {Cl:+.5f}  (DFG 2D-1: 0.0104-0.0110)")
print(f"dP = {dP:.4f}   (DFG 2D-1: 0.1172-0.1176)")
assert np.isfinite([Cd, Cl, dP]).all()
if grid_probe:
    pass  # trend probe: record only
elif fine:
    assert abs(Cd - 5.58) < 0.10, Cd          # 1.8% (measured 5.6517,
    #   +1.3% — the resolved-flow drift documented above; rim/CV agree)
    assert 0.008 < Cl < 0.014, Cl
    assert abs(dP - 0.1174) < 0.0006, dP      # 0.5% (measured 0.1178)
elif not coarse:
    assert abs(Cd - 5.58) < 0.06, Cd          # 1% (measured 5.5810)
    assert 0.008 < Cl < 0.014, Cl             # measured +0.01033
    assert abs(dP - 0.1174) < 0.0005, dP      # 0.4% (measured 0.1177;
    #   published band 0.1172-0.1176 is ±0.2% — the LSQ probe lands
    #   1e-4 above it, vs -1.1% for the nearest-centroid probe)
print("OK")
