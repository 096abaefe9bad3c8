"""Decaying 4-lobed ice crystal in a warm melt, with an
anisotropy-strength sweep and a lobe-count gate — reference
examples/2D/StefanFT/crystal.jl:1-485 + crystal_.jl:1-492 (the faceted-
seed pair: a circle perturbed by r(θ) = R₀(1 + a·cos 4θ) melting in
liquid at T∞ = +1, the sign-reversed companion of crystal_growth.py).

Behavioral gates (the reference scripts only plot):
- the crystal AREA shrinks monotonically (melting);
- the dominant angular Fourier mode of the marker radius stays 4 for
  every seed amplitude (the lobe count survives the melt);
- melting SMOOTHS: the lobe contrast (mode-4 amplitude) decays — the
  curvature-driven inverse of the Mullins-Sekerka growth instability —
  and the stronger seed keeps the larger contrast throughout.

Run:  python examples/2D/crystal_melting_sweep.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.front_tracking import FrontTracker
from penguin_tpu.solvers.stefan2d import StefanMono2D

T_inf = 1.0          # warm liquid: Ste = c(T_inf - TM)/L = 1, melting
L_dom, center = 8.0, (4.0, 4.0)
nx = ny = 48
mesh = pt.Mesh((nx, ny), (L_dom, L_dom), (0.0, 0.0))
dt = 0.01
R0 = 1.2
n_lobes = 4
n_steps = 8


def mode_spectrum(mk):
    r = np.sqrt((mk[:, 0] - center[0]) ** 2 + (mk[:, 1] - center[1]) ** 2)
    th = np.arctan2(mk[:, 1] - center[1], mk[:, 0] - center[0])
    order = np.argsort(th)
    spec = np.abs(np.fft.rfft(r[order] - r.mean())) / r.size
    return r, spec


results = {}
for amp in (0.05, 0.10):
    front = FrontTracker().create_crystal(center, R0, n=128,
                                          n_lobes=n_lobes, amplitude=amp)
    cap0 = pt.compute_capacity(lambda x, y: -front.sdf(x, y), mesh,
                               p=4, s=1)
    C = np.asarray(cap0.C_om)
    r = np.sqrt((C[..., 0] - center[0]) ** 2 + (C[..., 1] - center[1]) ** 2)
    Tw0 = jnp.asarray(np.where(r > R0, T_inf, 0.0))
    bc_b = pt.BorderConditions({k: pt.Dirichlet(float(T_inf))
                                for k in ("left", "right", "top",
                                          "bottom")})
    phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0),
                     lambda x, y, z, t: 0.0, 1.0)
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, 1.0))
    solver = StefanMono2D(phase, bc_b, pt.Dirichlet(0.0), dt,
                          (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE")
    A0 = front.area()
    # jac="intercept": robust for INWARD motion (see stefan_melting_disk)
    solver.solve(front, 0.0, n_steps * dt, ic,
                 newton_params=(10, 1e-4, 1e-6, 1.0),
                 interior_fluid=False, method="bicgstab", p=4, s=1,
                 jac="intercept", smooth_window=3, smooth_passes=1,
                 max_disp_cells=0.4)
    areas = []
    for mk in solver.marker_log:
        mk = np.asarray(mk)
        x, y = mk[:, 0], mk[:, 1]
        areas.append(0.5 * abs(np.sum(x * np.roll(y, -1)
                                      - np.roll(x, -1) * y)))
    r_fin, spec_fin = mode_spectrum(np.asarray(solver.markers))
    mk0 = np.asarray(FrontTracker().create_crystal(
        center, R0, n=128, n_lobes=n_lobes, amplitude=amp).markers)
    _, spec0 = mode_spectrum(mk0)
    dom0 = int(np.argmax(spec0[1:]) + 1)
    dom_fin = int(np.argmax(spec_fin[1:]) + 1)
    results[amp] = dict(areas=areas, dom0=dom0, dom=dom_fin,
                        c0=spec0[n_lobes], c=spec_fin[n_lobes])
    print(f"amp={amp:.2f}: area {areas[0]:.4f} -> {areas[-1]:.4f}, "
          f"dominant mode {dom0} -> {dom_fin}, "
          f"mode-4 amplitude {spec0[n_lobes]:.4f} -> "
          f"{spec_fin[n_lobes]:.4f}")
    assert all(areas[i + 1] < areas[i] for i in range(len(areas) - 1)), \
        areas                                     # melting shrinks
    assert dom0 == n_lobes and dom_fin == n_lobes, (dom0, dom_fin)
    assert spec_fin[n_lobes] < spec0[n_lobes]     # melting smooths

# the stronger seed keeps the larger lobe contrast throughout the melt
assert results[0.10]["c"] > results[0.05]["c"], results
print("OK")
