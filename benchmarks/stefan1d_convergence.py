"""1D Stefan mesh/timestep convergence vs the analytic similarity solution
— reference benchmark/Stefan_1d_1ph.jl and Stefan_1d_2ph.jl (the reference
fits the front-position error over an (nx, dt) sweep with LsqFit and dumps
CSVs; same here with numpy polyfit).

One-phase: T(x,t) = T0 (1 - erf(xi)/erf(lam)), s(t) = 2 lam sqrt(k t) with
lam exp(lam^2) erf(lam) = Ste/sqrt(pi).  The sweep refines dt ~ h so the
coupled front/temperature order is observed; both the front-position error
at t_end and the weighted L2 temperature error are fitted.

Writes benchmarks/stefan1d_convergence.csv; asserts fitted order in the
reference's window and the finest-grid errors.

Run:  python benchmarks/stefan1d_convergence.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import csv
import time

import numpy as np
import jax.numpy as jnp
from scipy.special import erf, erfc

import penguin_tpu as pt
from penguin_tpu.solvers.stefan1d import (
    MovingLiquidDiffusionUnsteadyDiph,
    MovingLiquidDiffusionUnsteadyMono,
    find_lambda_stefan,
    find_lambda_stefan_two_phase,
    stefan_interface_position,
)

T0, k, St = 1.0, 1.0, 1.0
lam = find_lambda_stefan(St)
lx = 2.0
t_start, t_end = 0.05, 0.13


def run_one_phase(nx):
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    dt = 0.4 * (lx / nx) ** 1.0 * 0.05  # dt ~ h
    xf0 = stefan_interface_position(t_start, k, lam)
    cap0 = pt.compute_capacity(pt.geometry.halfspace(0, xf0), mesh)
    C = np.asarray(cap0.C_om[..., 0])
    Tw0 = jnp.asarray(np.maximum(
        T0 - T0 / erf(lam) * erf(C / (2 * np.sqrt(k * t_start))), 0.0))
    phase = pt.Phase(cap0, pt.make_diffusion_ops(cap0),
                     lambda x, y, z, t: 0.0, k)
    bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(T0),
                                "top": pt.Dirichlet(0.0)})
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, 1.0 / St))
    s = MovingLiquidDiffusionUnsteadyMono(
        phase, bc_b, pt.Dirichlet(0.0), dt,
        (Tw0, jnp.zeros(mesh.np_shape)), mesh, "BE")
    s.solve(xf0, t_start, t_end, ic, newton_params=(200, 1e-10, 1e-10, 1.0))
    t_eff = t_start + len(s.xf_log) * dt
    s_ex = stefan_interface_position(t_eff, k, lam)
    e_front = abs(float(s.xf) - s_ex)
    # weighted L2 temperature error in the liquid
    cap1 = pt.compute_capacity(pt.geometry.halfspace(0, float(s.xf)), mesh)
    V = np.asarray(cap1.V)
    T = np.asarray(s.x[0])
    Tex = np.maximum(T0 - T0 / erf(lam) * erf(C / (2 * np.sqrt(k * t_eff))),
                     0.0)
    eT = float(np.sqrt((((T - Tex) ** 2) * V).sum() / max(V.sum(), 1e-300)))
    return e_front, eT


def run_two_phase(nx):
    st_l, st_s, rhoL = 1.0, 0.2, 1.0
    T_l0, T_s0 = st_l * rhoL, -st_s * rhoL
    lam2 = find_lambda_stefan_two_phase(st_l, st_s)
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    dt = 0.4 * (lx / nx) * 0.05
    xf0 = 2 * lam2 * np.sqrt(t_start)
    cap1 = pt.compute_capacity(pt.geometry.halfspace(0, xf0), mesh)
    cap2 = pt.compute_capacity(pt.geometry.halfspace(0, xf0, -1.0), mesh)
    ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1),
                   lambda x, y, z, t: 0.0, 1.0)
    ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2),
                   lambda x, y, z, t: 0.0, 1.0)
    bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(T_l0),
                                "top": pt.Dirichlet(T_s0)})
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, 0.0),
                                pt.FluxJump(1.0, 1.0, rhoL))
    C = np.asarray(cap1.C_om[..., 0])
    T1w = jnp.asarray(np.where(
        C <= xf0, T_l0 * (1 - erf(C / (2 * np.sqrt(t_start))) / erf(lam2)),
        0.0))
    T2w = jnp.asarray(np.where(
        C >= xf0, T_s0 * (1 - erfc(C / (2 * np.sqrt(t_start))) / erfc(lam2)),
        0.0))
    z = jnp.zeros(mesh.np_shape)
    s = MovingLiquidDiffusionUnsteadyDiph(ph1, ph2, bc_b, ic, dt,
                                          (T1w, z, T2w, z), mesh, "BE")
    s.solve(xf0, t_start, t_end, newton_params=(200, 1e-10, 1e-10, 1.0),
            p=6, s=1)
    t_eff = t_start + len(s.xf_log) * dt
    return abs(float(s.xf) - 2 * lam2 * np.sqrt(t_eff))


if __name__ == "__main__":
    ns = [32, 48, 64, 96, 128]
    rows = []
    for nx in ns:
        t0 = time.time()
        ef, eT = run_one_phase(nx)
        ef2 = run_two_phase(nx)
        rows.append((nx, ef, eT, ef2))
        print(f"n={nx:4d}: 1ph front err {ef:.3e}  T L2 {eT:.3e}  "
              f"2ph front err {ef2:.3e}   ({time.time() - t0:.1f}s)")
    out = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "stefan1d_convergence.csv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["nx", "front_err_1ph", "T_L2_1ph", "front_err_2ph"])
        w.writerows(rows)
    arr = np.asarray(rows, float)
    p_f = -np.polyfit(np.log(arr[:, 0]), np.log(arr[:, 1] + 1e-16), 1)[0]
    p_T = -np.polyfit(np.log(arr[:, 0]), np.log(arr[:, 2] + 1e-16), 1)[0]
    p_f2 = -np.polyfit(np.log(arr[:, 0]), np.log(arr[:, 3] + 1e-16), 1)[0]
    print(f"fitted orders: 1ph front {p_f:.2f}, 1ph T {p_T:.2f}, "
          f"2ph front {p_f2:.2f}  -> {out}")
    assert all(np.isfinite(arr).ravel())
    # measured (f64 CPU): fronts 6.9e-3 / 8.2e-3 at n=128; orders
    # 1.12 / 1.03 / 1.12 — the coupled front/BE scheme is first order,
    # as in the reference's LsqFit tables
    assert arr[-1, 1] < 1e-2 and arr[-1, 3] < 1.2e-2  # finest-grid fronts
    assert p_f > 0.9 and p_T > 0.9 and p_f2 > 0.9     # ~O(h)
    print("OK")
