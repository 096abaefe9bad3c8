"""Liu-Fedkiw 1D diphasic diffusion benchmark (Cases 1-2).

Ports of /root/reference/BenchPhaseFlow/problems/scalar/diphasic/LiuFedkiw/
Case{1,2}.jl (Liu, Fedkiw & Kang, JCP 2000):

- Case 1: u_xx = 0 on [0,1], u(0)=0, u(1)=2, interface at 0.5, jumps
  [u] = 1, [u_x] = 0; exact u = x (left), x + 1 (right).
- Case 2: u(0)=0, u(1)=1.5, jumps [u] = 0, [u_x] = 1; exact u = x (left),
  2x - 0.5 (right).
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

from benchmarks.phaseflow.harness import convergence_study, ensure_cpu_f64

ensure_cpu_f64()

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyDiph

XI = 0.5


def _solve_case(n, u_top, sc_jump, fx_jump, u_left, u_right):
    mesh = pt.Mesh((n,), (1.0,), (0.0,))
    body1 = lambda x: x - XI       # phase 1 = left  (negative left)
    body2 = lambda x: XI - x       # phase 2 = right
    cap1 = pt.compute_capacity(body1, mesh)
    cap2 = pt.compute_capacity(body2, mesh)
    ph1 = pt.Phase(cap1, pt.make_diffusion_ops(cap1),
                   lambda x, y, z: 0.0, 1.0)
    ph2 = pt.Phase(cap2, pt.make_diffusion_ops(cap2),
                   lambda x, y, z: 0.0, 1.0)
    # 1D scalar border keys: bottom/top are the two ends (boundary.py note)
    bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(0.0),
                                "top": pt.Dirichlet(u_top)})
    ic = pt.InterfaceConditions(pt.ScalarJump(1.0, 1.0, sc_jump),
                                pt.FluxJump(1.0, 1.0, fx_jump))
    s = DiffusionSteadyDiph(ph1, ph2, bc_b, ic)
    s.solve(method="direct")
    _, _, g, f, c, e = pt.check_convergence_diph(
        u_left, u_right, s, cap1, cap2, 2, verbose=False)
    return 1.0 / n, {"all": g[2], "full": f[2], "cut": c[2], "empty": e[2]}


def run_case1(sizes=(20, 40, 80, 160), verbose=True):
    return convergence_study(
        "lf1_diphasic_value_jump",
        lambda n: _solve_case(n, 2.0, -1.0, 0.0,
                              lambda x: x, lambda x: x + 1.0),
        sizes, verbose)


def run_case2(sizes=(20, 40, 80, 160), verbose=True):
    return convergence_study(
        "lf2_diphasic_flux_jump",
        lambda n: _solve_case(n, 1.5, 0.0, -1.0,
                              lambda x: x, lambda x: 2.0 * x - 0.5),
        sizes, verbose)


if __name__ == "__main__":
    # The O(h) global level comes from the shared grid convention (border
    # Dirichlet rows act on border-cell DOFs at centers x0 / x0+L-h, as in
    # the reference mesh.jl layout); the reference's own gate is only
    # !isnan(order) (Case1.jl:149).  Gate first-order global convergence
    # and super-linear cut-cell convergence of the jump rows.
    for r in (run_case1(), run_case2()):
        assert 0.9 < r["orders"]["all"] < 2.2, r["orders"]
        assert r["orders"]["cut"] > 1.2, r["orders"]
        e = r["err"]["all"]
        assert all(e[i + 1] < e[i] for i in range(len(e) - 1)), e
    print("OK")
