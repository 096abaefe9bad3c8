"""Volume-weighted error norms split by cell type — the project's primary
verification metric (re-design of ``/root/reference/src/convergence.jl``)."""

from __future__ import annotations

import numpy as np

__all__ = ["lp_norm", "check_convergence", "check_convergence_diph"]


def lp_norm(errors, mask, p, capacity):
    """Volume-weighted Lp (or L-inf) norm over cells selected by ``mask``.

    Matches the reference definition (src/convergence.jl:4-15):
    ``(Σ_i |e_i|^p V_i / Σ_all V)^(1/p)``.
    """
    errors = np.asarray(errors)
    V = np.asarray(capacity.V)
    mask = np.asarray(mask, dtype=bool)
    if np.isinf(p):
        if not mask.any():
            return 0.0
        return float(np.abs(errors[mask]).max())
    num = float((np.abs(errors[mask]) ** p * V[mask]).sum())
    den = float(V.sum())
    return (num / den) ** (1.0 / p)


def _eval_analytic(u_analytical, capacity):
    C = np.asarray(capacity.C_om)
    N = C.shape[-1]
    coords = [C[..., d] for d in range(N)]
    return np.asarray(u_analytical(*coords))


def check_convergence(u_analytical, solver, capacity, p=2, relative=False,
                      verbose=True):
    """Compare the solver's bulk field against an analytic solution at cell
    centroids; returns (u_ana, u_num, global, full, cut, empty) errors."""
    u_ana = _eval_analytic(u_analytical, capacity)
    u_num = np.asarray(solver.x_omega)
    err = u_ana - u_num
    if relative:
        err = err / np.where(np.abs(u_ana) > 0, u_ana, 1.0)

    ct = np.asarray(capacity.cell_types)
    masks = {
        "all": (ct == 1) | (ct == -1),
        "full": ct == 1,
        "cut": ct == -1,
        "empty": ct == 0,
    }
    out = {k: lp_norm(err, m, p, capacity) for k, m in masks.items()}
    if verbose:
        for k, v in out.items():
            print(f"{k:>5s} cells L{p} norm = {v:.6e}")
    return (u_ana, u_num, out["all"], out["full"], out["cut"], out["empty"])


def check_convergence_diph(u1_analytical, u2_analytical, solver, capacity1,
                           capacity2, p=2, relative=False, verbose=True):
    res1 = check_convergence(u1_analytical, solver.phase_view(0), capacity1, p,
                             relative, verbose=False)
    res2 = check_convergence(u2_analytical, solver.phase_view(1), capacity2, p,
                             relative, verbose=False)
    u_ana = (res1[0], res2[0])
    u_num = (res1[1], res2[1])
    glob = (res1[2], res2[2], max(res1[2], res2[2]))
    full = (res1[3], res2[3], max(res1[3], res2[3]))
    cut = (res1[4], res2[4], max(res1[4], res2[4]))
    empty = (res1[5], res2[5], max(res1[5], res2[5]))
    if verbose:
        print(f"phase1 global L{p}={glob[0]:.4e}  phase2 global L{p}={glob[1]:.4e}")
    return (u_ana, u_num, glob, full, cut, empty)
