"""Unit tests for the pytree Krylov layer (pcg / pbicgstab / pgmres /
row_norm_equilibrator) — the moving-solver and JFNK workhorses."""

import numpy as np
import jax
import jax.numpy as jnp

from penguin_tpu.linsolve import (
    pcg,
    pbicgstab,
    pgmres,
    row_norm_equilibrator,
)


def _spd(n, key):
    A = jax.random.normal(key, (n, n))
    return A @ A.T + n * jnp.eye(n)


def test_pcg_spd_converges():
    n = 120
    A = _spd(n, jax.random.PRNGKey(0))
    xt = jax.random.normal(jax.random.PRNGKey(1), (n,))
    b = A @ xt
    x, it, res = pcg(lambda v: A @ v, b, jnp.zeros(n),
                     Minv=1.0 / jnp.diagonal(A), tol=1e-12, maxiter=500)
    assert float(res) < 1e-10
    assert np.abs(np.asarray(x - xt)).max() < 1e-7


def test_pbicgstab_nonsymmetric():
    n = 120
    A = (3.0 * jnp.eye(n)
         + 0.5 * jax.random.normal(jax.random.PRNGKey(2), (n, n)) / np.sqrt(n))
    xt = jax.random.normal(jax.random.PRNGKey(3), (n,))
    b = A @ xt
    x, it, res = pbicgstab(lambda v: A @ v, b, jnp.zeros(n),
                           tol=1e-12, maxiter=500)
    assert float(res) < 1e-10
    assert np.abs(np.asarray(x - xt)).max() < 1e-7


def test_pbicgstab_rho_breakdown_restart():
    """A system engineered so (rhat, r) hits ~0 mid-iteration: without the
    restart the 1/rho guard amplifies garbage; with it the solve finishes."""
    n = 60
    # skew-dominated matrix: BiCGStab's shadow residual decorrelates fast
    S = jax.random.normal(jax.random.PRNGKey(4), (n, n)) / np.sqrt(n)
    A = jnp.eye(n) + 2.0 * (S - S.T)
    xt = jax.random.normal(jax.random.PRNGKey(5), (n,))
    b = A @ xt
    x, it, res = pbicgstab(lambda v: A @ v, b, jnp.zeros(n),
                           tol=1e-10, maxiter=2000)
    assert np.isfinite(np.asarray(x)).all()
    assert float(res) < 1e-8


def test_pgmres_pytree_and_restart():
    n = 160
    A = (3.0 * jnp.eye(n)
         + 0.5 * jax.random.normal(jax.random.PRNGKey(6), (n, n)) / np.sqrt(n))
    xt = jax.random.normal(jax.random.PRNGKey(7), (n,))
    b = A @ xt

    def ap(x):
        v = jnp.concatenate([x[0], x[1]["z"]])
        y = A @ v
        return (y[: n // 2], {"z": y[n // 2:]})

    bt = (b[: n // 2], {"z": b[n // 2:]})
    x0 = (jnp.zeros(n // 2), {"z": jnp.zeros(n // 2)})
    x, it, res = pgmres(ap, bt, x0, tol=1e-12, maxiter=600, restart=25)
    got = np.concatenate([np.asarray(x[0]), np.asarray(x[1]["z"])])
    assert float(res) < 1e-10
    assert np.abs(got - np.asarray(xt)).max() < 1e-7
    # telemetry counts ACTUAL Arnoldi iterations: the early-exit cycle
    # (round 4) stops at the Givens residual instead of running whole
    # restart blocks, so the count is exact and <= maxiter
    assert 0 < int(it) <= 25


def test_row_equilibrated_pgmres_beats_raw_scaling():
    """Badly row-scaled system (1e-6..1 rows): the Rademacher row-norm
    estimate must recover the row scales well enough that left-equilibrated
    GMRES converges where the raw operator's restarted GMRES stalls."""
    n = 150
    A = (3.0 * jnp.eye(n)
         + 0.5 * jax.random.normal(jax.random.PRNGKey(8), (n, n)) / np.sqrt(n))
    D = 10.0 ** (-6 * jax.random.uniform(jax.random.PRNGKey(9), (n,)))
    As = D[:, None] * A
    xt = jax.random.normal(jax.random.PRNGKey(10), (n,))
    b = As @ xt

    Minv = row_norm_equilibrator(lambda v: As @ v, b)
    # estimate within ~3x of the true row norms (8 probes)
    true_rn = jnp.sqrt(jnp.sum(As * As, axis=1))
    ratio = np.asarray(Minv * true_rn)
    assert ratio.min() > 0.3 and ratio.max() < 3.0

    x, it, res = pgmres(lambda v: As @ v, b, jnp.zeros(n), Minv=Minv,
                        tol=1e-12, maxiter=600, restart=30)
    assert np.abs(np.asarray(x - xt)).max() < 1e-6


def test_pgmres_early_exit_true_residual_large_norm():
    """Regression for the round-4 early-exit Arnoldi corruption: when a
    cycle exits at j_f < m, the unmasked Givens entry g[j_f] injected a
    spurious g[j_f]*V[j_f] term into x (reported relres 8e-5 vs TRUE
    residual 8e-2 on a ||A||~2e3 matrix).  Gate the residual computed
    DIRECTLY from (A, x, b) — not the solver's own telemetry — on a
    large-norm system with a loose tol so the early exit actually fires."""
    n = 100
    key = jax.random.PRNGKey(11)
    A = _spd(n, key) * 20.0          # ||A|| ~ 2e3-4e3
    xt = jax.random.normal(jax.random.PRNGKey(12), (n,))
    b = A @ xt
    tol = 1e-4
    x, it, res = pgmres(lambda v: A @ v, b, jnp.zeros(n),
                        Minv=1.0 / jnp.diagonal(A), tol=tol,
                        maxiter=200, restart=40)
    # loose tol on an SPD system: converges well inside one restart cycle,
    # exercising the early exit
    assert 0 < int(it) < 40, int(it)
    true_res = float(jnp.linalg.norm(b - A @ x) / jnp.linalg.norm(b))
    assert true_res <= 10.0 * tol, (true_res, float(res), int(it))

    from penguin_tpu.linsolve import fgmres
    xf, itf, _ = fgmres(lambda v: A @ v, b, jnp.zeros(n),
                        Minv=lambda r: r / jnp.diagonal(A), tol=tol,
                        maxiter=200, restart=40)
    assert 0 < int(itf) < 40, int(itf)
    true_res_f = float(jnp.linalg.norm(b - A @ xf) / jnp.linalg.norm(b))
    assert true_res_f <= 10.0 * tol, (true_res_f, int(itf))


def test_fgmres_flexible_preconditioner():
    """fgmres must converge with a NONLINEAR preconditioner (inner CG) —
    the case plain pgmres is not allowed to handle — and report the true
    residual norm."""
    from penguin_tpu.linsolve import fgmres

    n = 120
    A = (4.0 * jnp.eye(n)
         + 0.6 * jax.random.normal(jax.random.PRNGKey(3), (n, n)) / np.sqrt(n))
    xt = jax.random.normal(jax.random.PRNGKey(4), (n,))
    b = A @ xt

    def inner_cg(r, iters=5):
        # crude inner CG on the normal equations view: nonlinear in r
        x = jnp.zeros_like(r)
        p = r.copy()
        rr = jnp.dot(r, r)
        rc = r
        for _ in range(iters):
            Ap = A @ p
            alpha = rr / jnp.maximum(jnp.dot(p, Ap), 1e-30)
            x = x + alpha * p
            rc = rc - alpha * Ap
            rr_new = jnp.dot(rc, rc)
            p = rc + (rr_new / jnp.maximum(rr, 1e-30)) * p
            rr = rr_new
        return x

    x, it, res = fgmres(lambda v: A @ v, b, jnp.zeros(n), Minv=inner_cg,
                        tol=1e-10, maxiter=300, restart=30)
    assert np.abs(np.asarray(x - xt)).max() < 1e-7
    true_res = np.linalg.norm(np.asarray(A @ x - b)) / np.linalg.norm(np.asarray(b))
    assert abs(float(res) - true_res) < 1e-8 + 0.5 * true_res


def test_fgmres_matches_pgmres_linear_preconditioner():
    """With a LINEAR (diagonal) preconditioner both solvers must reach the
    same solution."""
    from penguin_tpu.linsolve import fgmres

    n = 90
    A = (3.0 * jnp.eye(n)
         + 0.4 * jax.random.normal(jax.random.PRNGKey(5), (n, n)) / np.sqrt(n))
    xt = jax.random.normal(jax.random.PRNGKey(6), (n,))
    b = A @ xt
    dinv = 1.0 / jnp.diagonal(A)

    xf, _, _ = fgmres(lambda v: A @ v, b, jnp.zeros(n),
                      Minv=lambda r: dinv * r, tol=1e-12, maxiter=400,
                      restart=30)
    xp, _, _ = pgmres(lambda v: A @ v, b, jnp.zeros(n), Minv=dinv,
                      tol=1e-12, maxiter=400, restart=30)
    assert np.abs(np.asarray(xf - xt)).max() < 1e-8
    assert np.abs(np.asarray(xp - xt)).max() < 1e-8
