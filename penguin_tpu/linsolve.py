"""Matrix-free linear solvers.

The reference trims zero rows/columns from an assembled sparse matrix and
calls UMFPACK / IterativeSolvers (``/root/reference/src/solver.jl:59-188``).
Here systems stay matrix-free: inactive DOFs are replaced by identity
equations (``x_i = 0``) — exactly equivalent to the reference's
``remove_zero_rows_cols!`` (which keeps index ``i`` only when row *and*
column ``i`` are structurally nonzero) — and solves are:

- ``direct``: materialize the operator densely (vmapped basis application,
  a batched matmul-friendly pattern on TPU) + LU.  For small/medium systems.
- ``cg`` / ``bicgstab`` / ``gmres``: jax.scipy matrix-free Krylov with
  optional Jacobi preconditioning; dot products become ``psum`` collectives
  under sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = [
    "materialize_dense",
    "solve_linear",
    "DenseFactorSolver",
    "KrylovSolver",
]


def materialize_dense(apply_fn, template):
    """Build the dense matrix of a linear pytree operator.

    ``apply_fn(x) -> y`` with x, y pytrees shaped like ``template``.
    Returns (A, unravel) where ``A[i, j]`` acts on the raveled vector.
    """
    flat, unravel = ravel_pytree(template)
    n = flat.size

    def flat_apply(v):
        out = apply_fn(unravel(v))
        return ravel_pytree(out)[0]

    A = jax.vmap(flat_apply)(jnp.eye(n, dtype=flat.dtype)).T
    return A, unravel


def _fix_inactive_dense(A, b):
    """Replicate reference drop semantics: index i is inactive when row i or
    column i is all-zero; inactive rows/cols are replaced by identity."""
    row_nz = jnp.abs(A).sum(axis=1) > 0.0
    col_nz = jnp.abs(A).sum(axis=0) > 0.0
    keep = row_nz & col_nz
    d = keep.astype(A.dtype)
    A = A * d[:, None] * d[None, :] + jnp.diag(1.0 - d)
    b = jnp.where(keep, b, 0.0)
    return A, b


class DenseFactorSolver:
    """LU-factorized dense solve for repeated right-hand sides (the unsteady
    time loops reuse the factorization every step, mirroring the reference's
    single matrix build per scheme)."""

    def __init__(self, apply_fn, template):
        A_raw, self.unravel = materialize_dense(apply_fn, template)
        row_nz = jnp.abs(A_raw).sum(axis=1) > 0.0
        col_nz = jnp.abs(A_raw).sum(axis=0) > 0.0
        self.keep = row_nz & col_nz
        d = self.keep.astype(A_raw.dtype)
        A = A_raw * d[:, None] * d[None, :] + jnp.diag(1.0 - d)
        self.lu, self.piv = jax.scipy.linalg.lu_factor(A)

    def solve(self, b, x0=None):
        flat_b, _ = ravel_pytree(b)
        flat_b = jnp.where(self.keep, flat_b, 0.0)
        x = jax.scipy.linalg.lu_solve((self.lu, self.piv), flat_b)
        return self.unravel(x)


def _jacobi_precondition(diag):
    dinv = jnp.where(jnp.abs(diag) > 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 1.0)

    def M(r):
        return jax.tree_util.tree_map(lambda a, b: a * b, dinv, r)

    return M


class KrylovSolver:
    """Matrix-free Krylov wrapper over jax.scipy.sparse.linalg."""

    def __init__(self, apply_fn, method="bicgstab", tol=1e-10, atol=0.0,
                 maxiter=None, M=None):
        self.apply_fn = apply_fn
        self.method = method
        self.tol = tol
        self.atol = atol
        self.maxiter = maxiter
        self.M = M

    def solve(self, b, x0=None):
        from jax.scipy.sparse.linalg import bicgstab, cg, gmres

        kw = dict(tol=self.tol, atol=self.atol, maxiter=self.maxiter, M=self.M)
        if self.method == "cg":
            x, _ = cg(self.apply_fn, b, x0=x0, **kw)
        elif self.method == "bicgstab":
            x, _ = bicgstab(self.apply_fn, b, x0=x0, **kw)
        elif self.method == "gmres":
            x, _ = gmres(self.apply_fn, b, x0=x0, solve_method="batched", **kw)
        else:
            raise ValueError(f"unknown Krylov method {self.method}")
        return x


def solve_linear(apply_fn, b, method="auto", x0=None, tol=1e-10, maxiter=None,
                 M=None):
    """One-shot linear solve.  ``method``: auto | direct | cg | bicgstab |
    gmres.  ``auto`` chooses direct for small systems, bicgstab otherwise."""
    flat_b, _ = ravel_pytree(b)
    n = flat_b.size
    if method == "auto":
        method = "direct" if n <= 8000 else "bicgstab"
    if method == "direct":
        A, unravel = materialize_dense(apply_fn, b)
        A, bb = _fix_inactive_dense(A, flat_b)
        x = jnp.linalg.solve(A, bb)
        return unravel(x)
    if method == "lstsq":
        # min-norm SVD solve: handles structurally singular saddle points
        # (orphan pressure modes) the way the reference's Krylov fallback
        # does (solve_stokes_linear_system!, stokes.jl:1540-1548)
        A, unravel = materialize_dense(apply_fn, b)
        A, bb = _fix_inactive_dense(A, flat_b)
        x, *_ = jnp.linalg.lstsq(A, bb, rcond=1e-12)
        return unravel(x)
    solver = KrylovSolver(apply_fn, method=method, tol=tol, maxiter=maxiter, M=M)
    return solver.solve(b, x0=x0)
