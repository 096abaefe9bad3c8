"""Field initializers, velocity generators, small-cell remedies, and the
adaptive time-step controller (re-design of
``/root/reference/src/utils.jl``, the capacity-cleaning utilities of
``src/capacity.jl:693-851``, and ``adapt_timestep`` of
``src/solver.jl:611-662``)."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

__all__ = [
    "initialize_temperature_uniform",
    "initialize_temperature_square",
    "initialize_temperature_circle",
    "initialize_temperature_function",
    "initialize_rotating_velocity_field",
    "initialize_poiseuille_velocity_field",
    "initialize_radial_velocity_field",
    "remove_small_volumes",
    "clamp_merge_small_cells",
    "adapt_timestep",
    "volume_redefinition",
    "moment_consistent_W",
]


# -- temperature initializers (utils.jl:5-56) -------------------------------

def initialize_temperature_uniform(mesh, value, dtype=None):
    T = jnp.full(mesh.np_shape, value, dtype=dtype)
    return T, T


def _dof_coords(mesh):
    N = mesh.ndim
    out = []
    for d in range(N):
        c = np.zeros(mesh.np_shape[d])
        c[:] = np.asarray(mesh.nodes[d])
        shp = [1] * N
        shp[d] = mesh.np_shape[d]
        out.append(np.broadcast_to(c.reshape(shp), mesh.np_shape))
    return out


def initialize_temperature_square(mesh, center, half_width, value, base=0.0):
    X, Y = _dof_coords(mesh)[:2]
    m = (np.abs(X - center[0]) <= half_width) & (np.abs(Y - center[1]) <= half_width)
    T = jnp.where(jnp.asarray(m), value, base)
    return T, T


def initialize_temperature_circle(mesh, center, radius, value, base=0.0):
    X, Y = _dof_coords(mesh)[:2]
    m = (X - center[0]) ** 2 + (Y - center[1]) ** 2 <= radius**2
    T = jnp.where(jnp.asarray(m), value, base)
    return T, T


def initialize_temperature_function(mesh, func):
    coords = _dof_coords(mesh)
    T = jnp.asarray(func(*coords))
    return T, T


# -- velocity field generators (utils.jl:62-130) ----------------------------

def initialize_rotating_velocity_field(mesh, magnitude=1.0, center=None):
    X, Y = _dof_coords(mesh)[:2]
    if center is None:
        center = (
            mesh.x0[0] + mesh.domain_size[0] / 2,
            mesh.x0[1] + mesh.domain_size[1] / 2,
        )
    ux = jnp.asarray(-(Y - center[1]) * magnitude)
    uy = jnp.asarray((X - center[0]) * magnitude)
    return ux, uy


def initialize_poiseuille_velocity_field(mesh):
    X, Y = _dof_coords(mesh)[:2]
    return jnp.asarray(X * (1 - X)), jnp.zeros(mesh.np_shape)


def initialize_radial_velocity_field(mesh, center, magnitude=1.0):
    X, Y = _dof_coords(mesh)[:2]
    r = np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2)
    r = np.where(r > 0, r, 1.0)
    return (
        jnp.asarray((X - center[0]) / r * magnitude),
        jnp.asarray((Y - center[1]) / r * magnitude),
    )


# -- small-cell remedies (capacity.jl:693-851) ------------------------------

def remove_small_volumes(capacity, tol):
    """Zero out every capacity entry of cells with V < tol (functional
    version of remove_small_volumes!); returns a new Capacity."""
    small = capacity.V < tol
    keep = ~small
    kf = keep.astype(capacity.V.dtype)
    return dataclasses.replace(
        capacity,
        V=capacity.V * kf,
        Gamma=capacity.Gamma * kf,
        cell_types=jnp.where(small, 0, capacity.cell_types),
        A=tuple(a * kf for a in capacity.A),
        B=tuple(b * kf for b in capacity.B),
        W=tuple(w * kf for w in capacity.W),
        C_om=capacity.C_om * kf[..., None],
    )


def clamp_merge_small_cells(capacity, tol=1e-12):
    """Merge sliver cut cells (0 < V < tol) into their nearest face
    neighbor with V >= tol — the conditioning remedy of
    ``clamp_merge_small_cells!`` (/root/reference/src/capacity.jl:746-851),
    re-expressed as a functional fixed-shape transform:

    - V, Γ and the per-axis A/B/W diagonals of the source are summed into
      the target; target centroid becomes the volume-weighted average;
      source entries are zeroed (cell_type -> 0);
    - targets are restricted to the 2N face neighbors (the reference scans
      *all* cells for the nearest good centroid, but for a resolved
      interface the nearest good cell is always face-adjacent; this keeps
      the transform O(N) shifted adds instead of O(cells²));
    - unlike the reference we skip already-empty cells (their merge is a
      no-op by construction).

    Returns ``(new_capacity, n_merged)``."""
    V = capacity.V
    N = capacity.ndim
    small = (V > 0) & (V < tol)
    good = V >= tol
    C = capacity.C_om

    # candidate directions: (axis, ±1); shift_to_nb moves the neighbor's
    # value onto the small cell's slot, shift_to_tgt the reverse
    dirs = [(d, s) for d in range(N) for s in (+1, -1)]

    def roll(x, d, s):
        return jnp.roll(x, -s, axis=d)  # value of neighbor (idx + s)

    d2s, oks = [], []
    for d, s in dirs:
        nb_good = roll(good, d, s)
        # roll wraps across the domain; the wrapped slots happen to land on
        # the inert padding plane (V=0 -> good=False) for pad>=1, but mask
        # them explicitly so the no-cross-domain-merge invariant does not
        # depend on the padding layout
        idx = jnp.arange(V.shape[d]).reshape(
            tuple(-1 if i == d else 1 for i in range(V.ndim)))
        in_range = (idx + s >= 0) & (idx + s < V.shape[d])
        nb_good = nb_good & in_range
        nb_C = roll(C, d, s)
        d2 = jnp.sum((C - nb_C) ** 2, axis=-1)
        d2s.append(jnp.where(nb_good, d2, jnp.inf))
        oks.append(nb_good)
    d2_stack = jnp.stack(d2s)            # (2N, *shape)
    choice = jnp.argmin(d2_stack, axis=0)
    has_target = jnp.isfinite(jnp.min(d2_stack, axis=0))
    merging = small & has_target

    dt_ = V.dtype
    addV = jnp.zeros_like(V)
    addG = jnp.zeros_like(V)
    addVC = jnp.zeros_like(C)
    addA = [jnp.zeros_like(a) for a in capacity.A]
    addB = [jnp.zeros_like(b) for b in capacity.B]
    addW = [jnp.zeros_like(w) for w in capacity.W]
    for k, (d, s) in enumerate(dirs):
        m = (merging & (choice == k)).astype(dt_)
        # scatter source -> target = shift the masked source values by +s
        def to_tgt(x, m=m, d=d, s=s):
            return jnp.roll(x * m, s, axis=d)

        addV = addV + to_tgt(V)
        addG = addG + to_tgt(capacity.Gamma)
        addVC = addVC + jnp.roll((V * m)[..., None] * C, s, axis=d)
        for i in range(N):
            addA[i] = addA[i] + to_tgt(capacity.A[i])
            addB[i] = addB[i] + to_tgt(capacity.B[i])
            addW[i] = addW[i] + to_tgt(capacity.W[i])

    keep = (~merging).astype(dt_)
    newV = V * keep + addV
    newC = jnp.where(
        (newV > 0)[..., None],
        (V[..., None] * C * keep[..., None] + addVC)
        / jnp.maximum(newV, tol * 1e-6)[..., None],
        C * keep[..., None],
    )
    new_cap = dataclasses.replace(
        capacity,
        V=newV,
        Gamma=capacity.Gamma * keep + addG,
        cell_types=jnp.where(merging, 0, capacity.cell_types),
        C_om=newC,
        A=tuple(a * keep + da for a, da in zip(capacity.A, addA)),
        B=tuple(b * keep + db for b, db in zip(capacity.B, addB)),
        W=tuple(w * keep + dw for w, dw in zip(capacity.W, addW)),
    )
    return new_cap, jnp.sum(merging)


# -- adaptive time step (solver.jl:611-662) ---------------------------------

def adapt_timestep(velocity_field, mesh, cfl_target, dt_current, dt_min,
                   dt_max, growth_factor=1.1, shrink_factor=0.8,
                   safety_factor=0.9):
    """Interface-velocity CFL controller.  NOTE: the reference swaps the
    growth/shrink factors in its min/max clamps (solver.jl:646-652); we use
    the intended semantics (grow at most by growth_factor, shrink at most
    to shrink_factor)."""
    v_max = float(np.max(np.abs(np.asarray(velocity_field))))
    if v_max < 1e-10:
        return min(dt_current * growth_factor, dt_max), 0.0
    h_min = min(mesh.h[: mesh.ndim])
    dt_opt = safety_factor * cfl_target * h_min / v_max
    if dt_opt > dt_current:
        dt_new = min(dt_opt, dt_current * growth_factor)
    else:
        dt_new = max(dt_opt, dt_current * shrink_factor)
    dt_new = float(np.clip(dt_new, dt_min, dt_max))
    return dt_new, v_max * dt_new / h_min


def volume_redefinition(capacity, ops):
    """1D second-order consistency correction: rebuild W and V from discrete
    gradients of the centroid polynomials (utils.jl:134-158)."""
    p_o = capacity.C_om[..., 0]
    p_g = capacity.C_ga[..., 0]
    grad = ops.grad(p_o, p_g)[0]
    W_new = (grad * capacity.W[0],)
    q_o = 0.5 * p_o**2
    q_g = 0.5 * p_g**2
    g2 = ops.grad(q_o, q_g)
    V_new = ops.div(g2, g2)
    return dataclasses.replace(capacity, W=W_new, V=V_new)


def moment_consistent_W(capacity, ops=None):
    """N-D generalization of the reference's 1D ``volume_redefinition!``
    (utils.jl:134-158): rebuild each staggered volume ``W[d]`` so the
    discrete cut-cell gradient is EXACT on fields linear along axis ``d``.

    The flux along ``d`` is ``q_d = Wꜝ_d (G_d uω + H_d uγ)`` with values
    sampled at cell centroids (uω) and interface centroids (uγ).  Feeding
    the coordinate field ``u = x_d`` through the numerator yields the
    effective gradient arm

        N_d = G_d(C_ω·e_d) + H_d(C_γ·e_d)

    which in fully wet regions equals the standard staggered volume and
    near the interface equals the centroid-to-interface moment that a
    one-sided sub-cell stencil (Gibou-style ghost value) would use.

    Measured verdict (tests/test_moment_w.py + the Couette annulus
    truncation study in ARCHITECTURE.md): per-axis moment exactness is
    bought at the price of LARGER cross-moment flux error on inclined or
    curved 2D interfaces (inclined-strip linear solution: 8.5e-4 ->
    1.8e-3; Couette solution error unchanged).  Use it where the
    reference uses its 1D ``volume_redefinition!`` — 1D problems — and
    leave N-D capacities on the plain quadrature W (the default
    everywhere in this package).

    Slots where the correction is degenerate (``N_d <= 0`` — possible on
    grazing slivers where centroids cross) keep the quadrature value.
    Returns a new Capacity.
    """
    if ops is None:
        from .operators import make_diffusion_ops

        ops = make_diffusion_ops(capacity)
    N = capacity.ndim
    W_new = []
    for d in range(N):
        p_o = capacity.C_om[..., d]
        p_g = capacity.C_ga[..., d]
        arm = ops.grad(p_o, p_g)[d] * capacity.W[d]
        w_q = capacity.W[d]
        # slot k pairs cells (k-1, k); slot 0 is the border half-stencil
        # (dm(x)[0] = x[0], no difference is formed — the "arm" there would
        # carry the absolute coordinate) and the last slot is padding:
        # keep the quadrature W on both
        idx = jnp.arange(w_q.shape[d]).reshape(
            tuple(-1 if i == d else 1 for i in range(w_q.ndim)))
        interior = (idx > 0) & (idx < w_q.shape[d] - 1)
        W_new.append(jnp.where(interior & (arm > 0) & (w_q > 0), arm, w_q))
    return dataclasses.replace(capacity, W=tuple(W_new))
