"""Checkpoint/resume round-trips (SURVEY §5: the reference has none — this
is rebuild-added infrastructure: pytree -> single .npz + JSON meta)."""

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.checkpoint import (checkpoint_solver, load_checkpoint,
                                    restore_solver, save_checkpoint)


def test_pytree_roundtrip(tmp_path):
    state = {
        "T": (jnp.arange(6.0).reshape(2, 3), jnp.zeros(4)),
        "markers": jnp.ones((5, 2)),
        "nested": [jnp.asarray(1.5), {"a": jnp.asarray([1, 2, 3])}],
    }
    p = tmp_path / "ck.npz"
    save_checkpoint(p, state, meta={"t": 0.25, "step": 7})
    loaded, meta = load_checkpoint(p)
    assert meta == {"t": 0.25, "step": 7}
    assert np.allclose(np.asarray(loaded["T"][0]), np.arange(6).reshape(2, 3))
    assert isinstance(loaded["T"], tuple)
    assert isinstance(loaded["nested"], list)
    assert np.allclose(np.asarray(loaded["nested"][1]["a"]), [1, 2, 3])


def test_solver_resume_matches_uninterrupted(tmp_path):
    """Run 8 BE steps straight vs 4 + checkpoint + restore + 4: identical."""
    from penguin_tpu.solvers import DiffusionUnsteadyMono

    nx, lx = 32, 4.0
    mesh = pt.Mesh((nx, nx), (lx, lx), (0.0, 0.0))
    circle = pt.geometry.circle((2.01, 2.01), 1.0)
    cap = pt.compute_capacity(circle, mesh)
    ops = pt.make_diffusion_ops(cap)
    bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                                for k in ("left", "right", "top", "bottom")})
    phase = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)
    z = jnp.zeros(mesh.np_shape)
    dt = 0.25 * (lx / nx) ** 2

    ref = DiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(1.0), dt, (z, z), "BE")
    ref.solve(8 * dt - dt / 2, method="direct")

    first = DiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(1.0), dt, (z, z), "BE")
    first.solve(4 * dt - dt / 2, method="direct")
    p = tmp_path / "mid.npz"
    checkpoint_solver(p, first, t=4 * dt)

    second = DiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(1.0), dt, (z, z), "BE")
    meta = restore_solver(p, second)
    assert meta["t"] == 4 * dt
    second.u0 = second.x  # resume from the checkpointed field
    second.solve(4 * dt - dt / 2, t_start=meta["t"], initial_solve=False,
                 method="direct")

    a = np.asarray(ref.x_omega)
    b = np.asarray(second.x_omega)
    assert np.abs(a - b).max() < 1e-12, np.abs(a - b).max()


def test_diagnostics_timers_and_history():
    import jax.numpy as jnp2
    from jax.scipy.sparse.linalg import cg

    from penguin_tpu import diagnostics as dg

    dg.reset()
    with dg.timed("block"):
        x = jnp2.ones(100).sum()
    with dg.timed("block", sync=x):
        pass
    table = dg.report(print_fn=lambda *_: None)
    assert table["block"]["n"] == 2

    A = jnp2.diag(jnp2.arange(1.0, 5.0))
    hist = dg.KrylovHistory(lambda v: A @ v)
    b = jnp2.ones(4)
    x, _ = cg(hist, b)
    assert hist.n_matvec > 0
    res = hist.record_final(b, x)
    assert res < 1e-6


def test_checkpoint_front_tracking_state(tmp_path):
    """Moving-interface solvers snapshot markers/xf plus their logs."""
    from penguin_tpu.front_tracking import FrontTracker

    class FakeStefan:
        pass

    s1 = FakeStefan()
    s1.x = (jnp.ones((5, 5)), jnp.zeros((5, 5)))
    s1.markers = FrontTracker().create_circle((0.0, 0.0), 1.0, n=16).markers
    s1.xf = 0.75
    s1.residual_log = np.array([1e-3, 1e-5])
    p = tmp_path / "front.npz"
    checkpoint_solver(p, s1, t=0.5, extra={"note": "mid-run"})

    s2 = FakeStefan()
    meta = restore_solver(p, s2)
    assert meta["note"] == "mid-run" and meta["t"] == 0.5
    assert np.allclose(np.asarray(s2.markers), np.asarray(s1.markers))
    assert s2.xf == 0.75
    assert np.allclose(np.asarray(s2.residual_log), [1e-3, 1e-5])
