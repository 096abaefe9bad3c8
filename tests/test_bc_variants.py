"""Robin interface conditions, periodic operators, and Gibbs-Thomson
interface smoke tests."""

import numpy as np
import jax.numpy as jnp
import pytest

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyMono, DiffusionUnsteadyMono


def test_robin_interface_steady():
    """Robin α T + β ∇T·n = g on the embedded circle: α→∞ limit approaches
    Dirichlet; here check the solve is sane and bounded between the Robin
    and Dirichlet solutions."""
    mesh = pt.Mesh((32, 32), (4.0, 4.0), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.circle((2.0, 2.0), 1.0), mesh)
    ops = pt.make_diffusion_ops(cap)
    bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                                for k in ("left", "right", "top", "bottom")})
    phase = pt.Phase(cap, ops, lambda x, y, z: 4.0, 1.0)

    s_dir = DiffusionSteadyMono(phase, bc_b, pt.Dirichlet(0.0))
    s_dir.solve(method="direct")
    s_rob = DiffusionSteadyMono(phase, bc_b, pt.Robin(1000.0, 1.0, 0.0))
    s_rob.solve(method="direct")
    s_rob_weak = DiffusionSteadyMono(phase, bc_b, pt.Robin(1.0, 1.0, 0.0))
    s_rob_weak.solve(method="direct")

    ct = np.asarray(cap.cell_types)
    sel = ct == 1
    ud = np.asarray(s_dir.x_omega)[sel]
    ur = np.asarray(s_rob.x_omega)[sel]
    uw = np.asarray(s_rob_weak.x_omega)[sel]
    # strong Robin ~ Dirichlet
    assert np.abs(ur - ud).max() < 5e-2 * max(np.abs(ud).max(), 1)
    # weak Robin lets the boundary float higher (flux escapes slower)
    assert uw.max() > ud.max()


def test_neumann_interface_steady():
    """Pure Neumann interface flux: compatibility satisfied by the source;
    solution defined up to interior behaviour — check residual smallness."""
    mesh = pt.Mesh((24,), (4.0,), (0.0,))
    cap = pt.compute_capacity(pt.geometry.interval(2.0, 1.0), mesh)
    ops = pt.make_diffusion_ops(cap)
    bc_b = pt.BorderConditions({"bottom": pt.Dirichlet(0.0),
                                "top": pt.Dirichlet(0.0)})
    # compatibility: ∮ D∇T·n = -∫f  ->  2 g = -2  ->  g = -1
    phase = pt.Phase(cap, ops, lambda x, y, z: 1.0, 1.0)
    s = DiffusionSteadyMono(phase, bc_b, pt.Neumann(-1.0))
    s.solve(method="lstsq")
    Ax = s.apply(s.x)
    b = s._rhs()
    resid = max(float(jnp.abs(a - bb).max()) for a, bb in zip(Ax, b))
    assert resid < 1e-10
    assert np.isfinite(np.asarray(s.x_omega)).all()


def test_periodic_operators_constant_preserved():
    """Periodic stencils: a constant field has zero flux everywhere
    including the wrap faces."""
    mesh = pt.Mesh((16, 16), (2.0, 2.0), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh)
    ops = pt.make_diffusion_ops(cap, periodic=(True, True))
    ones = jnp.ones(mesh.np_shape)
    q = ops.G(ones)
    for d in range(2):
        qd = np.asarray(q[d])[:16, :16]
        # periodic wrap sees the jump to the padding slot only at the last
        # real face; interior wrap faces are flux-free
        assert np.abs(qd[1:-1, 1:-1]).max() < 1e-12


def test_gibbs_thomson_interface():
    """GibbsThomson interface condition: with v_gamma = 0 it reduces to
    Dirichlet(Tm)."""
    mesh = pt.Mesh((24, 24), (4.0, 4.0), (0.0, 0.0))
    cap = pt.compute_capacity(pt.geometry.circle((2.0, 2.0), 1.0), mesh)
    ops = pt.make_diffusion_ops(cap)
    bc_b = pt.BorderConditions({k: pt.Dirichlet(0.0)
                                for k in ("left", "right", "top", "bottom")})
    phase = pt.Phase(cap, ops, lambda x, y, z, t: 0.0, 1.0)
    z = jnp.zeros(mesh.np_shape)
    dt = 1e-3
    gt = pt.GibbsThomson(Tm=0.7, eps_k=0.0, eps_v=0.0)
    s1 = DiffusionUnsteadyMono(phase, bc_b, gt, dt, (z, z), "BE")
    s1.solve(10 * dt, method="direct", keep_states=False)
    s2 = DiffusionUnsteadyMono(phase, bc_b, pt.Dirichlet(0.7), dt, (z, z), "BE")
    s2.solve(10 * dt, method="direct", keep_states=False)
    assert np.abs(np.asarray(s1.x_omega) - np.asarray(s2.x_omega)).max() < 1e-12
