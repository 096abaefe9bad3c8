"""Bandwidth-roofline accounting for the hot kernels (VERDICT r2 item 8).

Measures achieved HBM bandwidth for the variable-coefficient stencil
matvec (the inner loop of the north-star heat solve) in three forms —
Pallas 2D 5-point, XLA-fused 2D 5-point, XLA-fused 3D 7-point — plus the
full FastHeatBE step, against the v5e peak (~819 GB/s).

Methodology: iterations are CHAINED (x_{k+1} = A x_k / 9, the division
fuses into the same kernel) so the device cannot overlap or elide
independent dispatches; a single block_until_ready at the end then bounds
the per-iteration wall time from above.  Timing independent calls
under-measures badly through the async dispatch path (apparent 20x
over-peak numbers).

Traffic model per matvec: (2N+2) arrays read (2N+1 coefficients + x) and
1 written, all f32.

Run (TPU):  python benchmarks/stencil_roofline.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

PEAK_GBS = 819.0  # v5e HBM


def timeit_chained(fn, x0, n=50):
    """fn: x -> x, same shape/dtype; returns seconds per application."""
    x = fn(x0)
    x.block_until_ready()          # compile + warm
    x = x0
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    x.block_until_ready()
    return (time.perf_counter() - t0) / n


def report(name, t, nbytes):
    gbs = nbytes / t / 1e9
    print(f"{name:44s} {t * 1e3:7.3f} ms  {gbs:7.1f} GB/s  "
          f"{100 * gbs / PEAK_GBS:5.1f}% of v5e peak")
    return gbs


def matvec2d(shape):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    cc, cxm, cxp, cym, cyp, x = (jax.random.normal(k, shape, jnp.float32)
                                 for k in ks)
    cc = cc + 8.0  # diagonally dominant

    @jax.jit
    def xla(x):
        return (cc * x
                + cxm * jnp.roll(x, 1, 0) + cxp * jnp.roll(x, -1, 0)
                + cym * jnp.roll(x, 1, 1) + cyp * jnp.roll(x, -1, 1)) / 9.0

    nbytes = 7 * np.prod(shape) * 4
    t = timeit_chained(xla, x)
    report(f"XLA 5-point matvec {shape[0]}x{shape[1]}", t, nbytes)

    from penguin_tpu.pallas_kernels.stencil import (stencil5_available,
                                                    stencil5_matvec)
    if stencil5_available() and shape[0] % 64 == 0 and shape[1] % 128 == 0:
        pl_fn = jax.jit(
            lambda v: stencil5_matvec(cc, cxm, cxp, cym, cyp, v,
                                      tile_m=64) / 9.0)
        t = timeit_chained(pl_fn, x)
        report(f"Pallas 5-point matvec {shape[0]}x{shape[1]}", t, nbytes)


def matvec3d(shape):
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    arrs = [jax.random.normal(k, shape, jnp.float32) for k in ks]
    cc = arrs[0] + 12.0
    cxm, cxp, cym, cyp, czm, czp, x = arrs[1:]

    @jax.jit
    def xla(x):
        return (cc * x
                + cxm * jnp.roll(x, 1, 0) + cxp * jnp.roll(x, -1, 0)
                + cym * jnp.roll(x, 1, 1) + cyp * jnp.roll(x, -1, 1)
                + czm * jnp.roll(x, 1, 2) + czp * jnp.roll(x, -1, 2)) / 13.0

    nbytes = 9 * np.prod(shape) * 4
    t = timeit_chained(xla, x)
    report(f"XLA 7-point matvec {shape[0]}x{shape[1]}x{shape[2]}", t, nbytes)


def heat_step(n):
    import penguin_tpu as pt
    from penguin_tpu.solvers.heat_fast import FastHeatBE

    mesh = pt.Mesh((n, n), (4.0, 4.0), (0.0, 0.0))
    body = pt.geometry.circle((2.0, 2.0), 1.5)
    cap = pt.compute_capacity(body, mesh, p=4, s=1, dtype=jnp.float32)
    ops = pt.make_diffusion_ops(cap)
    bc = pt.BorderConditions({k: pt.Dirichlet(0.0)
                              for k in ("left", "right", "top", "bottom")})
    dt = 0.25 * (4.0 / n) ** 2
    st = FastHeatBE(cap, ops, 1.0, lambda x, y, z, t: 1.0, pt.Dirichlet(0.0),
                    bc, dt, cg_tol=1e-6, cg_maxiter=32)
    T0 = jnp.zeros(cap.V.shape, jnp.float32)
    raw = jax.jit(st.step)

    def step1(T):
        out = raw(T)
        return out[0] if isinstance(out, tuple) else out

    t = timeit_chained(step1, T0, n=200)
    # the step is CG-dominated; per CG iteration: matvec (7 array passes)
    # + p/x/r updates and dots (~6 passes) -> ~13 passes, plus the rhs
    # build (~4 passes).  Report the conservative matvec-only floor.
    nb_mv = 7 * n * n * 4
    print(f"FastHeatBE full step {n}x{n}: {t * 1e3:.3f} ms "
          f"(matvec-only traffic floor {nb_mv / t / 1e9:.0f} GB/s)")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  peak assumed {PEAK_GBS} GB/s")
    for s in [(1024, 1024), (2048, 2048), (4096, 4096)]:
        matvec2d(s)
    for s in [(128, 128, 128), (256, 256, 256)]:
        matvec3d(s)
    heat_step(1024)
