"""Bandwidth-roofline accounting for the hot kernels (VERDICT r2 item 8).

Measures achieved HBM bandwidth for the variable-coefficient stencil
matvec (the inner loop of the north-star heat solve) in three forms —
Pallas 2D 5-point, XLA-fused 2D 5-point, XLA-fused 3D 7-point — plus the
full FastHeatBE step, against the v5e peak (~819 GB/s).

Methodology: the TPU sits behind a dispatch tunnel, so BOTH naive timings
lie — independent dispatches overlap (apparent 20x over-peak), and
host-chained dispatches serialize on the tunnel round-trip (~1 ms/call,
apparent 3% of peak).  The iteration chain therefore lives INSIDE one jit
(`lax.fori_loop` of x <- A x / 9, the division fuses into the stencil
kernel): one dispatch, n device-side iterations, a single
block_until_ready.  Per-iteration time = wall / n, amortizing the launch.

Traffic model per matvec: (2N+2) arrays read (2N+1 coefficients + x) and
1 written, all f32.

Run (TPU):  python benchmarks/stencil_roofline.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

PEAK_GBS = 819.0  # v5e HBM


def time_looped(loop_fn, args, n=100, reps=5):
    """loop_fn(n, *args) jitted with static n, running n chained iterations
    on-device (arrays passed as ARGUMENTS — closure constants would ship in
    the remote-compile payload); best seconds/iteration over `reps` calls."""
    f = jax.jit(loop_fn, static_argnums=0)

    def timed(k):
        # block_until_ready returns early through the remote-dispatch
        # tunnel; a device->host scalar read is the only real barrier.
        best = np.inf
        for _ in range(reps + 1):  # first call compiles this k
            t0 = time.perf_counter()
            float(f(k, *args).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    # two-point fit cancels the fixed per-call cost (tunnel round trip,
    # host sync, result readback) that dominates small grids
    n_lo, n_hi = max(n // 5, 10), n
    return (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo)


def report(name, t, nbytes):
    gbs = nbytes / t / 1e9
    print(f"{name:44s} {t * 1e3:7.3f} ms  {gbs:7.1f} GB/s  "
          f"{100 * gbs / PEAK_GBS:5.1f}% of v5e peak")
    return gbs


def matvec2d(shape):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    cc, cxm, cxp, cym, cyp, x0 = (jax.random.normal(k, shape, jnp.float32)
                                  for k in ks)
    cc = cc + 8.0  # diagonally dominant; /9 keeps the chain bounded
    args = (cc, cxm, cxp, cym, cyp, x0)

    def xla_loop(n, cc, cxm, cxp, cym, cyp, x0):
        def mv(i, x):
            return (cc * x
                    + cxm * jnp.roll(x, 1, 0) + cxp * jnp.roll(x, -1, 0)
                    + cym * jnp.roll(x, 1, 1) + cyp * jnp.roll(x, -1, 1)) / 9.0
        return lax.fori_loop(0, n, mv, x0)

    nbytes = 7 * np.prod(shape) * 4
    # loop long enough that device work dominates the differenced fixed
    # cost (~30 ms/call through the tunnel): target ~0.5 s of device time
    n_it = int(np.clip(2**31 / np.prod(shape), 100, 2000))
    t = time_looped(xla_loop, args, n=n_it)
    report(f"XLA 5-point matvec {shape[0]}x{shape[1]}", t, nbytes)

    from penguin_tpu.pallas_kernels.stencil import (stencil5_available,
                                                    stencil5_matvec)
    if stencil5_available() and shape[0] % 64 == 0 and shape[1] % 128 == 0:
        def pl_loop(n, cc, cxm, cxp, cym, cyp, x0):
            def mv(i, x):
                return stencil5_matvec(cc, cxm, cxp, cym, cyp, x,
                                       tile_m=64) / 9.0
            return lax.fori_loop(0, n, mv, x0)

        t = time_looped(pl_loop, args, n=n_it)
        report(f"Pallas 5-point matvec {shape[0]}x{shape[1]}", t, nbytes)


def matvec3d(shape):
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    arrs = [jax.random.normal(k, shape, jnp.float32) for k in ks]
    cc = arrs[0] + 12.0
    args = (cc,) + tuple(arrs[1:])

    def xla_loop(n, cc, cxm, cxp, cym, cyp, czm, czp, x0):
        def mv(i, x):
            return (cc * x
                    + cxm * jnp.roll(x, 1, 0) + cxp * jnp.roll(x, -1, 0)
                    + cym * jnp.roll(x, 1, 1) + cyp * jnp.roll(x, -1, 1)
                    + czm * jnp.roll(x, 1, 2) + czp * jnp.roll(x, -1, 2)) / 13.0
        return lax.fori_loop(0, n, mv, x0)

    nbytes = 9 * np.prod(shape) * 4
    n_it = int(np.clip(2**31 / np.prod(shape), 100, 2000))
    t = time_looped(xla_loop, args, n=n_it)
    report(f"XLA 7-point matvec {shape[0]}x{shape[1]}x{shape[2]}", t, nbytes)

    from penguin_tpu.pallas_kernels.stencil import (stencil5_available,
                                                    stencil7_matvec)
    if stencil5_available() and not (shape[0] % 8 or shape[1] % 8
                                     or shape[2] % 128):
        def pl_loop(n, cc, cxm, cxp, cym, cyp, czm, czp, x0):
            def mv(i, x):
                return stencil7_matvec(cc, cxm, cxp, cym, cyp, czm, czp, x,
                                       tile_x=8) / 13.0
            return lax.fori_loop(0, n, mv, x0)

        t = time_looped(pl_loop, args, n=n_it)
        report(f"Pallas 7-point matvec {shape[0]}x{shape[1]}x{shape[2]}",
               t, nbytes)


def heat_step(n):
    """Full implicit step timing: the north-star path already runs its CG
    inside one jitted `run(T, n_steps)` scan, so the dispatch amortizes."""
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
                    bc, dt, cg_tol=1e-6, cg_maxiter=32, dtype=jnp.float32)
    T = jnp.zeros(cap.V.shape, jnp.float32)
    T = st.run(T, 5)
    float(T[0, 0])  # true barrier (see time_looped)
    reps = 100
    t0 = time.perf_counter()
    T = st.run(T, reps)
    float(T[0, 0])
    t = (time.perf_counter() - t0) / reps
    # warm-started CG converges in a few iters/step; per iter: matvec
    # (7 array passes) + p/x/r updates and dots (~6 passes), plus the rhs
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
