"""North-star benchmark: 1024^2 unsteady cut-cell heat (BE, embedded circle)
ms/step on one TPU chip.  Target from BASELINE.md: < 10 ms/step.

Prints exactly one JSON line (the north-star row):
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
``vs_baseline`` = value / 10.0 (fraction of the target budget; < 1 beats it).

Stderr carries the honesty rows the JSON omits: CG iterations per step at
the north-star dt (0.25 h² — the EASY regime: the BE system is
near-identity and the warm-started CG converges in a few iterations) and
the STIFF row at dt = 100 h² (where an implicit cut-cell solver earns its
keep: ~400x worse conditioning), with its own ms/step and iteration
counts.
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    import penguin_tpu as pt
    from penguin_tpu.solvers.heat_fast import FastHeatBE

    nx = ny = 1024
    lx = ly = 4.0
    mesh = pt.Mesh((nx, ny), (lx, ly), (0.0, 0.0))
    body = pt.geometry.circle((2.0, 2.0), 1.0)
    t0 = time.time()
    cap = pt.compute_capacity(body, mesh, p=4, s=1, dtype=jnp.float32)
    cap.V.block_until_ready()
    t_cap = time.time() - t0

    ops = pt.make_diffusion_ops(cap)
    bc_b = pt.BorderConditions(
        {k: pt.Dirichlet(0.0) for k in ("left", "right", "top", "bottom")}
    )
    h2 = (lx / nx) ** 2

    def bench_dt(dt, cg_maxiter, cg_tol=1e-5, n2=800):
        fast = FastHeatBE(cap, ops, 1.0, lambda x, y, z, t: 0.0,
                          pt.Dirichlet(1.0), bc_b, dt, cg_tol=cg_tol,
                          cg_maxiter=cg_maxiter, dtype=jnp.float32)
        T = jnp.zeros(mesh.np_shape, jnp.float32)
        # warmup (compile + first steps); synchronize via a device->host
        # scalar read — through the remote-dispatch tunnel
        # block_until_ready does NOT wait for execution, so naive timings
        # measure dispatch latency only
        T, it_last, it_max = fast.run_telemetry(T, 5)
        float(T.max())

        # difference two loop lengths to cancel the fixed per-call
        # round-trip cost (~30-45 ms through the tunnel); min over
        # repeats rejects jitter
        def timed(n):
            t0 = time.time()
            out = fast.run(T, n)
            float(out.sum())
            return time.time() - t0

        n1 = max(n2 // 16, 10)
        timed(n1)  # settle the executable/queue
        # keep only positive differences: with short spans the ~30-45 ms
        # dispatch jitter can exceed the loop-length delta and flip the
        # sign; widen the span rather than trust a negative rate
        samples = [(timed(n2) - timed(n1)) / (n2 - n1) * 1e3
                   for _ in range(5)]
        pos = [s for s in samples if s > 0]
        if not pos:
            # all-negative differences mean dispatch jitter swamped the
            # loop-length delta — widen the span 4x and remeasure rather
            # than report |noise| as a rate
            print(f"# WARNING: all timing samples negative at n2={n2}; "
                  f"remeasuring at n2={4 * n2}", file=sys.stderr)
            samples = [(timed(4 * n2) - timed(n1)) / (4 * n2 - n1) * 1e3
                       for _ in range(5)]
            pos = [s for s in samples if s > 0]
        ms = min(pos) if pos else float("nan")
        # iteration telemetry over a settled span (warm-started CG)
        _, it_last, it_max = fast.run_telemetry(T, n1)
        return ms, int(it_last), int(it_max)

    dt_easy = 0.25 * h2
    ms, it_last, it_max = bench_dt(dt_easy, cg_maxiter=24)

    print(
        json.dumps(
            {
                "metric": "2d_heat_1024sq_BE_ms_per_step",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(ms / 10.0, 4),
            }
        )
    )
    print(f"# capacity build: {t_cap:.2f}s; device={jax.devices()[0]}",
          file=sys.stderr)
    print(f"# north-star dt=0.25h^2: {ms:.4f} ms/step, warm-started CG "
          f"iters/step last={it_last} max={it_max} (tol 1e-5)",
          file=sys.stderr)
    ms_s, it_last_s, it_max_s = bench_dt(100.0 * h2, cg_maxiter=600,
                                         n2=400)
    print(f"# stiff dt=100h^2:      {ms_s:.4f} ms/step, CG iters/step "
          f"last={it_last_s} max={it_max_s} (tol 1e-5, maxiter 600)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
