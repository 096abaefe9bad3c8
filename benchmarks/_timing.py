"""Honest device timing through the remote-dispatch TPU tunnel.

Two traps (measured, see docs/BENCHMARKS.md "Bandwidth roofline"):
  1. ``block_until_ready`` returns before remote execution finishes — a
     device->host scalar read is the only real barrier.
  2. Every synchronized call pays a fixed ~30-45 ms round trip, which
     swamps sub-millisecond kernels.  Differencing two loop lengths
     cancels it.
"""

import time


def sync_scalar(x):
    """Force execution: device->host read of one scalar derived from x."""
    return float(x.ravel()[0])


def per_step_ms(run_fn, n_lo, n_hi, reps=3):
    """Per-iteration milliseconds of ``run_fn(n) -> array`` where n is the
    on-device loop length.  Assumes run_fn(n) was already called once for
    each n (compile warm-up)."""

    def timed(n):
        t0 = time.perf_counter()
        sync_scalar(run_fn(n))
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(reps):
        best = min(best, (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo))
    return best * 1e3
