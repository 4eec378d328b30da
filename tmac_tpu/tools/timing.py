"""Reliable on-device timing.

Through remote-tunnel TPU setups, dispatch is fire-and-forget
(block_until_ready returns early) and identical executions may be cached,
so wall-clock of single dispatches is meaningless.  Protocol: run a
dependent on-device chain of `iters` calls inside one jit (output feeds the
next input with a non-zero coefficient so nothing folds away), fetch a
scalar, and subtract the measured null round-trip.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def null_roundtrip(reps: int = 5) -> float:
    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8, 128))
    float(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_chained(step: Callable, x0: jax.Array, iters: int = 100,
                  reps: int = 3, overhead: float | None = None,
                  min_work: float = 0.02) -> float:
    """Seconds per call of `step`, a function x -> y where y can be folded
    back into an array of x's shape/dtype via the returned feedback.

    step must return (out, feedback) where feedback has x's shape/dtype.

    min_work: minimum chained-work seconds per timed call.  The tunnel's
    round-trip has a few ms of jitter, so when iters x per-call time is
    sub-millisecond, `best - overhead` measures noise (observed: 0.0 us
    for every autotune candidate at N<=64 with 60 iters, which then
    seeded the tune table with arbitrary block_m picks).  When the first
    measurement lands under min_work the loop is rebuilt with
    proportionally more iterations and remeasured -- one extra compile,
    bounded at 512x."""
    if overhead is None:
        overhead = null_roundtrip()

    def build(n: int):
        @jax.jit
        def loop(x):
            def body(i, x):
                _, fb = step(x)
                if jnp.issubdtype(x.dtype, jnp.integer):
                    # +-1 perturbation; *1e-8 would round to 0 and let XLA
                    # hoist the whole loop
                    return (x + (fb.astype(jnp.int32) & 1).astype(x.dtype))
                return (x + fb * jnp.asarray(1e-8, x.dtype)).astype(x.dtype)
            r = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(r.astype(jnp.float32))
        return loop

    def measure(loop):
        float(loop(x0))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(x0))
            best = min(best, time.perf_counter() - t0)
        return best - overhead

    work = measure(build(iters))
    if work < min_work:
        per = max(work / iters, 2e-7)  # noise floor: assume >= 0.2 us/call
        scale = min(-(-min_work // (per * iters)), 512)  # ceil, bounded
        iters = int(iters * scale)
        work = measure(build(iters))
    # Even rescaled, `best - overhead` can be <= 0 under tunnel RTT jitter
    # (the 512x cap can leave sub-min_work chains for genuinely tiny steps).
    # Floor at the noise floor rather than returning ~0: a 0 us result is
    # junk that wins every autotune comparison (commit 3f7b1d7).
    return max(work / iters, 2e-7)
