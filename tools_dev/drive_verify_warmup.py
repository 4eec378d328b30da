"""Verify drive (round 5): Engine.warmup() on the real TPU.

Checks, on a scaled bitnet config with the pallas/flash path engaged
(max_len > 512):
  1. warmup() completes and compiles the serving programs;
  2. a shared-prefix workload after warmup() gets prefix hits and NO
     mid-run compile stalls (max per-request wall time bounded);
  3. warmed tokens == cold engine tokens (greedy).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np
import jax

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import init_params
from tmac_tpu.runtime.engine import InferenceEngine

assert jax.devices()[0].platform != "cpu", "needs the TPU"

cfg = get_preset("bitnet-3b").scaled(4)  # /4 size: fast tunnel compiles
params = init_params(cfg, seed=0)
rng = np.random.default_rng(5)
shared = [int(t) for t in rng.integers(1, cfg.vocab_size, 128)]
prompts = [shared + [int(t) for t in rng.integers(1, cfg.vocab_size, 64)]
           for _ in range(6)]


def drive(warm: bool):
    eng = InferenceEngine(cfg, params, max_batch=2, max_len=768,
                          decode_chunk=8, prefill_chunk=256,
                          prefix_cache_size=4)
    t0 = time.perf_counter()
    if warm:
        eng.warmup()
    t_warm = time.perf_counter() - t0
    outs, times = [], []
    for p in prompts:
        t0 = time.perf_counter()
        u = eng.submit(p, max_new_tokens=8)
        outs.append(eng.run()[u])
        times.append(time.perf_counter() - t0)
    return outs, times, t_warm, eng.stats["prefix_hits"]


cold_outs, cold_t, _, cold_hits = drive(False)
warm_outs, warm_t, t_warm, warm_hits = drive(True)

print(f"warmup() took {t_warm:.1f}s")
print(f"cold per-request s: {['%.2f' % t for t in cold_t]} hits={cold_hits}")
print(f"warm per-request s: {['%.2f' % t for t in warm_t]} hits={warm_hits}")
assert warm_outs == cold_outs, (cold_outs, warm_outs)
assert warm_hits == cold_hits == len(prompts) - 1
# after warmup, NO request should hit a compile: each of the 6 requests
# is prefill(2 chunks) + 1 decode chunk -- well under a second of compute;
# a compile stall is tens of seconds.  Allow generous tunnel slack.
assert max(warm_t) < min(10.0, 3 * max(0.2, np.median(warm_t)) + 2.0), warm_t
print("OK: warmed engine = cold tokens, prefix hits intact, no mid-run "
      "compile stalls")
