"""Mixed-arrival serving benchmark: aggregate throughput + latency
percentiles under continuous batching.

The serving-side counterpart of bench-e2e's single-stream sweep (the
reference has no serving story at all -- llama.cpp runs one request
start-to-finish).  Drives the InferenceEngine with a deterministic Poisson
arrival process and reports aggregate decode tokens/s, time-to-first-token
(TTFT: submit -> first output token committed) and per-request completion
latency.  The interleaved prefill/decode scheduler (engine.prefill_budget)
is what keeps TTFT bounded while decodes run.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np


def run_serve_bench(engine, prompts: List[List[int]], max_new: int,
                    arrival_rate: float, seed: int = 0,
                    eos_id: Optional[int] = None) -> dict:
    """Submit `prompts` with exponential inter-arrival gaps (mean
    1/arrival_rate seconds) while stepping the engine; returns aggregate
    stats.  Single-threaded: arrivals are injected between engine ticks at
    their due time (deterministic given the seed)."""
    rng = np.random.default_rng(seed)
    gaps = rng.exponential(1.0 / arrival_rate, len(prompts))
    due = np.cumsum(gaps)

    submit_t: dict[int, float] = {}
    first_tok_t: dict[int, float] = {}
    done_t: dict[int, float] = {}
    uid_of: dict[int, int] = {}

    seen_progress: dict[int, int] = {}
    t0 = time.perf_counter()
    next_i = 0
    while len(done_t) < len(prompts):
        now = time.perf_counter() - t0
        while next_i < len(prompts) and now >= due[next_i]:
            uid = engine.submit(prompts[next_i], max_new_tokens=max_new,
                                eos_id=eos_id)
            uid_of[next_i] = uid
            submit_t[uid] = time.perf_counter()
            next_i += 1
            now = time.perf_counter() - t0
        if engine.pending():
            engine.step()
        elif next_i < len(prompts):
            time.sleep(min(0.002, max(0.0, due[next_i] - now)))
        # record first-token times and completions
        for req in list(engine.slots):
            if req is not None and req.output and req.uid not in first_tok_t:
                first_tok_t[req.uid] = time.perf_counter()
        for uid, req in engine.finished.items():
            if uid not in done_t:
                if uid not in first_tok_t:
                    first_tok_t[uid] = time.perf_counter()
                done_t[uid] = time.perf_counter()

    wall = time.perf_counter() - t0
    total_new = sum(len(r.output) for r in engine.finished.values())
    ttft = np.array([first_tok_t[u] - submit_t[u] for u in submit_t])
    lat = np.array([done_t[u] - submit_t[u] for u in submit_t])
    return {
        "requests": len(prompts),
        "wall_s": round(wall, 3),
        "aggregate_tok_s": round(total_new / wall, 2),
        "ttft_p50_s": round(float(np.percentile(ttft, 50)), 4),
        "ttft_p95_s": round(float(np.percentile(ttft, 95)), 4),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 4),
        "latency_p95_s": round(float(np.percentile(lat, 95)), 4),
        "prefill_tokens": engine.stats["prefill_tokens"],
        "decode_tokens": engine.stats["decode_tokens"],
    }
