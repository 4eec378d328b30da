"""Long-context int8-KV A/B (VERDICT r3 item 7).

Measures bitnet-3b with bf16 vs int8 KV cache at:
  * ctx 8192 single stream (prompt 7936 + 128 decode steps) -- at this
    size the bf16 cache is ~3.5 GB and attention reads dominate;
  * ctx 2048, B=8 aggregate (prompt 1920 + 64 steps) -- the serving
    shape where int8 doubles the batch capacity (bf16 B=8 @8192 would
    be ~28 GB and cannot even allocate on a 16 GB chip).

Prints one CSV row per cell plus a JSON summary line.  Reference role:
SURVEY.md §5 long-context axis; the reference itself has no long-context
story (llama.cpp -c 2048).
"""
import json
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, init_params
from tmac_tpu.runtime.generate import decode_loop, prefill
from tmac_tpu.runtime.sampling import SamplerConfig
from tmac_tpu.tools.timing import null_roundtrip


def run_cell(cfg, params, B, prompt_len, steps, quant, reps=2):
    ov = null_roundtrip()
    rng = np.random.default_rng(0)
    max_len = prompt_len + steps

    def fresh():
        return KVCache.create(cfg, B, max_len, quant=quant)

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, prompt_len)))
    cache = fresh()
    logits, cache = prefill(params, cfg, toks, cache)  # compile
    _ = float(jnp.sum(logits))
    t_pre = float("inf")
    for _ in range(reps):
        toks_r = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, prompt_len)))
        c2 = fresh()
        t0 = time.perf_counter()
        lg, c2 = prefill(params, cfg, toks_r, c2)
        _ = float(jnp.sum(lg))
        t_pre = min(t_pre, time.perf_counter() - t0 - ov)

    first = jnp.argmax(logits, -1).astype(jnp.int32)
    out, cache = decode_loop(params, cfg, first, cache, jax.random.PRNGKey(0),
                             steps=steps, sampler=SamplerConfig())
    _ = int(jnp.sum(out))  # compile
    best = float("inf")
    for r in range(reps):
        toks_r = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, prompt_len)))
        c2 = fresh()
        lg, c2 = prefill(params, cfg, toks_r, c2)
        first = jnp.argmax(lg, -1).astype(jnp.int32)
        _ = float(jnp.sum(first))
        t0 = time.perf_counter()
        out, c2 = decode_loop(params, cfg, first, c2, jax.random.PRNGKey(r),
                              steps=steps, sampler=SamplerConfig())
        _ = int(jnp.sum(out))
        best = min(best, time.perf_counter() - t0 - ov)
    return {
        "batch": B, "prompt_len": prompt_len, "steps": steps,
        "kv": "int8" if quant else "bf16",
        "decode_tok_s": round(B * steps / best, 2),
        "prefill_tok_s": round(B * prompt_len / t_pre, 2),
    }


def run_engine_cell(cfg, params, prompt_len, new_tokens, max_chunk):
    """The ENGINE path at long context (BENCH.md's 156-tok/s weak spot):
    prompt 1500+ through continuous batching, decode with fixed chunk 32
    vs the adaptive ceiling -- measures the host-round-trip amortization
    (VERDICT r3 weak #4)."""
    from tmac_tpu.runtime.engine import InferenceEngine

    rng = np.random.default_rng(0)
    eng = InferenceEngine(cfg, params, max_batch=1,
                          max_len=prompt_len + new_tokens + 64,
                          decode_chunk=32, max_decode_chunk=max_chunk)
    prompt = [int(t) for t in rng.integers(0, cfg.vocab_size, prompt_len)]
    uid = eng.submit(prompt, max_new_tokens=new_tokens)   # compile pass
    eng.run()
    best = float("inf")
    for r in range(2):
        prompt = [int(t) for t in rng.integers(0, cfg.vocab_size, prompt_len)]
        eng2 = InferenceEngine(cfg, params, max_batch=1,
                               max_len=prompt_len + new_tokens + 64,
                               decode_chunk=32, max_decode_chunk=max_chunk)
        uid = eng2.submit(prompt, max_new_tokens=new_tokens)
        t0 = time.perf_counter()
        res = eng2.run()
        dt = time.perf_counter() - t0
        assert len(res[uid]) == new_tokens
        # decode-only rate from engine stats (prefill excluded)
        best = min(best, eng2.stats["decode_s"])
    return {
        "prompt_len": prompt_len, "new_tokens": new_tokens,
        "max_decode_chunk": max_chunk,
        "decode_tok_s": round(new_tokens / best, 2),
    }


def main():
    cfg = get_preset("bitnet-3b")
    params = init_params(cfg, seed=0)
    # engine adaptive-chunk A/B FIRST: it is the round-3 weak-#4
    # measurement, and a window/timeout cut must not lose it
    eng_rows = []
    for mx in (0, 128):
        r = run_engine_cell(cfg, params, 1500, 128, mx)
        eng_rows.append(r)
        print(f"engine ctx1500 max_chunk={mx}: {r['decode_tok_s']} tok/s",
              flush=True)
    rows = []
    print("batch,prompt_len,steps,kv,decode_tok_s,prefill_tok_s", flush=True)
    for B, plen, steps in ((1, 7936, 128), (8, 1920, 64)):
        for quant in (False, True):
            r = run_cell(cfg, params, B, plen, steps, quant)
            rows.append(r)
            print(f"{r['batch']},{r['prompt_len']},{r['steps']},{r['kv']},"
                  f"{r['decode_tok_s']},{r['prefill_tok_s']}", flush=True)
    print(json.dumps({"longctx_ab": rows, "engine_adaptive": eng_rows}))


if __name__ == "__main__":
    main()
