"""Speculative-decode hardware bench: tok/s on repetitive vs random
contexts, plus the T=k+1 verify-step cost vs a T=1 decode step.

Run from /root/repo when the chip is free:
    python tools_dev/drive_spec_bench.py [preset]
"""
import os
import sys
import time

import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


log("devices:", jax.devices())

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, init_params
from tmac_tpu.runtime.generate import decode_loop, prefill
from tmac_tpu.runtime.sampling import SamplerConfig
from tmac_tpu.runtime.speculative import decode_loop_speculative

preset = sys.argv[1] if len(sys.argv) > 1 else "bitnet-3b"
cfg = get_preset(preset)
params = jax.device_put(init_params(cfg, seed=0))
rng = np.random.default_rng(0)
T, steps, k = 64, 192, 8
S = T + steps + k + 2

# a repetitive prompt: the worst case for entropy, the best for lookup --
# models the code/transcript/retrieval contexts lookup decoding targets
base = rng.integers(0, cfg.vocab_size, 8)
rep_prompt = np.tile(base, T // 8)[None, :]
rand_prompt = rng.integers(0, cfg.vocab_size, (1, T))


def run(prompt, label):
    toks = jnp.asarray(prompt, jnp.int32)
    cache = KVCache.create(cfg, 1, S)
    logits, cache = prefill(params, cfg, toks, cache)
    first = jnp.argmax(logits.astype(jnp.float32), -1).astype(jnp.int32)

    # plain decode reference timing
    c2 = KVCache.create(cfg, 1, S)
    lg2, c2 = prefill(params, cfg, toks, c2)
    f2 = jnp.argmax(lg2.astype(jnp.float32), -1).astype(jnp.int32)
    t1 = time.perf_counter()
    out_ref, _ = decode_loop(params, cfg, f2, c2, jax.random.PRNGKey(0),
                             steps=steps - 1, sampler=SamplerConfig())
    n_ref = int(np.asarray(out_ref).size)  # value fetch forces completion
    dt_ref = time.perf_counter() - t1

    t1 = time.perf_counter()
    out, nf, _ = decode_loop_speculative(params, cfg, first, cache, toks,
                                         steps=steps, k=k)
    got = np.asarray(out)  # forces completion
    dt = time.perf_counter() - t1
    nf = int(nf)
    log(f"{label}: plain {steps-1} tok in {dt_ref*1e3:.0f} ms "
        f"({(steps-1)/dt_ref:.1f} tok/s) | spec {steps} tok in {dt*1e3:.0f} ms "
        f"({steps/dt:.1f} tok/s) with {nf} forwards "
        f"({steps/max(nf,1):.2f} tok/forward)")
    return steps / dt, (steps - 1) / dt_ref, nf


# warm-up compile pass (discard timings)
log("compiling...")
run(rep_prompt, "warmup")

s_rep, p_rep, nf_rep = run(rep_prompt, "repetitive")
s_rand, p_rand, nf_rand = run(rand_prompt, "random")
log(f"SUMMARY preset={preset} k={k}: repetitive spec/plain = "
    f"{s_rep/p_rep:.2f}x ({nf_rep} fwd/{steps} tok); random = "
    f"{s_rand/p_rand:.2f}x ({nf_rand} fwd)")

# two-model draft speculation: a 700M BitNet drafting for the target
# (synthetic weights: acceptance is what it is -- the interesting numbers
# are the verified tok/s ceiling and the draft-round overhead)
if os.environ.get("TMAC_SPEC_DRAFT"):
    import dataclasses

    from tmac_tpu.runtime.speculative import generate_draft_speculative
    cfg_d = dataclasses.replace(get_preset("bitnet-700m"),
                                vocab_size=cfg.vocab_size)
    params_d = jax.device_put(init_params(cfg_d, seed=3))
    for label, prompt in (("repetitive", rep_prompt), ("random", rand_prompt)):
        # compile pass then timed pass
        for timed in (False, True):
            t1 = time.perf_counter()
            out, nft, nfd = generate_draft_speculative(
                params, cfg, params_d, cfg_d, prompt,
                max_new_tokens=steps, max_len=S, k=4)
            _ = np.asarray(out)
            dt = time.perf_counter() - t1
            if timed:
                log(f"draft-spec {label}: {steps} tok in {dt*1e3:.0f} ms "
                    f"({steps/dt:.1f} tok/s), {nft} target + {nfd} draft "
                    f"forwards ({steps/max(nft,1):.2f} tok/target-forward)")
