"""Itemize the bitnet-3b decode step cost on v5e (VERDICT #2).

Components timed with the chained protocol; run from /root/repo when the
chip is free.  Optional argv[1]: comma-separated section numbers to run
(e.g. `4,5` to resume after a timeout killed the ablation sections --
each ablation is a full-model recompile, ~2-4 min each on the tunnel).
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, forward, init_params
from tmac_tpu.ops.qgemm import qgemm
from tmac_tpu.tools.timing import bench_chained, null_roundtrip

SECTIONS = {int(x) for x in sys.argv[1].split(",")} if len(sys.argv) > 1 \
    else {1, 2, 3, 4, 5}


def enabled(n: int) -> bool:
    return n in SECTIONS


cfg = get_preset("bitnet-3b")
# heartbeat prints bound WHERE a tunnel hang happened (the 00:54 run sat
# 15 min with an empty log -- unlocatable)
print("init_params...", flush=True)
params = init_params(cfg, seed=0)
print("null_roundtrip...", flush=True)
ov = null_roundtrip()
print(f"null {ov*1e3:.1f} ms", flush=True)

H = cfg.hidden_size
layer0 = params["layers"][0]

# 1) one fused qkv linear (per-tensor fused path), chained
x0 = jnp.asarray(np.random.default_rng(0).standard_normal((1, H)), jnp.bfloat16)


def t_linears(x):
    # one full layer's 4 linears with the production folds, glue-free
    qkv = qgemm(x, layer0["wqkv"], impl="pallas", act="fused",
                out_dtype=jnp.float32,
                norm=(layer0["attn_norm"], cfg.rms_norm_eps))
    attn_in = qkv[:, :H].astype(jnp.bfloat16)
    o = qgemm(attn_in, layer0["wo"], impl="pallas", act="fused",
              out_dtype=jnp.float32, residual=x.astype(jnp.float32))
    xo = o.astype(jnp.bfloat16)
    gu = qgemm(xo, layer0["gate_up"], impl="pallas", act="fused",
               out_dtype=jnp.float32,
               norm=(layer0["mlp_norm"], cfg.rms_norm_eps))
    d = qgemm(gu.astype(jnp.bfloat16), layer0["down"], impl="pallas",
              act="fused", out_dtype=jnp.float32, glu=True,
              residual=xo.astype(jnp.float32))
    return d, d[:, :H].astype(x.dtype)


if enabled(1):
    t = bench_chained(t_linears, x0, iters=50, reps=3, overhead=ov)
    print(f"4 linears (1 layer, fused folds): {t*1e6:.1f} us -> x26 = "
          f"{t*26*1e3:.3f} ms", flush=True)

# 2) flash attention per layer, short vs long position.
# The cache MUST be materialized random data: a zeros cache lowers to an
# XLA broadcast that the while-loop REMATERIALIZES (memsets) every
# chained iteration, inflating the kernel ~4x (round-5 probe: 34.9 us
# zeros vs 9.7 us real at S=384 pos=300, bench_artifacts/r5/attn_probe3).
from tmac_tpu.ops.pallas.attention_kernel import flash_decode_stacked
S = 320
cache = KVCache.create(cfg, 1, S)
_crng = np.random.default_rng(9)
cache = KVCache(
    k=jnp.asarray(_crng.standard_normal(cache.k.shape), cache.k.dtype),
    v=jnp.asarray(_crng.standard_normal(cache.v.shape), cache.v.dtype),
    pos=cache.pos, k_scale=cache.k_scale, v_scale=cache.v_scale)
KV, D = cfg.num_kv_heads, cfg.head_dim
rep = cfg.num_heads // KV
q0 = jnp.asarray(np.random.default_rng(1).standard_normal((1, KV, rep, D)),
                 jnp.bfloat16)

for pos in ((17, 300) if enabled(2) else ()):
    lens = jnp.asarray([pos], jnp.int32)

    def t_flash(q, lens=lens):
        o = flash_decode_stacked(q, cache.k, cache.v, lens, jnp.int32(3),
                                 scale=0.1)
        return o, o.astype(q.dtype)

    t = bench_chained(t_flash, q0, iters=100, reps=3, overhead=ov)
    print(f"flash decode (1 layer, S={S}, pos={pos}): {t*1e6:.1f} us -> "
          f"x26 = {t*26*1e3:.3f} ms", flush=True)

# 3) head path: final norm + per-token quant + XLA int8 dot
head = params["lm_head"]


def t_head(x):
    from tmac_tpu.models.llama import quantize_activations_int8, rms_norm
    xn = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    xq, xs = quantize_activations_int8(xn)
    logits = qgemm(xq, head, impl="xla", out_dtype=jnp.float32) * xs
    return logits, logits[:, :H].astype(x.dtype)


if enabled(3):
    t = bench_chained(t_head, x0, iters=50, reps=3, overhead=ov)
    print(f"head (norm+quant+int8 dot): {t*1e6:.1f} us", flush=True)

# 4) full decode step at short vs long starting position (the measured
# position-dependence: bench-e2e bitnet 624 tok/s @pos~16 -> 453 @pos~256)
from tmac_tpu.runtime.sampling import SamplerConfig, sample
import time


# params as an ARGUMENT, not a closure: closed-over weights embed as HLO
# constants and the multi-GB program upload breaks the remote compiler
@jax.jit
def loop_steps(params, tok, cache):
    def body(i, carry):
        tok, cache = carry
        logits, cache = forward(params, cfg, tok[:, None], cache)
        nxt = sample(logits[:, -1, :], jax.random.PRNGKey(0), SamplerConfig())
        return (nxt, cache)
    tok, cache = jax.lax.fori_loop(0, 32, body, (tok, cache))
    return tok, cache


tok0 = jnp.asarray([5], jnp.int32)
for start in ((1, 270) if enabled(4) else ()):
    cache_full = KVCache.create(cfg, 1, S)
    cache_full = KVCache(k=cache_full.k, v=cache_full.v,
                         pos=jnp.asarray([start], jnp.int32))
    o = loop_steps(params, tok0, cache_full)
    int(o[0][0])
    best = float("inf")
    for r in range(3):
        cache_r = KVCache.create(cfg, 1, S)
        cache_r = KVCache(k=cache_r.k, v=cache_r.v,
                          pos=jnp.asarray([start], jnp.int32))
        tok_r = jnp.asarray([5 + r], jnp.int32)
        t0 = time.perf_counter()
        tok, cr = loop_steps(params, tok_r, cache_r)
        int(tok[0])
        best = min(best, time.perf_counter() - t0)
    print(f"full step from pos {start}: {(best-ov)/32*1e3:.3f} ms/token "
          f"({32/(best-ov):.1f} tok/s)", flush=True)


# 5) glue itemization: full-step deltas with components ablated.
# forward() reads TMAC_DEBUG_SKIP at TRACE time, so each setting gets a
# fresh jit.  The deltas vs the baseline itemize what "norms + rope +
# cache + sampling" actually costs in situ (fusion/overlap effects
# included -- a standalone microbench can't see those).
import warnings


def timed_step_loop(skip: str, do_sample: bool, start: int = 270) -> float:
    os.environ["TMAC_DEBUG_SKIP"] = skip

    @jax.jit
    def steps(params, tok, cache):
        def body(i, carry):
            tok, cache = carry
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                logits, cache = forward(params, cfg, tok[:, None], cache)
            if do_sample:
                nxt = sample(logits[:, -1, :], jax.random.PRNGKey(0),
                             SamplerConfig())
            else:
                nxt = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
            return (nxt, cache)
        return jax.lax.fori_loop(0, 32, body, (tok, cache))

    def fresh_cache():
        c = KVCache.create(cfg, 1, S)
        return KVCache(k=c.k, v=c.v, pos=jnp.asarray([start], jnp.int32))

    o = steps(params, tok0, fresh_cache())
    int(o[0][0])  # compile + warm
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        tok, _ = steps(params, jnp.asarray([5 + r], jnp.int32), fresh_cache())
        int(tok[0])
        best = min(best, time.perf_counter() - t0)
    os.environ.pop("TMAC_DEBUG_SKIP", None)
    return (best - ov) / 32


if not enabled(5):
    sys.exit(0)
base = timed_step_loop("", True)
print(f"\nablation table (pos 270, ms/token; delta = component cost in situ)")
print(f"  baseline             : {base*1e3:.3f}")
for skip, label in (("rope", "rope"), ("kvwrite", "kv write"),
                    ("attn", "attention"), ("rope,kvwrite", "rope+kvwrite")):
    t = timed_step_loop(skip, True)
    print(f"  -{label:<20}: {t*1e3:.3f}  (delta {(base-t)*1e6:+.0f} us)",
          flush=True)
t = timed_step_loop("", False)
print(f"  argmax-only sampling : {t*1e3:.3f}  (delta {(base-t)*1e6:+.0f} us)",
      flush=True)
