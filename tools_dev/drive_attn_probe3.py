"""Probe 3: is the ~30 us 'operand staging' cost an artifact of zeros
caches (XLA rematerializes a broadcast -> memset per loop iteration), or
real?  Re-measure with MATERIALIZED random cache buffers, and dump the
real decode step's HLO to count in-situ copies.

Sections: B1r C1r C2r HLO1 STEP
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import re

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache
from tmac_tpu.ops.pallas.attention_kernel import flash_decode_stacked
from tmac_tpu.tools.timing import bench_chained, null_roundtrip

SECTIONS = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else \
    {"B1r", "C1r", "C2r", "HLO1", "STEP"}

cfg = get_preset("bitnet-3b")
KV, D = cfg.num_kv_heads, cfg.head_dim
rep = cfg.num_heads // KV
ov = null_roundtrip()
print(f"null {ov*1e3:.1f} ms", flush=True)

rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((1, KV, rep, D)), jnp.bfloat16)


def real_cache(S):
    """KVCache whose buffers are device-put REAL data (not a foldable
    broadcast): XLA must treat them as parameters, like the donated cache
    of a production decode step."""
    c = KVCache.create(cfg, 1, S)
    k = jnp.asarray(
        rng.standard_normal(c.k.shape).astype(np.float32), c.k.dtype)
    v = jnp.asarray(
        rng.standard_normal(c.v.shape).astype(np.float32), c.v.dtype)
    return KVCache(k=k, v=v, pos=c.pos, k_scale=c.k_scale, v_scale=c.v_scale)


def _noop_hbm(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = q_ref[...] * jnp.asarray(1.000001, q_ref.dtype)


def make_hbm_only(cache):
    def run(x):
        o = pl.pallas_call(
            _noop_hbm,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, cache.k, cache.v)
        return o, o
    return run


if "B1r" in SECTIONS:
    cache = real_cache(384)
    t = bench_chained(make_hbm_only(cache), q0, iters=100, reps=3,
                      overhead=ov)
    print(f"B1r noop + REAL HBM refs S=384:         {t*1e6:7.1f} us",
          flush=True)

for name, S, pos in (("C1r", 384, 300), ("C2r", 2048, 2000)):
    if name not in SECTIONS:
        continue
    cache = real_cache(S)
    lens = jnp.asarray([pos], jnp.int32)

    def t_flash(q, lens=lens, cache=cache):
        o = flash_decode_stacked(q, cache.k, cache.v, lens, jnp.int32(3),
                                 scale=0.1)
        return o, o.astype(q.dtype)

    t = bench_chained(t_flash, q0, iters=100, reps=3, overhead=ov)
    print(f"{name} flash REAL cache S={S:<5} pos={pos:<5}: {t*1e6:7.1f} us",
          flush=True)

if "HLO1" in SECTIONS:
    cache = real_cache(384)
    step = make_hbm_only(cache)

    def loop(x, k, v):
        def body(i, x):
            o = pl.pallas_call(
                _noop_hbm,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.HBM),
                          pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            )(x, k, v)
            return (x + o * jnp.asarray(1e-8, x.dtype)).astype(x.dtype)
        r = jax.lax.fori_loop(0, 100, body, x)
        return jnp.sum(r.astype(jnp.float32))

    txt = jax.jit(loop).lower(q0, cache.k, cache.v).compile().as_text()
    big = [l.strip()[:200] for l in txt.splitlines()
           if re.search(r"copy|broadcast", l)
           and re.search(r"26,1,32", l)]
    print(f"HLO1 big-buffer copy/broadcast lines in compiled loop: {len(big)}")
    for l in big[:20]:
        print("   ", l, flush=True)

if "STEP" in SECTIONS:
    # the production decode step itself: donated cache, real params --
    # count whole-cache copies in the compiled HLO
    from tmac_tpu.models.llama import forward, init_params
    import functools
    params = init_params(cfg, seed=0)
    cache = real_cache(384)

    @functools.partial(jax.jit, donate_argnames=("cache",))
    def step(params, tok, cache):
        logits, cache = forward(params, cfg, tok[:, None], cache)
        return jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32), cache

    txt = step.lower(params, jnp.asarray([5], jnp.int32), cache) \
              .compile().as_text()
    pat = re.compile(r"copy\(")
    big = [l.strip()[:220] for l in txt.splitlines()
           if "copy" in l and re.search(r"\b26,1,32,\d+,128", l)]
    print(f"STEP whole-cache copy lines in compiled decode step: {len(big)}")
    for l in big[:30]:
        print("   ", l, flush=True)
    fus = [l.strip()[:160] for l in txt.splitlines()
           if re.search(r"\b26,1,32,\d+,128", l)
           and re.search(r"fusion|dynamic-update|broadcast", l)]
    print(f"STEP whole-cache fusion/DUS/broadcast lines: {len(fus)}")
    for l in fus[:30]:
        print("   ", l, flush=True)
