"""Dissect the flash-decode attention cost (VERDICT r5 item 3).

Round-4 left a contradiction: the BENCH.md kernel table lists flash
decode at 4.5 us/layer (S=256), while the r4 breakdown driver's own
standalone section measured 34.9-38.8 us/layer (S=320->384) -- and the
in-situ ablation attributed ~1.0 ms of the 1.79 ms decode step to
attention.  This probe isolates where the time actually goes:

  A  per-call fixed cost of a minimal pallas kernel (VMEM in/out);
  B  the same with the full stacked HBM cache + SMEM scalars as
     operands (operand staging cost);
  C  flash_decode_stacked across S/pos/blk (the DMA pipeline);
  D  flash_decode_stacked_append (the production deferred form);
  E  attention + its per-layer glue exactly as models/llama.forward
     stages it (rope + reshapes + 2 cache writes + kernel).

Run from anywhere: python tools_dev/drive_attn_probe.py [sections]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, rope, rope_tables
from tmac_tpu.ops.pallas.attention_kernel import (flash_decode_stacked,
                                                  flash_decode_stacked_append)
from tmac_tpu.tools.timing import bench_chained, null_roundtrip

SECTIONS = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else \
    {"A", "B", "C", "D", "E"}

cfg = get_preset("bitnet-3b")
KV, D = cfg.num_kv_heads, cfg.head_dim
rep = cfg.num_heads // KV
L = cfg.num_layers
ov = null_roundtrip()
print(f"null {ov*1e3:.1f} ms; KV={KV} rep={rep} D={D} L={L}", flush=True)

rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((1, KV, rep, D)), jnp.bfloat16)


def _minimal_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 1.000001


def run_minimal(x):
    o = pl.pallas_call(
        _minimal_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)
    return o, o


if "A" in SECTIONS:
    t = bench_chained(run_minimal, q0, iters=200, reps=3, overhead=ov)
    print(f"A minimal pallas (VMEM in/out):            {t*1e6:6.1f} us",
          flush=True)


def _staged_kernel(lens_ref, li_ref, q_ref, k_ref, v_ref, o_ref):
    scale = (1.0 + 1e-6 * lens_ref[0].astype(jnp.float32)).astype(q_ref.dtype)
    o_ref[...] = q_ref[...] * scale


def make_staged(cache):
    def run(x):
        o = pl.pallas_call(
            _staged_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(jnp.asarray([17], jnp.int32), jnp.asarray([3], jnp.int32),
          x, cache.k, cache.v)
        return o, o
    return run


if "B" in SECTIONS:
    cache = KVCache.create(cfg, 1, 384)
    t = bench_chained(make_staged(cache), q0, iters=200, reps=3, overhead=ov)
    print(f"B minimal + HBM cache + SMEM scalars:      {t*1e6:6.1f} us",
          flush=True)

if "C" in SECTIONS:
    for S, pos in ((256, 250), (384, 17), (384, 300), (2048, 2000)):
        cache = KVCache.create(cfg, 1, S)
        lens = jnp.asarray([pos], jnp.int32)

        def t_flash(q, lens=lens, cache=cache):
            o = flash_decode_stacked(q, cache.k, cache.v, lens, jnp.int32(3),
                                     scale=0.1)
            return o, o.astype(q.dtype)

        t = bench_chained(t_flash, q0, iters=100, reps=3, overhead=ov)
        print(f"C flash S={S:<5} pos={pos:<5}:                {t*1e6:6.1f} us",
              flush=True)

if "D" in SECTIONS:
    cache = KVCache.create(cfg, 1, 384)
    lens = jnp.asarray([300], jnp.int32)
    ck = jnp.asarray(rng.standard_normal((1, KV, D)), jnp.bfloat16)

    def t_append(q, lens=lens, cache=cache):
        o = flash_decode_stacked_append(q, cache.k, cache.v, lens,
                                        jnp.int32(3), ck, ck, scale=0.1)
        return o, o.astype(q.dtype)

    t = bench_chained(t_append, q0, iters=100, reps=3, overhead=ov)
    print(f"D flash append S=384 pos=300:              {t*1e6:6.1f} us",
          flush=True)

if "E" in SECTIONS:
    # per-layer attention + glue exactly as forward() stages it at T=1
    S = 384
    cache = KVCache.create(cfg, 1, S)
    pos = jnp.asarray([300], jnp.int32)
    positions = pos[:, None]
    cs = rope_tables(positions, cfg.head_dim, cfg.rope_theta,
                     cfg.rope_scaling)
    H = cfg.hidden_size
    xqkv = jnp.asarray(rng.standard_normal((1, cfg.q_dim + 2 * cfg.kv_dim)),
                       jnp.float32)

    # NOTE: no cache writes here -- a DUS against a loop-invariant closure
    # would force a whole-cache copy per iteration (the model threads the
    # cache through the step carry instead), and the deferred-KV A/B
    # already measured the writes as a wash (BENCH.md).  E isolates
    # rope + reshape/split glue + the append kernel.
    def t_layer(xin, cache=cache):
        qkv = xin
        qd, kvd = cfg.q_dim, cfg.kv_dim
        q = qkv[None, :, :qd]
        k = qkv[None, :, qd:qd + kvd]
        v = qkv[None, :, qd + kvd:]
        q = rope(q.reshape(1, 1, cfg.num_heads, cfg.head_dim), cs)
        k = rope(k.reshape(1, 1, cfg.num_kv_heads, cfg.head_dim), cs)
        v = v.reshape(1, 1, cfg.num_kv_heads, cfg.head_dim)
        o = flash_decode_stacked_append(
            q.reshape(1, KV, rep, D).astype(jnp.bfloat16),
            cache.k, cache.v, pos, jnp.int32(3),
            k.reshape(1, KV, D).astype(jnp.bfloat16),
            v.reshape(1, KV, D).astype(jnp.bfloat16), scale=0.1)
        out = o.reshape(1, 1, cfg.q_dim).astype(jnp.float32)
        fb = jnp.tile(out[0], (1, (xin.shape[1] + out.shape[2] - 1)
                               // out.shape[2]))[:, :xin.shape[1]]
        return out, fb

    t = bench_chained(t_layer, xqkv, iters=100, reps=3, overhead=ov)
    print(f"E rope+glue+append kernel (per layer):     {t*1e6:6.1f} us",
          flush=True)
