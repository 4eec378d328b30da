"""Round-5 follow-up probe: WHY does merely passing the stacked HBM cache
to a pallas kernel cost ~30 us (drive_attn_probe.py section B)?

Variants of the no-op staged kernel:
  B0   SMEM scalars only, no HBM refs
  B1   HBM refs only (S=384), no SMEM scalars
  B2   HBM refs, tiny cache (S=8)
  B3   HBM refs, big cache (S=2048)
  B4   HBM refs (S=384) where the kernel READS nothing but k/v are
       passed THROUGH a jnp.asarray copy first (fresh layout)
  HLO  dump the while-loop HLO of B1 and grep for copies/fusions
  C4   flash kernel, S=2048 pos=2000, blk=256 (fewer, bigger DMA blocks)

Run: python tools_dev/drive_attn_probe2.py [sections]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

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
    {"B0", "B1", "B2", "B3", "HLO", "C4"}

cfg = get_preset("bitnet-3b")
KV, D = cfg.num_kv_heads, cfg.head_dim
rep = cfg.num_heads // KV
ov = null_roundtrip()
print(f"null {ov*1e3:.1f} ms", flush=True)

rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((1, KV, rep, D)), jnp.bfloat16)


def _noop_smem(lens_ref, li_ref, q_ref, o_ref):
    s = (1.0 + 1e-6 * lens_ref[0].astype(jnp.float32)).astype(q_ref.dtype)
    o_ref[...] = q_ref[...] * s


def run_smem_only(x):
    o = pl.pallas_call(
        _noop_smem,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(jnp.asarray([17], jnp.int32), jnp.asarray([3], jnp.int32), x)
    return o, o


if "B0" in SECTIONS:
    t = bench_chained(run_smem_only, q0, iters=200, reps=3, overhead=ov)
    print(f"B0 noop + SMEM scalars only:            {t*1e6:7.1f} us",
          flush=True)


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


for name, S in (("B1", 384), ("B2", 8), ("B3", 2048)):
    if name not in SECTIONS:
        continue
    cache = KVCache.create(cfg, 1, S)
    mb = cache.k.size * cache.k.dtype.itemsize / 1e6
    t = bench_chained(make_hbm_only(cache), q0, iters=100, reps=3,
                      overhead=ov)
    print(f"{name} noop + HBM refs S={S:<5} ({mb:6.1f} MB/side): "
          f"{t*1e6:7.1f} us", flush=True)

if "HLO" in SECTIONS:
    cache = KVCache.create(cfg, 1, 384)
    step = make_hbm_only(cache)

    @jax.jit
    def loop(x):
        def body(i, x):
            _, fb = step(x)
            return (x + fb * jnp.asarray(1e-8, x.dtype)).astype(x.dtype)
        r = jax.lax.fori_loop(0, 100, body, x)
        return jnp.sum(r.astype(jnp.float32))

    txt = loop.lower(q0).compile().as_text()
    import re
    kept = [l for l in txt.splitlines()
            if re.search(r"copy|custom-call|while|fusion", l)]
    print(f"HLO: {len(kept)} interesting lines of {len(txt.splitlines())}")
    for l in kept[:80]:
        print("   ", l[:240], flush=True)

if "C4" in SECTIONS:
    cache = KVCache.create(cfg, 1, 2048)
    lens = jnp.asarray([2000], jnp.int32)
    for blk in (256, 512):
        def t_flash(q, lens=lens, cache=cache, blk=blk):
            o = flash_decode_stacked(q, cache.k, cache.v, lens, jnp.int32(3),
                                     scale=0.1, blk=blk)
            return o, o.astype(q.dtype)
        try:
            t = bench_chained(t_flash, q0, iters=50, reps=3, overhead=ov)
            print(f"C4 flash S=2048 pos=2000 blk={blk}:      {t*1e6:7.1f} us",
                  flush=True)
        except Exception as e:  # blk=512 scratch may exceed VMEM
            print(f"C4 blk={blk} failed: {type(e).__name__}", flush=True)
