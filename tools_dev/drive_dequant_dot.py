"""TPU drive: dequant_dot grouped large-N path — correctness + timing.

Run from /root/repo:  python tools_dev/drive_dequant_dot.py
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

from tmac_tpu.ops import packing
from tmac_tpu.ops.qgemm import QuantizedTensor, qgemm_xla
from tmac_tpu.ops.pallas.qgemm_kernel import qgemm_pallas
from tmac_tpu.tools.timing import bench_chained, null_roundtrip
from tmac_tpu.utils import nmse

assert jax.devices()[0].platform == "tpu" or "lite" in str(jax.devices()[0]), jax.devices()

rng = np.random.default_rng(0)

# ---------------- correctness on hardware (small-ish shapes) --------------
SKIP_CORRECTNESS = os.environ.get("SKIP_CORRECTNESS", "0") == "1"
print("== correctness ==", flush=True)
for bits in () if SKIP_CORRECTNESS else (2, 3, 4):
    for zp in (False, True):
        K, M, gs, N = 1024, 512, 128, 128
        w = rng.standard_normal((K, M)).astype(np.float32)
        x = rng.standard_normal((N, K)).astype(np.float32)
        wq, s, sub = packing.quantize_weights(w, bits, gs, zp)
        wdq = packing.dequantize(wq, s, sub, gs)
        qt = QuantizedTensor.from_quantized(wq, s, sub, bits, gs)
        oracle = x @ wdq
        got = np.asarray(qgemm_pallas(jnp.asarray(x, jnp.bfloat16), qt,
                                      act="auto", out_dtype=jnp.float32))
        e = nmse(oracle, got)
        print(f"bits={bits} zp={zp} dequant_dot nmse={e:.2e}", flush=True)
        assert e < 5e-4, (bits, zp, e)

# fused prologue (norm) at large N
if not SKIP_CORRECTNESS:
    K, M, gs, N = 1024, 512, 128, 256
    w = rng.standard_normal((K, M)).astype(np.float32)
    wq, s, sub = packing.quantize_weights(w, 2, gs, True)
    wdq = packing.dequantize(wq, s, sub, gs)
    qt = QuantizedTensor.from_quantized(wq, s, sub, 2, gs)
    x = rng.standard_normal((N, K)).astype(np.float32)
    w_n = 1.0 + 0.1 * rng.standard_normal(K)
    eps = 1e-5
    got = np.asarray(qgemm_pallas(jnp.asarray(x, jnp.bfloat16), qt, act="fused",
                                  out_dtype=jnp.float32,
                                  norm=(jnp.asarray(w_n, jnp.bfloat16), eps)))
    var = np.mean(x ** 2, axis=1, keepdims=True)
    oracle = (x / np.sqrt(var + eps) * w_n) @ wdq
    e = nmse(oracle, got)
    print(f"fused norm large-N nmse={e:.2e}", flush=True)
    assert e < 5e-4

    gu = rng.standard_normal((N, 2 * K)).astype(np.float32)
    got = np.asarray(qgemm_pallas(jnp.asarray(gu, jnp.bfloat16), qt, act="fused",
                                  out_dtype=jnp.float32, glu=True))
    prod = gu[:, :K] / (1 + np.exp(-gu[:, :K])) * gu[:, K:]
    e = nmse(prod @ wdq, got)
    print(f"fused glu large-N nmse={e:.2e}", flush=True)
    assert e < 5e-4

# ---------------- timing at model shapes ----------------------------------
print("== timing ==", flush=True)
ov = null_roundtrip()
print(f"null roundtrip {ov*1e3:.1f} ms", flush=True)


def time_shape(tag, bits, N, K, M, gs, act, block_m=0):
    wq = rng.integers(0, (1 << bits), (K, M), dtype=np.int64).astype(np.uint8)
    G = K // gs
    s = (0.01 + 0.02 * rng.random((G, M))).astype(np.float32)
    sub = (s * rng.integers(0, (1 << bits), (G, M))).astype(np.float32)
    qt = QuantizedTensor.from_quantized(wq, s, sub, bits, gs,
                                        scale_dtype=jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)

    def step(x):
        o = qgemm_pallas(x, qt, act=act, out_dtype=jnp.float32,
                         block_m=block_m)
        fb = o[:, :K] if o.shape[1] >= K else \
            jnp.pad(o, ((0, 0), (0, K - o.shape[1])))
        return o, fb.astype(x.dtype)

    t = bench_chained(step, x0, iters=50, reps=3, overhead=ov)
    tops = 2 * N * K * M / t / 1e12
    print(f"{tag:40s} {t*1e6:8.1f} us  {tops:6.1f} T(fl)ops", flush=True)
    return t


def time_xla(tag, bits, N, K, M, gs):
    wq = rng.integers(0, (1 << bits), (K, M), dtype=np.int64).astype(np.uint8)
    G = K // gs
    s = (0.01 + 0.02 * rng.random((G, M))).astype(np.float32)
    sub = (s * rng.integers(0, (1 << bits), (G, M))).astype(np.float32)
    qt = QuantizedTensor.from_quantized(wq, s, sub, bits, gs,
                                        scale_dtype=jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)

    def step(x):
        o = qgemm_xla(x, qt, out_dtype=jnp.float32)
        fb = o[:, :K] if o.shape[1] >= K else \
            jnp.pad(o, ((0, 0), (0, K - o.shape[1])))
        return o, fb.astype(x.dtype)

    t = bench_chained(step, x0, iters=50, reps=3, overhead=ov)
    tops = 2 * N * K * M / t / 1e12
    print(f"{tag:40s} {t*1e6:8.1f} us  {tops:6.1f} T(fl)ops", flush=True)
    return t


for (bits, N, K, M, gs) in [
    (4, 256, 4096, 4096, 128),    # llama-2-7b W4 qkv-ish
    (4, 256, 4096, 11008, 128),   # llama-2-7b W4 gate/up (x2 fused -> 22016)
    (4, 256, 11008, 4096, 128),   # llama-2-7b W4 down
    (2, 256, 4096, 11008, 128),   # W2 gate/up
]:
    t_new = time_shape(f"dequant_dot b{bits} {N}x{K}x{M}", bits, N, K, M, gs,
                       act="auto")
    t_old = time_shape(f"chunk-loop(int8) b{bits} {N}x{K}x{M}", bits, N, K, M,
                       gs, act="int8")
    t_x = time_xla(f"xla b{bits} {N}x{K}x{M}", bits, N, K, M, gs)
    print(f"   -> speedup vs chunk {t_old/t_new:.2f}x, vs xla {t_x/t_new:.2f}x",
          flush=True)
