"""Round-3 phase-A hardware drive: native-exactness dispatch fix + engine
serving upgrade (streaming, per-request sampling, mid-chunk eos) on the
real TPU. Run from /root/repo: python tools_dev/drive_r3_verify_a.py"""
import time

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


log("devices:", jax.devices())

from tmac_tpu.ops.qgemm import QuantizedTensor, qgemm
from tmac_tpu.ops import packing
from tmac_tpu.utils import nmse

rng = np.random.default_rng(0)

# --- 1. act='native' large-N grouped: must NOT reroute to bf16 dequant ---
K, M, N, gs = 1024, 512, 128, 128
w = rng.standard_normal((K, M)).astype(np.float32)
x = rng.standard_normal((N, K)).astype(np.float32)
wq, s, sub = packing.quantize_weights(w, 2, gs, True)
oracle = x @ packing.dequantize(wq, s, sub, gs)
qt = QuantizedTensor.from_quantized(wq, s, sub, 2, gs)
log("native N=128 grouped compile+run ...")
out_nat = np.asarray(qgemm(jnp.asarray(x), qt, act="native"))
e_nat = nmse(oracle, out_nat)
log(f"native nmse = {e_nat:.3e}")
out_auto = np.asarray(qgemm(jnp.asarray(x), qt, act="auto"))
e_auto = nmse(oracle, out_auto)
log(f"auto   nmse = {e_auto:.3e} (bf16 dequant-dot expected ~1e-5..1e-6)")
assert e_nat < 2e-7, e_nat          # f32 scale folding, no bf16 weights
assert e_nat < e_auto / 3, (e_nat, e_auto)

# --- 2. engine on TPU: greedy equality + streaming + per-request sampling
from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import init_params
from tmac_tpu.runtime.engine import InferenceEngine
from tmac_tpu.runtime.generate import generate

cfg = get_preset("bitnet-3b").scaled(4)
params = jax.device_put(init_params(cfg, seed=0))
log("engine model built; single-stream reference ...")
ref = [int(t) for t in np.asarray(
    generate(params, cfg, np.asarray([[1, 2, 3]], np.int32),
             max_new_tokens=10))[0]]
log("ref:", ref)

events = []
eng = InferenceEngine(cfg, params, max_batch=2, max_len=640, decode_chunk=4,
                      stream_cb=lambda u, t, d: events.append((u, len(t), d)))
ug = eng.submit([1, 2, 3], max_new_tokens=10)
us = eng.submit([4, 5], max_new_tokens=10, temperature=0.9, top_k=20)
res = eng.run()
log("engine greedy:", res[ug])
assert res[ug] == ref, (res[ug], ref)
assert len(res[us]) == 10 and all(0 <= t < cfg.vocab_size for t in res[us])
g_events = [e for e in events if e[0] == ug]
assert len(g_events) >= 3 and g_events[-1][2] is True, g_events
assert [n for _, n, _ in g_events] == sorted(n for _, n, _ in g_events)
log(f"streaming events ok: {g_events}")

# --- 3. mid-chunk eos on device: pos freezes at the eos step ---
eos = ref[4]
eng2 = InferenceEngine(cfg, params, max_batch=2, max_len=640, decode_chunk=16)
u = eng2.submit([1, 2, 3], max_new_tokens=16, eos_id=eos)
res2 = eng2.run()
expect = ref[:ref.index(eos) + 1]
assert res2[u] == expect, (res2[u], expect)
pos0 = int(np.asarray(eng2.cache.pos)[0])
assert pos0 == 3 + len(expect) - 1, (pos0, expect)
log(f"mid-chunk eos ok: stopped at {len(expect)} tokens, pos={pos0}")

log("ALL PHASE-A HARDWARE CHECKS PASSED")
