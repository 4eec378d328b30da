"""TPU verify drive: round-2 batch A (dispatch, engine scheduler, ternary
gguf, b3 gptq).  Run from /root/repo."""
import os
import sys
import tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

from tmac_tpu.ops import packing
from tmac_tpu.ops.qgemm import QuantizedTensor
from tmac_tpu.ops.pallas.qgemm_kernel import qgemm_pallas
from tmac_tpu.utils import nmse

print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(0)

# 1. dispatch variants on hardware: fused grouped N=256 (model prefill call)
K, M, gs, N = 1024, 512, 128, 256
w = rng.standard_normal((K, M)).astype(np.float32)
wq, s, sub = packing.quantize_weights(w, 2, gs, True)
wdq = packing.dequantize(wq, s, sub, gs)
qt = QuantizedTensor.from_quantized(wq, s, sub, 2, gs)
x = rng.standard_normal((N, K)).astype(np.float32)
xb = jnp.asarray(x, jnp.bfloat16)
oracle = x @ wdq
for disp in ("chunk", "dequant", None):
    got = np.asarray(qgemm_pallas(xb, qt, act="fused", out_dtype=jnp.float32,
                                  dispatch=disp))
    e = nmse(oracle, got)
    print(f"fused dispatch={disp}: nmse={e:.2e}", flush=True)
    assert e < 5e-4, (disp, e)
# auto (non-fused) routing at N>=3gs -> dequant
got = np.asarray(qgemm_pallas(jnp.asarray(x[:128], jnp.bfloat16),
                              QuantizedTensor.from_quantized(wq, s, sub, 2, 32)
                              if False else qt,
                              act="auto", out_dtype=jnp.float32))
assert nmse(oracle[:128], got) < 5e-4
print("auto routing ok", flush=True)

# 2. engine scheduler on TPU: greedy equality + interleaved admission
from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import init_params
from tmac_tpu.runtime.engine import InferenceEngine
from tmac_tpu.runtime.generate import generate

cfg = get_preset("bitnet-3b").scaled(12)
params = init_params(cfg, seed=0)
eng = InferenceEngine(cfg, params, max_batch=2, max_len=640,
                      decode_chunk=8, prefill_chunk=32)
ua = eng.submit([1, 2, 3], max_new_tokens=24)
long_prompt = [int(t) for t in rng.integers(1, cfg.vocab_size, 100)]
ub = eng.submit(long_prompt, max_new_tokens=8)
res = eng.run()
ref_a = generate(params, cfg, np.asarray([[1, 2, 3]], np.int32),
                 max_new_tokens=24)
ref_b = generate(params, cfg, np.asarray([long_prompt], np.int32),
                 max_new_tokens=8)
assert res[ua] == [int(t) for t in np.asarray(ref_a)[0]], "A diverged"
assert res[ub] == [int(t) for t in np.asarray(ref_b)[0]], "B diverged"
print("engine interleaved-scheduler greedy equality ok", flush=True)

# 3. ternary gguf -> convert -> forward on TPU
from tmac_tpu.convert import gguf
from tmac_tpu.models.llama import KVCache, forward

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tests"))
from test_gguf import _write_tiny_llama_gguf

with tempfile.TemporaryDirectory() as td:
    p = os.path.join(td, "m.gguf")
    cfg0 = get_preset("bitnet-3b").scaled(12)
    ref_w = _write_tiny_llama_gguf(p, cfg0, np.random.default_rng(5),
                                   wtype=gguf.GGML_TQ1_0)
    mcfg, mparams = gguf.convert_gguf_model(p, name="tq1-drive")
    assert mcfg.quant.mode == "w_a8"
    cache = KVCache.create(mcfg, 1, 16)
    logits, _ = forward(mparams, mcfg, jnp.asarray([[1, 2, 3]]), cache)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
    print("tq1_0 gguf convert -> TPU forward ok", flush=True)

# 4. b3 gptq -> kernel on TPU
from tmac_tpu.convert.gptq import quantize_gptq_like, unpack_gptq
w3 = (rng.standard_normal((512, 512)) / 22.6).astype(np.float32)
qw3, sc3, qz3 = quantize_gptq_like(w3, 3, 128)
wq3, s3, sub3, b3, g3 = unpack_gptq(qw3, sc3, qz3, gptq_v2=True)
assert b3 == 3
qt3 = QuantizedTensor.from_quantized(wq3, s3, sub3, 3, g3)
x3 = jnp.asarray(rng.standard_normal((2, 512)), jnp.bfloat16)
got3 = np.asarray(qgemm_pallas(x3, qt3, act="int8", out_dtype=jnp.float32))
o3 = np.asarray(x3, np.float32) @ packing.dequantize(wq3, s3, sub3, g3)
e3 = nmse(o3, got3)
print(f"b3 gptq -> pallas nmse={e3:.2e}", flush=True)
assert e3 < 5e-4
print("ALL DRIVE CHECKS PASSED", flush=True)
