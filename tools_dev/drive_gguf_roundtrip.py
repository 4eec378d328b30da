"""Full-size gguf interchange round trip (VERDICT r3 item 8).

The llama-quantize role proven AT SCALE: init a full-size synthetic
checkpoint, export it to a llama.cpp gguf block type, re-convert the gguf
back into packed form, and gate the round-tripped model three ways:

  1. weight codec NMSE (orig dequant vs re-imported dequant, first+last
     layer of each matmul family);
  2. production-forward drift: prefill logits of the ORIGINAL packed
     params vs the ROUND-TRIPPED params (median per-position NMSE +
     greedy agreement);
  3. the parity oracle on the round-tripped params: production forward
     vs an independent f32 dense oracle of params2 (the same gate
     tools/parity.py runs, here on interchange-loaded weights).

Cases: bitnet-3b -> TQ2_0 (ternary grid exact; fp16 scale only) and
llama-2-7b W4 -> Q4_1 (affine blocks; gs=128 scales re-blocked to 32).
Reference role: tools/run_pipeline.py:164-175 (llama-quantize +
reconvert) -- at full model size, not unit-test shapes.
"""
import json
import os
import tempfile

import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import jax.numpy as jnp
import numpy as np

from tmac_tpu.convert import gguf
from tmac_tpu.convert.gguf_export import export_gguf
from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, forward, init_params
from tmac_tpu.tools import parity
from tmac_tpu.utils import nmse


def codec_nmse(params_h, params2_h, nl):
    """Orig vs re-imported dequant weights (host replicas, host dequant)."""
    out = {}
    for li in (0, nl - 1):
        for key in ("wqkv", "wo", "gate_up", "down"):
            a = parity.dense_weight(params_h["layers"][li][key])
            b = parity.dense_weight(params2_h["layers"][li][key])
            out[f"l{li}.{key}"] = float(nmse(a, b))
    return out


def forward_gate(cfg, params, params2, params2_h, T=24, seed=0):
    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, cfg.vocab_size, (1, T))
    lg = []
    for p in (params, params2):
        cache = KVCache.create(cfg, 1, T)
        logits, _ = forward(p, cfg, jnp.asarray(prompt), cache)
        lg.append(np.asarray(logits, np.float32))
    per_pos = [float(nmse(lg[0][0, t], lg[1][0, t])) for t in range(T)]
    agree = float(np.mean(np.argmax(lg[0][0], -1) == np.argmax(lg[1][0], -1)))
    # oracle gate on the round-tripped params (prod vs f32 dense oracle,
    # densified from the host-backend replica)
    dense2 = parity.dense_params(params2_h)
    want = parity.oracle_forward(dense2, cfg, prompt)
    oracle_pos = [float(nmse(want[0, t], lg[1][0, t])) for t in range(T)]
    return {
        "rt_nmse_median": float(np.median(per_pos)),
        "rt_nmse_max": float(max(per_pos)),
        "rt_greedy_agree": agree,
        "oracle_nmse_median": float(np.median(oracle_pos)),
        "oracle_nmse_max": float(max(oracle_pos)),
    }


def run_case(preset, quant_kw, tag):
    import jax

    cpu = jax.local_devices(backend="cpu")[0]
    cfg = get_preset(preset, **quant_kw)
    params = init_params(cfg, seed=0)
    # host-backend replicas for the oracle/codec checks: init_params
    # generates in numpy (byte-identical) and the gguf re-load reads a
    # file, so neither copy needs to round-trip the device tunnel
    with jax.default_device(cpu):
        params_h = init_params(cfg, seed=0)
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, f"{tag}.gguf")
        with jax.default_device(cpu):  # export dequantizes on host
            summary = export_gguf(out, cfg, params_h)
        size_mb = os.path.getsize(out) / 1e6
        cfg2, params2 = gguf.convert_gguf_model(out, name=f"{tag}-rt")
        with jax.default_device(cpu):
            _, params2_h = gguf.convert_gguf_model(out, name=f"{tag}-rt")
    row = {"case": tag, "wtype": summary["wtype"],
           "gguf_mb": round(size_mb, 1),
           "codec_nmse": codec_nmse(params_h, params2_h, cfg.num_layers)}
    row.update(forward_gate(cfg, params, params2, params2_h))
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = [
        run_case("bitnet-3b", {}, "bitnet-3b-tq2_0"),
        run_case("llama-2-7b", {"bits": 4}, "llama-2-7b-w4"),
    ]
    with open("gguf_roundtrip_r04.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote gguf_roundtrip_r04.json ({len(rows)} cases)")


if __name__ == "__main__":
    main()
