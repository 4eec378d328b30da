"""Converter tests: GPTQ unpack semantics, BitNet ternarization, synthetic
HF checkpoint conversion, packed checkpoint save/load roundtrip."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from tmac_tpu.convert import checkpoint as ckpt
from tmac_tpu.convert.bitnet import is_ternary, quantize_bitnet
from tmac_tpu.convert.gptq import parse_gptq, quantize_gptq_like, unpack_gptq
from tmac_tpu.convert.hf import convert_hf_model
from tmac_tpu.models.config import QuantConfig, get_preset
from tmac_tpu.models.llama import KVCache, forward, init_params
from tmac_tpu.ops.packing import dequantize
from tmac_tpu.ops.qgemm import QuantizedTensor, qgemm_xla
from tmac_tpu.utils import nmse


@pytest.mark.parametrize("bits", [2, 3, 4])
def test_gptq_roundtrip(bits):
    rng = np.random.default_rng(0)
    K, M, gs = 256, 128, 64
    w = rng.standard_normal((K, M)).astype(np.float32)
    qweight, scales, qzeros = quantize_gptq_like(w, bits, gs)
    assert parse_gptq(qweight, scales, qzeros) == (K, M, bits, gs)
    wq, s, sub, b, g = unpack_gptq(qweight, scales, qzeros, gptq_v2=True)
    assert (b, g) == (bits, gs)
    wdq = dequantize(wq, s, sub, gs)
    # affine quant error <= half step
    step = np.repeat(s, gs, axis=0)
    assert np.abs(wdq - w).max() <= 0.5 * step.max() + 1e-3


def test_gptq_v1_zeros_quirk():
    """AutoGPTQ v1 stores z-1; unpack with gptq_v2=False must add it back."""
    rng = np.random.default_rng(1)
    K, M, gs, bits = 128, 64, 64, 4
    w = rng.standard_normal((K, M)).astype(np.float32)
    qweight, scales, qzeros = quantize_gptq_like(w, bits, gs)
    # simulate a v1 checkpoint: stored_zeros = z - 1
    z = ((qzeros.view(np.uint32).astype(np.int64)))
    unpacked = np.stack([(z >> (4 * j)) & 15 for j in range(8)], -1) - 1
    z1 = np.zeros_like(z)
    for j in range(8):
        z1 |= (unpacked[..., j] & 15) << (4 * j)
    qzeros_v1 = z1.astype(np.uint32).view(np.int32)
    wq2, s2, sub2, _, _ = unpack_gptq(qweight, scales, qzeros_v1, gptq_v2=False)
    wq1, s1, sub1, _, _ = unpack_gptq(qweight, scales, qzeros, gptq_v2=True)
    np.testing.assert_allclose(sub1, sub2, rtol=1e-6)
    np.testing.assert_array_equal(wq1, wq2)


def test_bitnet_quantize():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((256, 128)).astype(np.float32)
    wq, scales, sub = quantize_bitnet(w)
    assert set(np.unique(wq)) <= {1, 2, 3}  # ternary {-1,0,1} + mid 2
    wdq = scales[0] * wq.astype(np.float32) - sub[0]
    assert is_ternary(wdq)
    # absmean recipe: scale == mean |w|
    np.testing.assert_allclose(scales[0, 0], np.abs(w).mean(), rtol=1e-5)


def _write_synthetic_hf_gptq(tmpdir, cfg, bits, gs, seed=0):
    """Tiny llama-architecture GPTQ checkpoint in HF format."""
    rng = np.random.default_rng(seed)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    tensors, ref = {}, {}

    def fp(name, shape, scale=0.02):
        t = (rng.standard_normal(shape) * scale).astype(np.float32)
        tensors[name] = t.astype(np.float16)
        return t

    def gptq(name, K, M):
        w = (rng.standard_normal((K, M)) / np.sqrt(K)).astype(np.float32)
        qw, sc, qz = quantize_gptq_like(w, bits, gs)
        tensors[f"{name}.qweight"] = qw
        tensors[f"{name}.scales"] = sc
        tensors[f"{name}.qzeros"] = qz
        ref[name] = w

    fp("model.embed_tokens.weight", (V, H))
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        fp(f"{p}.input_layernorm.weight", (H,), 1.0)
        fp(f"{p}.post_attention_layernorm.weight", (H,), 1.0)
        gptq(f"{p}.self_attn.q_proj", H, cfg.q_dim)
        gptq(f"{p}.self_attn.k_proj", H, cfg.kv_dim)
        gptq(f"{p}.self_attn.v_proj", H, cfg.kv_dim)
        gptq(f"{p}.self_attn.o_proj", cfg.q_dim, H)
        gptq(f"{p}.mlp.gate_proj", H, I)
        gptq(f"{p}.mlp.up_proj", H, I)
        gptq(f"{p}.mlp.down_proj", I, H)
    fp("model.norm.weight", (H,), 1.0)
    fp("lm_head.weight", (V, H))

    save_file(tensors, os.path.join(tmpdir, "model.safetensors"))
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump({
            "model_type": "llama",
            "vocab_size": V, "hidden_size": H, "intermediate_size": I,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "head_dim": cfg.head_dim,
            "rope_theta": cfg.rope_theta, "rms_norm_eps": cfg.rms_norm_eps,
            "tie_word_embeddings": False,
            "quantization_config": {
                "bits": bits, "group_size": gs, "sym": False,
                "desc_act": False, "checkpoint_format": "gptq_v2",
                "quant_method": "gptq",
            },
        }, f)
    return ref


def test_convert_hf_gptq_end_to_end(tmp_path):
    cfg0 = get_preset("llama-2-7b").scaled(8)
    ref = _write_synthetic_hf_gptq(str(tmp_path), cfg0, bits=2, gs=128)
    cfg, params = convert_hf_model(str(tmp_path), name="tiny-test")
    assert cfg.quant.bits == 2 and cfg.quant.zero_point

    # converted weights: qgemm must match the dequant oracle exactly, and
    # stay within the inherent 2-bit quantization error of the original
    from tmac_tpu.convert.hf import HFReader, _qt_from_hf_linear
    reader = HFReader(str(tmp_path))
    qt_q = _qt_from_hf_linear(reader, "model.layers.0.self_attn.q_proj",
                              cfg.quant, True, 1, 1)
    w = ref["model.layers.0.self_attn.q_proj"]
    wdq = dequantize(np.asarray(qt_q.unpack()),
                     np.asarray(qt_q.scales)[:, :qt_q.mdim],
                     np.asarray(qt_q.sub)[:, :qt_q.mdim], qt_q.group_size)
    x = np.random.default_rng(3).standard_normal((2, cfg.hidden_size)).astype(np.float32)
    got = np.asarray(qgemm_xla(jnp.asarray(x), qt_q, out_dtype=jnp.float32))
    assert nmse(x @ wdq, got) < 1e-10          # exact vs dequant oracle
    assert nmse(x @ w, got) < 0.5              # 2-bit quant noise bound

    # the fused wqkv tensor's q slice must equal the standalone conversion
    fused = params["layers"][0]["wqkv"]
    got_fused = np.asarray(qgemm_xla(jnp.asarray(x), fused,
                                     out_dtype=jnp.float32))[:, :cfg.q_dim]
    assert nmse(got, got_fused) < 1e-10

    # and the full model must run
    cache = KVCache.create(cfg, 1, 8)
    logits, _ = forward(params, cfg, jnp.asarray([[1, 2, 3]]), cache, impl="xla")
    assert np.isfinite(np.asarray(logits, dtype=np.float32)).all()


def test_gptq_b3_codes_exact():
    """The 3-bit straddle layout (AutoGPTQ pack: 32 codes / 3 words with
    codes 10 and 21 split across word boundaries) round-trips every code
    exactly, for weights and for zeros."""
    rng = np.random.default_rng(6)
    K, M, gs = 96, 64, 32
    from tmac_tpu.convert.gptq import _unpack_int32_fields
    codes = rng.integers(0, 8, (K, M)).astype(np.int64)
    # force every group to span [0, 7] so scale == 1 (fp16-exact) and
    # zero == 0: the packed codes are then exactly `codes`
    codes[::gs, :] = 0
    codes[1::gs, :] = 7
    w = codes.astype(np.float32)
    qweight, scales, qzeros = quantize_gptq_like(w, 3, gs)
    np.testing.assert_array_equal(scales.astype(np.float32), 1.0)
    wq, s, sub, b, g = unpack_gptq(qweight, scales, qzeros, gptq_v2=True)
    assert b == 3 and g == gs
    # raw field extraction is bit-exact
    np.testing.assert_array_equal(wq.astype(np.int64), codes)
    np.testing.assert_array_equal(sub, 0.0)
    np.testing.assert_array_equal(dequantize(wq, s, sub, gs), w)


def test_convert_hf_gptq_b3_end_to_end(tmp_path):
    """bits=3 HF GPTQ checkpoint -> packed b3 kernel tensors -> model runs
    (reference compiles bits=3 e2e, python/t_mac/ops/qgemm.py:99-100)."""
    cfg0 = get_preset("llama-2-7b").scaled(8)
    ref = _write_synthetic_hf_gptq(str(tmp_path), cfg0, bits=3, gs=128)
    cfg, params = convert_hf_model(str(tmp_path), name="tiny-b3")
    assert cfg.quant.bits == 3
    qt = params["layers"][0]["wqkv"]
    assert qt.bits == 3 and qt.packed_hi is not None

    x = np.random.default_rng(7).standard_normal(
        (2, cfg.hidden_size)).astype(np.float32)
    w = ref["model.layers.0.self_attn.q_proj"]
    got = np.asarray(qgemm_xla(jnp.asarray(x), qt,
                               out_dtype=jnp.float32))[:, :cfg.q_dim]
    assert nmse(x @ w, got) < 5e-2  # 3-bit quant noise bound

    cache = KVCache.create(cfg, 1, 8)
    logits, _ = forward(params, cfg, jnp.asarray([[1, 2, 3]]), cache, impl="xla")
    assert np.isfinite(np.asarray(logits, dtype=np.float32)).all()


def _write_synthetic_hf_moe(tmpdir, bits=2, gs=64, E=4, seed=0):
    """Tiny Mixtral-architecture GPTQ checkpoint (block_sparse_moe naming:
    router `gate`, experts w1/w3/w2) in HF format."""
    rng = np.random.default_rng(seed)
    H, Ie, V, L = 128, 128, 512, 2
    tensors, ref = {}, {}

    def fp(name, shape, scale=0.02):
        t = (rng.standard_normal(shape) * scale).astype(np.float32)
        tensors[name] = t.astype(np.float16)
        return t

    def gptq(name, K, M):
        w = (rng.standard_normal((K, M)) / np.sqrt(K)).astype(np.float32)
        qw, sc, qz = quantize_gptq_like(w, bits, gs)
        tensors[f"{name}.qweight"] = qw
        tensors[f"{name}.scales"] = sc
        tensors[f"{name}.qzeros"] = qz
        ref[name] = w

    fp("model.embed_tokens.weight", (V, H))
    for i in range(L):
        p = f"model.layers.{i}"
        fp(f"{p}.input_layernorm.weight", (H,), 1.0)
        fp(f"{p}.post_attention_layernorm.weight", (H,), 1.0)
        gptq(f"{p}.self_attn.q_proj", H, 256)
        gptq(f"{p}.self_attn.k_proj", H, 256)
        gptq(f"{p}.self_attn.v_proj", H, 256)
        gptq(f"{p}.self_attn.o_proj", 256, H)
        fp(f"{p}.block_sparse_moe.gate.weight", (E, H))
        for e in range(E):
            ep = f"{p}.block_sparse_moe.experts.{e}"
            gptq(f"{ep}.w1", H, Ie)
            gptq(f"{ep}.w3", H, Ie)
            gptq(f"{ep}.w2", Ie, H)
    fp("model.norm.weight", (H,), 1.0)
    fp("lm_head.weight", (V, H))

    save_file(tensors, os.path.join(tmpdir, "model.safetensors"))
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump({
            "model_type": "mixtral",
            "vocab_size": V, "hidden_size": H, "intermediate_size": Ie,
            "num_hidden_layers": L, "num_attention_heads": 2,
            "num_key_value_heads": 2, "head_dim": 128,
            "rope_theta": 1e6, "rms_norm_eps": 1e-5,
            "num_local_experts": E, "num_experts_per_tok": 2,
            "tie_word_embeddings": False,
            "quantization_config": {
                "bits": bits, "group_size": gs, "sym": False,
                "desc_act": False, "checkpoint_format": "gptq_v2",
                "quant_method": "gptq",
            },
        }, f)
    return ref


def test_convert_hf_moe_end_to_end(tmp_path):
    """Mixtral-style MoE GPTQ checkpoint -> stacked expert tensors -> the
    model runs and expert 1's FFN matmul matches the original weights to
    quantization noise."""
    ref = _write_synthetic_hf_moe(str(tmp_path), bits=2, gs=64, E=4)
    cfg, params = convert_hf_model(str(tmp_path), name="tiny-moe")
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    assert cfg.moe_intermediate_size == 128

    layer = params["layers"][0]
    assert layer["moe_router"].shape == (cfg.hidden_size, 4)
    from tmac_tpu.models.moe import expert_view, num_local_experts
    assert num_local_experts(layer["experts_gate_up"]) == 4

    # expert 1 gate matmul vs the original fp weights (quant-noise bound)
    x = np.random.default_rng(3).standard_normal(
        (2, cfg.hidden_size)).astype(np.float32)
    qt = expert_view(layer["experts_gate_up"], 1)
    got = np.asarray(qgemm_xla(jnp.asarray(x), qt, out_dtype=jnp.float32))
    w1 = ref["model.layers.0.block_sparse_moe.experts.1.w1"]
    w3 = ref["model.layers.0.block_sparse_moe.experts.1.w3"]
    assert nmse(x @ w1, got[:, :128]) < 0.5
    assert nmse(x @ w3, got[:, 128:256]) < 0.5

    # checkpoint roundtrip preserves the stacked tensors and the forward
    ckpt.save_checkpoint(str(tmp_path / "ck"), cfg, params)
    cfg2, params2 = ckpt.load_checkpoint(str(tmp_path / "ck"))
    toks = jnp.asarray([[1, 2, 3]])
    l1, _ = forward(params, cfg, toks, KVCache.create(cfg, 1, 8), impl="xla")
    l2, _ = forward(params2, cfg2, toks, KVCache.create(cfg2, 1, 8),
                    impl="xla")
    assert np.isfinite(np.asarray(l1, np.float32)).all()
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_convert_hf_qwen2moe_end_to_end(tmp_path):
    """Qwen2-MoE-style checkpoint: mlp.experts.{e} naming, an always-on
    sigmoid-gated shared expert, norm_topk_prob=False routing, qkv bias.
    Converts, round-trips, and the shared-expert weights land."""
    rng = np.random.default_rng(14)
    H, Ie, Is, V, L, E = 128, 128, 128, 512, 2, 4
    tensors = {}

    def fp(name, shape, scale=0.02):
        t = (rng.standard_normal(shape) * scale).astype(np.float32)
        tensors[name] = t.astype(np.float16)
        return t

    def gptq(name, K, M):
        w = (rng.standard_normal((K, M)) / np.sqrt(K)).astype(np.float32)
        qw, sc, qz = quantize_gptq_like(w, 2, 64)
        tensors[f"{name}.qweight"] = qw
        tensors[f"{name}.scales"] = sc
        tensors[f"{name}.qzeros"] = qz
        return w

    fp("model.embed_tokens.weight", (V, H))
    shared_ref = {}
    for i in range(L):
        p = f"model.layers.{i}"
        fp(f"{p}.input_layernorm.weight", (H,), 1.0)
        fp(f"{p}.post_attention_layernorm.weight", (H,), 1.0)
        for n, shp in (("q_proj", (256, H)), ("k_proj", (256, H)),
                       ("v_proj", (256, H)), ("o_proj", (H, 256))):
            gptq(f"{p}.self_attn.{n}", shp[1], shp[0])
        for n in ("q_proj", "k_proj", "v_proj"):
            fp(f"{p}.self_attn.{n}.bias", (256,))
        fp(f"{p}.mlp.gate.weight", (E, H))
        for e in range(E):
            ep = f"{p}.mlp.experts.{e}"
            gptq(f"{ep}.gate_proj", H, Ie)
            gptq(f"{ep}.up_proj", H, Ie)
            gptq(f"{ep}.down_proj", Ie, H)
        se = f"{p}.mlp.shared_expert"
        shared_ref[i] = gptq(f"{se}.gate_proj", H, Is)
        gptq(f"{se}.up_proj", H, Is)
        gptq(f"{se}.down_proj", Is, H)
        fp(f"{p}.mlp.shared_expert_gate.weight", (1, H))
    fp("model.norm.weight", (H,), 1.0)
    fp("lm_head.weight", (V, H))

    save_file(tensors, os.path.join(str(tmp_path), "model.safetensors"))
    with open(os.path.join(str(tmp_path), "config.json"), "w") as f:
        json.dump({
            "model_type": "qwen2_moe",
            "vocab_size": V, "hidden_size": H, "intermediate_size": Ie,
            "num_hidden_layers": L, "num_attention_heads": 2,
            "num_key_value_heads": 2, "head_dim": 128,
            "rope_theta": 1e6, "rms_norm_eps": 1e-6,
            "num_experts": E, "num_experts_per_tok": 2,
            "moe_intermediate_size": Ie,
            "shared_expert_intermediate_size": Is,
            "norm_topk_prob": False,
            "tie_word_embeddings": False,
            "quantization_config": {
                "bits": 2, "group_size": 64, "sym": False,
                "desc_act": False, "checkpoint_format": "gptq_v2",
                "quant_method": "gptq",
            },
        }, f)

    cfg, params = convert_hf_model(str(tmp_path), name="tiny-qwen2moe")
    assert cfg.num_experts == E and not cfg.moe_norm_topk
    assert cfg.moe_shared_intermediate_size == Is and cfg.moe_shared_gate
    assert cfg.attention_bias
    layer = params["layers"][0]
    assert "shared_gate_up" in layer and "shared_gate" in layer
    assert layer["shared_gate"].shape == (cfg.hidden_size,)

    # shared gate_proj slice matches the original to 2-bit quant noise
    x = np.random.default_rng(15).standard_normal((2, H)).astype(np.float32)
    got = np.asarray(qgemm_xla(jnp.asarray(x), layer["shared_gate_up"],
                               out_dtype=jnp.float32))
    assert nmse(x @ shared_ref[0], got[:, :Is]) < 0.5

    # model runs + checkpoint round-trip
    cache = KVCache.create(cfg, 1, 8)
    l1, _ = forward(params, cfg, jnp.asarray([[1, 2, 3]]), cache, impl="xla")
    assert np.isfinite(np.asarray(l1, np.float32)).all()
    ckpt.save_checkpoint(str(tmp_path / "ck"), cfg, params)
    cfg2, params2 = ckpt.load_checkpoint(str(tmp_path / "ck"))
    assert cfg2 == cfg
    l2, _ = forward(params2, cfg2, jnp.asarray([[1, 2, 3]]),
                    KVCache.create(cfg2, 1, 8), impl="xla")
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_checkpoint_roundtrip(tmp_path):
    cfg = get_preset("bitnet-3b").scaled(8)
    params = init_params(cfg, seed=0)
    ckpt.save_checkpoint(str(tmp_path / "ck"), cfg, params)
    cfg2, params2 = ckpt.load_checkpoint(str(tmp_path / "ck"))
    assert cfg2 == cfg

    cache = KVCache.create(cfg, 1, 8)
    toks = jnp.asarray([[1, 2, 3]])
    l1, _ = forward(params, cfg, toks, KVCache.create(cfg, 1, 8), impl="xla")
    l2, _ = forward(params2, cfg2, toks, KVCache.create(cfg, 1, 8), impl="xla")
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def _write_synthetic_hf_awq(tmpdir, cfg, gs, seed=0):
    """Tiny llama-architecture AWQ ('gemm') checkpoint in HF format."""
    from tmac_tpu.convert.gptq import quantize_awq_like
    rng = np.random.default_rng(seed)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    tensors, ref = {}, {}

    def fp(name, shape, scale=0.02):
        t = (rng.standard_normal(shape) * scale).astype(np.float32)
        tensors[name] = t.astype(np.float16)
        return t

    def awq(name, K, M):
        w = (rng.standard_normal((K, M)) / np.sqrt(K)).astype(np.float32)
        qw, sc, qz = quantize_awq_like(w, gs)
        tensors[f"{name}.qweight"] = qw
        tensors[f"{name}.scales"] = sc
        tensors[f"{name}.qzeros"] = qz
        ref[name] = w

    fp("model.embed_tokens.weight", (V, H))
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        fp(f"{p}.input_layernorm.weight", (H,), 1.0)
        fp(f"{p}.post_attention_layernorm.weight", (H,), 1.0)
        awq(f"{p}.self_attn.q_proj", H, cfg.q_dim)
        awq(f"{p}.self_attn.k_proj", H, cfg.kv_dim)
        awq(f"{p}.self_attn.v_proj", H, cfg.kv_dim)
        awq(f"{p}.self_attn.o_proj", cfg.q_dim, H)
        awq(f"{p}.mlp.gate_proj", H, I)
        awq(f"{p}.mlp.up_proj", H, I)
        awq(f"{p}.mlp.down_proj", I, H)
    fp("model.norm.weight", (H,), 1.0)
    fp("lm_head.weight", (V, H))

    save_file(tensors, os.path.join(tmpdir, "model.safetensors"))
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump({
            "model_type": "llama",
            "vocab_size": V, "hidden_size": H, "intermediate_size": I,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "head_dim": cfg.head_dim,
            "rope_theta": cfg.rope_theta, "rms_norm_eps": cfg.rms_norm_eps,
            "tie_word_embeddings": False,
            "quantization_config": {
                "quant_method": "awq", "w_bit": 4, "q_group_size": gs,
                "zero_point": True, "version": "gemm",
            },
        }, f)
    return ref


def test_awq_unpack_matches_dequant_contract():
    """unpack_awq: the AWQ interleave reverses exactly; dequant through
    the framework contract reproduces the original within 4-bit noise."""
    from tmac_tpu.convert.gptq import quantize_awq_like, unpack_awq
    rng = np.random.default_rng(7)
    K, M, gs = 256, 96 * 8 // 8 * 8, 64
    w = rng.standard_normal((K, 96 * 8)).astype(np.float32) / np.sqrt(K)
    qw, sc, qz = quantize_awq_like(w, gs)
    wq, scales, sub, bits, g = unpack_awq(qw, sc, qz)
    assert (bits, g) == (4, gs)
    wdq = np.repeat(scales, gs, 0) * wq - np.repeat(sub, gs, 0)
    assert nmse(w, wdq) < 2e-2


def test_convert_hf_awq_end_to_end(tmp_path):
    """AWQ checkpoint -> packed params; forward-path linears match the
    float originals within 4-bit noise (the AutoAWQ role; net-new vs the
    reference's GPTQ-only converter, model_utils.py:104-129)."""
    cfg0 = get_preset("llama-2-7b").scaled(8)
    ref = _write_synthetic_hf_awq(str(tmp_path), cfg0, gs=64)
    cfg, params = convert_hf_model(str(tmp_path), name="tiny-awq")
    assert cfg.quant.bits == 4 and cfg.quant.group_size == 64
    assert cfg.quant.zero_point

    layer = params["layers"][0]
    x = np.random.default_rng(9).standard_normal(
        (2, cfg.hidden_size)).astype(np.float32)
    got = np.asarray(qgemm_xla(jnp.asarray(x), layer["wo"],
                               out_dtype=jnp.float32))
    want = x @ ref["model.layers.0.self_attn.o_proj"]
    assert nmse(want, got) < 2e-2

    from tmac_tpu.runtime.generate import generate
    out = np.asarray(generate(params, cfg,
                              np.asarray([[1, 2, 3]], np.int32),
                              max_new_tokens=4))
    assert out.shape == (1, 4)
