"""GGUF reader/writer: Q4_0 parsing, lossless mapping onto the packed
layout, and full-model conversion of a synthetic gguf."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.convert import gguf
from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, forward
from tmac_tpu.ops.qgemm import QuantizedTensor, qgemm_xla
from tmac_tpu.utils import nmse


def test_q4_0_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    M, K = 64, 128
    w = rng.standard_normal((M, K)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, {"general.architecture": "llama"},
                    {"w": (gguf.GGML_Q4_0, w)})
    r = gguf.GGUFReader(path)
    assert r.metadata["general.architecture"] == "llama"
    assert r.tensors["w"]["dims"] == [K, M]  # ne0 = cols

    # dequantized must equal the Q4_0 quantization of w (within block model)
    wdq = r.dequantized("w")
    assert wdq.shape == (M, K)
    # block-level check: every block's error bounded by its step size
    blocks = w.reshape(-1, 32)
    dq = wdq.reshape(-1, 32)
    amax = np.abs(blocks).max(1)
    assert (np.abs(dq - blocks) <= amax[:, None] / 8 + 1e-6).all()

    # exact mapping onto the framework layout: dequant(wq, scales, sub)
    # == reader.dequantized
    wq, scales, sub = r.q4_0_to_quantized("w")
    assert wq.shape == (K, M) and scales.shape == (K // 32, M)
    from tmac_tpu.ops.packing import dequantize
    np.testing.assert_allclose(dequantize(wq, scales, sub, 32), wdq.T,
                               rtol=1e-6, atol=1e-6)
    r.close()


def test_f16_f32_tensors(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.standard_normal((8, 16)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, {}, {"a32": (gguf.GGML_F32, a),
                               "a16": (gguf.GGML_F16, a)})
    r = gguf.GGUFReader(path)
    np.testing.assert_array_equal(r.dequantized("a32"), a)
    np.testing.assert_allclose(r.dequantized("a16"), a, rtol=1e-3, atol=1e-3)
    r.close()


@pytest.mark.parametrize("ttype", [gguf.GGML_TQ1_0, gguf.GGML_TQ2_0,
                                   gguf.GGML_I2_S])
def test_ternary_roundtrip(ttype, tmp_path):
    """BitNet ternary types (reference run_pipeline.py:375 lists
    i2/tq1_0/tq2_0): write -> read -> exact trit + scale recovery."""
    rng = np.random.default_rng(3)
    M, K = 32, 512
    s = 0.037
    trits = rng.integers(-1, 2, (M, K)).astype(np.float32)
    w = trits * s
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, {}, {"w": (ttype, w)})
    r = gguf.GGUFReader(path)
    wdq = r.dequantized("w")
    # trits recovered exactly; scale within fp16 (f32 for i2_s)
    np.testing.assert_array_equal(np.sign(wdq), np.sign(w))
    tol = 1e-6 if ttype == gguf.GGML_I2_S else 1e-3
    np.testing.assert_allclose(wdq, w, rtol=tol, atol=tol * s)

    # mapping onto the kernel layout: per-tensor scale (uniform blocks)
    wq, scales, sub, gs, per_tensor = r.ternary_to_quantized("w")
    assert per_tensor and gs == K
    assert wq.shape == (K, M) and scales.shape == (1, M)
    from tmac_tpu.ops.packing import dequantize
    wdq2 = scales.repeat(K // gs if gs < K else 1, 0)
    np.testing.assert_allclose(
        dequantize(wq, scales, sub, gs), wdq.T, rtol=2e-3, atol=2e-3 * s)
    r.close()


def test_tq1_0_all_trit_bytes_roundtrip():
    """Every 5-trit combination survives the base-3 fixed-point byte
    encoding (the subtle part of TQ1_0)."""
    import itertools
    combos = np.array(list(itertools.product([-1, 0, 1], repeat=5)),
                      np.float32)  # (243, 5)
    # lay each combo along the stride-32 element pattern of one block
    w = np.zeros((243, 256), np.float32)
    for n in range(5):
        w[:, 32 * n] = combos[:, n]
    w[:, 1] = 1.0  # ensure every block's amax is 1
    raw = np.frombuffer(gguf._pack_tq1_0(w), np.uint8).reshape(-1, 54)
    trits, d = gguf.GGUFReader._tq1_0_fields(raw.reshape(-1))
    got = np.stack([trits[:, 32 * n] for n in range(5)], 1).astype(np.int32) - 1
    np.testing.assert_array_equal(got, combos.astype(np.int32))
    np.testing.assert_array_equal(d, np.ones(243, np.float16))


def test_ternary_nonuniform_blocks_grouped():
    """TQ2_0 with genuinely different per-block scales maps onto grouped
    (gs=256) scales."""
    rng = np.random.default_rng(4)
    M, K = 8, 512
    w = rng.integers(-1, 2, (M, K)).astype(np.float32)
    w[:, :256] *= 0.5  # first block scale differs
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t.gguf")
        gguf.write_gguf(path, {}, {"w": (gguf.GGML_TQ2_0, w)})
        r = gguf.GGUFReader(path)
        wq, scales, sub, gs, per_tensor = r.ternary_to_quantized("w")
        assert not per_tensor and gs == 256 and scales.shape == (2, M)
        from tmac_tpu.ops.packing import dequantize
        np.testing.assert_allclose(dequantize(wq, scales, sub, gs), w.T,
                                   rtol=1e-3, atol=1e-3)
        r.close()


@pytest.mark.parametrize("ttype,bound", [
    (gguf.GGML_Q4_K, 8e-3), (gguf.GGML_Q5_K, 2e-3), (gguf.GGML_Q6_K, 5e-4),
    (gguf.GGML_Q5_0, 3e-3), (gguf.GGML_Q5_1, 2e-3),
    (gguf.GGML_Q4_1, 8e-3), (gguf.GGML_Q2_K, 0.12), (gguf.GGML_Q3_K, 5e-2)])
def test_kquant_roundtrip(ttype, bound, tmp_path):
    """K-quant super-block types (llama.cpp's default output.weight /
    Q4_K_M mixes; VERDICT gap #4): write -> read -> dequant within the
    block model's quantization noise."""
    rng = np.random.default_rng(6)
    M, K = 16, 512
    w = rng.standard_normal((M, K)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, {}, {"w": (ttype, w)})
    r = gguf.GGUFReader(path)
    assert r.tensors["w"]["type"] == ttype
    wdq = r.dequantized("w")
    assert wdq.shape == (M, K)
    e = nmse(w, wdq)
    assert e < bound, e
    r.close()


def test_q8_0_exact_mapping(tmp_path):
    """Q8_0 matmul weights map losslessly onto the bits=8 int8-MXU path
    (w = d*q; biased codes + sub = 128*d), not the 4-bit requantize
    fallback."""
    rng = np.random.default_rng(17)
    M, K = 32, 256
    w = rng.standard_normal((M, K)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, {}, {"w": (gguf.GGML_Q8_0, w)})
    r = gguf.GGUFReader(path)
    wdq = r.dequantized("w")
    assert nmse(w, wdq) < 5e-5  # 8-bit quantization noise only
    wq, scales, sub = r.q8_0_to_quantized("w")
    assert wq.shape == (K, M) and wq.dtype == np.uint8
    from tmac_tpu.ops.packing import dequantize
    np.testing.assert_allclose(dequantize(wq, scales, sub, 32), wdq.T,
                               rtol=1e-6, atol=1e-6)
    # and through QuantizedTensor at bits=8
    from tmac_tpu.ops.qgemm import QuantizedTensor, qgemm_xla
    qt = QuantizedTensor.from_quantized(wq, scales, sub, bits=8,
                                        group_size=32,
                                        scale_dtype=jnp.float32)
    x = rng.standard_normal((2, K)).astype(np.float32)
    got = np.asarray(qgemm_xla(jnp.asarray(x), qt))
    np.testing.assert_allclose(got, x @ wdq.T, rtol=2e-2, atol=2e-2)
    r.close()


def test_convert_gguf_mixed_bits_fuse(tmp_path):
    """A Q8_0 attn_v beside Q4_0 attn_q/attn_k: fuse_m needs one
    bit-width, so the fused QKV re-quantizes uniformly and the model still
    converts and runs; the standalone Q8_0 ffn_down stays exact bits=8."""
    cfg0 = get_preset("llama-2-7b").scaled(8)
    rng = np.random.default_rng(21)
    path = str(tmp_path / "model.gguf")
    ref_w = _write_tiny_llama_gguf(
        path, cfg0, rng,
        overrides={"attn_v.weight": gguf.GGML_Q8_0,
                   "ffn_down.weight": gguf.GGML_Q8_0})
    cfg, params = gguf.convert_gguf_model(path, name="tiny-mixed-gguf")
    l0 = params["layers"][0]
    assert l0["wqkv"].bits == 4            # uniform requantized fuse
    assert l0["down"].bits == 8            # exact 8-bit mapping
    x = rng.standard_normal((2, cfg.intermediate_size)).astype(np.float32)
    got = np.asarray(qgemm_xla(jnp.asarray(x), l0["down"]))
    wd = ref_w["blk.0.ffn_down"].T
    assert nmse(x @ wd, got) < 1e-4        # 8-bit noise, not 4-bit
    cache = KVCache.create(cfg, 1, 8)
    logits, _ = forward(params, cfg, jnp.asarray([[1, 2, 3]]), cache,
                        impl="xla")
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_q4_1_exact_mapping(tmp_path):
    """Q4_1's affine block model == the framework contract at gs=32:
    q4_1_to_quantized reproduces reader.dequantized exactly."""
    rng = np.random.default_rng(13)
    M, K = 32, 256
    w = rng.standard_normal((M, K)).astype(np.float32) + 0.5
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, {}, {"w": (gguf.GGML_Q4_1, w)})
    r = gguf.GGUFReader(path)
    wdq = r.dequantized("w")
    wq, scales, sub = r.q4_1_to_quantized("w")
    assert wq.shape == (K, M) and wq.max() <= 15
    from tmac_tpu.ops.packing import dequantize
    np.testing.assert_allclose(dequantize(wq, scales, sub, 32), wdq.T,
                               rtol=1e-6, atol=1e-6)
    r.close()


def test_q5_0_code_roundtrip(tmp_path):
    """Q5_0/Q5_1 5th-bit placement: codes survive write -> read exactly
    (bit i of the little-endian qh word is element i's high bit)."""
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 32, (4, 64)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    # values chosen so quantization is exact: w = (q - 16) * 1.0 needs
    # d = 1, i.e. a -16 in every 32-block (index 0 forced below)
    w0 = codes - 16.0
    w0[:, 0::32] = -16.0
    gguf.write_gguf(path, {}, {"w": (gguf.GGML_Q5_0, w0)})
    r = gguf.GGUFReader(path)
    back = r.dequantized("w")
    np.testing.assert_array_equal(back, w0)
    r.close()


def test_q4_k_exact_mapping(tmp_path):
    """Q4_K's affine super-block model == the framework dequant contract
    at gs=32: q4_k_to_quantized must reproduce reader.dequantized EXACTLY
    (no requantization)."""
    rng = np.random.default_rng(7)
    M, K = 32, 512
    w = rng.standard_normal((M, K)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, {}, {"w": (gguf.GGML_Q4_K, w)})
    r = gguf.GGUFReader(path)
    wdq = r.dequantized("w")
    wq, scales, sub = r.q4_k_to_quantized("w")
    assert wq.shape == (K, M) and scales.shape == (K // 32, M)
    assert wq.max() <= 15
    from tmac_tpu.ops.packing import dequantize
    np.testing.assert_allclose(dequantize(wq, scales, sub, 32), wdq.T,
                               rtol=1e-6, atol=1e-6)
    r.close()


def test_kquant_scale_field_roundtrip():
    """The 12-byte 6-bit scale/min packing is a bijection on all 6-bit
    values (the subtle part of Q4_K/Q5_K)."""
    rng = np.random.default_rng(8)
    sc6 = rng.integers(0, 64, (64, 8)).astype(np.uint8)
    m6 = rng.integers(0, 64, (64, 8)).astype(np.uint8)
    packed = gguf._kq_pack_scales(sc6, m6)
    got_sc, got_m = gguf.GGUFReader._kq_scale_min(packed)
    np.testing.assert_array_equal(got_sc, sc6)
    np.testing.assert_array_equal(got_m, m6)


def _write_tiny_llama_gguf(path: str, cfg, rng, wtype=gguf.GGML_Q4_0,
                           overrides=None):
    """overrides: {tensor-name-suffix: ggml_type} applied on top of wtype
    (e.g. {"output.weight": GGML_Q6_K} to mimic llama.cpp's default mix)."""
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    md = {
        "general.architecture": "llama",
        "llama.embedding_length": H,
        "llama.block_count": cfg.num_layers,
        "llama.attention.head_count": cfg.num_heads,
        "llama.attention.head_count_kv": cfg.num_kv_heads,
        "llama.feed_forward_length": I,
        "llama.vocab_size": V,
        "llama.rope.freq_base": cfg.rope_theta,
        "llama.attention.layer_norm_rms_epsilon": cfg.rms_norm_eps,
        "llama.attention.key_length": cfg.head_dim,
    }
    std = 1 / np.sqrt(H)
    tensors = {
        "token_embd.weight": (gguf.GGML_F16, rng.standard_normal((V, H)) * 0.02),
        "output_norm.weight": (gguf.GGML_F32, np.ones((H,))),
        "output.weight": (gguf.GGML_F16, rng.standard_normal((V, H)) * 0.02),
    }
    ref_w = {}
    for i in range(cfg.num_layers):
        p = f"blk.{i}"
        qd, kvd = cfg.q_dim, cfg.kv_dim
        shapes = {
            "attn_q": (qd, H), "attn_k": (kvd, H), "attn_v": (kvd, H),
            "attn_output": (H, qd), "ffn_gate": (I, H), "ffn_up": (I, H),
            "ffn_down": (H, I),
        }
        tensors[f"{p}.attn_norm.weight"] = (gguf.GGML_F32, np.ones((H,)))
        tensors[f"{p}.ffn_norm.weight"] = (gguf.GGML_F32, np.ones((H,)))
        for n, shp in shapes.items():
            if wtype in gguf.TERNARY_TYPES:
                # ternary * per-tensor scale (what a BitNet artifact holds)
                w = (rng.integers(-1, 2, shp) * std).astype(np.float32)
            else:
                w = (rng.standard_normal(shp) * std).astype(np.float32)
            tensors[f"{p}.{n}.weight"] = (wtype, w)
            ref_w[f"{p}.{n}"] = w
    for suffix, t in (overrides or {}).items():
        for full in list(tensors):
            if full.endswith(suffix):
                tensors[full] = (t, np.asarray(tensors[full][1], np.float32))
    gguf.write_gguf(path, md, tensors)
    return ref_w


def test_convert_gguf_model_end_to_end(tmp_path):
    cfg0 = get_preset("llama-2-7b").scaled(8)
    rng = np.random.default_rng(2)
    path = str(tmp_path / "model.gguf")
    ref_w = _write_tiny_llama_gguf(path, cfg0, rng)
    cfg, params = gguf.convert_gguf_model(path, name="tiny-gguf")
    assert cfg.hidden_size == cfg0.hidden_size
    assert cfg.num_layers == cfg0.num_layers
    assert cfg.quant.bits == 4 and cfg.quant.group_size == 32

    # converted fused qkv vs the float originals (4-bit noise bound)
    x = rng.standard_normal((2, cfg.hidden_size)).astype(np.float32)
    got = np.asarray(qgemm_xla(jnp.asarray(x), params["layers"][0]["wqkv"]))
    wq = ref_w["blk.0.attn_q"].T  # (H, qd)
    e = nmse(x @ wq, got[:, :cfg.q_dim])
    assert e < 2e-2, e  # Q4_0's symmetric max/-8 scale is cruder than affine

    # model runs
    cache = KVCache.create(cfg, 1, 8)
    logits, _ = forward(params, cfg, jnp.asarray([[1, 2, 3]]), cache, impl="xla")
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_convert_gguf_kquant_mix_end_to_end(tmp_path):
    """A realistic llama.cpp artifact mix (reference run_pipeline.py:164-175
    + VERDICT gap #4): output.weight/token_embd as Q6_K/Q4_K, attn_v as
    Q5_K (requantize fallback), other matmuls Q4_K (exact mapping).  The
    whole model must convert and run."""
    cfg0 = get_preset("llama-2-7b").scaled(8)
    rng = np.random.default_rng(9)
    path = str(tmp_path / "model.gguf")
    # hidden=512 is 256-divisible; ffn_down's K=intermediate is not -> Q4_0
    ref_w = _write_tiny_llama_gguf(
        path, cfg0, rng, wtype=gguf.GGML_Q4_K,
        overrides={"output.weight": gguf.GGML_Q6_K,
                   "token_embd.weight": gguf.GGML_Q4_K,
                   "attn_v.weight": gguf.GGML_Q5_K,
                   "ffn_down.weight": gguf.GGML_Q4_0})
    cfg, params = gguf.convert_gguf_model(path, name="tiny-kquant-gguf")
    assert cfg.quant.bits == 4 and cfg.quant.group_size == 32

    # Q4_K matmul path is exact vs its own dequant model: compare against
    # the float original within K-quant noise
    x = rng.standard_normal((2, cfg.hidden_size)).astype(np.float32)
    got = np.asarray(qgemm_xla(jnp.asarray(x), params["layers"][0]["wqkv"]))
    wq = ref_w["blk.0.attn_q"].T
    assert nmse(x @ wq, got[:, :cfg.q_dim]) < 1e-2
    # Q5_K fallback (requantized to 4-bit affine) still lands close
    v0 = cfg.q_dim + cfg.kv_dim
    wv = ref_w["blk.0.attn_v"].T
    assert nmse(x @ wv, got[:, v0:v0 + cfg.kv_dim]) < 2e-2

    cache = KVCache.create(cfg, 1, 8)
    logits, _ = forward(params, cfg, jnp.asarray([[1, 2, 3]]), cache, impl="xla")
    assert np.isfinite(np.asarray(logits, np.float32)).all()


@pytest.mark.parametrize("ttype", [gguf.GGML_TQ1_0, gguf.GGML_I2_S])
def test_convert_bitnet_gguf_end_to_end(ttype, tmp_path):
    """A BitNet gguf artifact (ternary tensor types) converts to the w_a8
    per-tensor path and the model runs -- the reference's main
    distribution-format ingestion (run_pipeline.py:375)."""
    cfg0 = get_preset("bitnet-3b").scaled(12)
    rng = np.random.default_rng(5)
    path = str(tmp_path / "model.gguf")
    ref_w = _write_tiny_llama_gguf(path, cfg0, rng, wtype=ttype)
    cfg, params = gguf.convert_gguf_model(path, name="tiny-bitnet-gguf")
    assert cfg.quant.mode == "w_a8" and cfg.quant.group_size == -1
    qt = params["layers"][0]["wqkv"]
    assert qt.bits == 2 and qt.scales.shape[0] == 1

    # exact ternary recovery through the whole pipeline: int8 activations x
    # converted weights == float oracle (exact-int path, near-zero nmse)
    x = rng.integers(-10, 11, (2, cfg.hidden_size)).astype(np.float32)
    got = np.asarray(qgemm_xla(jnp.asarray(x, jnp.float32), qt))
    wq = ref_w["blk.0.attn_q"].T  # (H, qd)
    e = nmse(x @ wq, got[:, :cfg.q_dim])
    assert e < 1e-4, e  # fp16 scale rounding only (exact for i2_s)

    cache = KVCache.create(cfg, 1, 8)
    logits, _ = forward(params, cfg, jnp.asarray([[1, 2, 3]]), cache, impl="xla")
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_convert_gguf_moe_end_to_end(tmp_path):
    """A llama.cpp Mixtral-style MoE artifact: 3-D stacked expert tensors
    (ffn_{gate,up,down}_exps, block-quantized along ne0 so each expert is
    a contiguous run of block rows) + the ffn_gate_inp router.  Expert
    views must slice exactly and the converted model must run."""
    rng = np.random.default_rng(11)
    H, Ie, V, L, E = 128, 128, 512, 2, 4
    path = str(tmp_path / "moe.gguf")
    md = {
        "general.architecture": "llama",
        "llama.embedding_length": H,
        "llama.block_count": L,
        "llama.attention.head_count": 2,
        "llama.attention.head_count_kv": 2,
        "llama.feed_forward_length": Ie,
        "llama.vocab_size": V,
        "llama.rope.freq_base": 1e6,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "llama.attention.key_length": 64,
        "llama.expert_count": E,
        "llama.expert_used_count": 2,
    }
    std = 1 / np.sqrt(H)
    tensors = {
        "token_embd.weight": (gguf.GGML_F16, rng.standard_normal((V, H)) * 0.02),
        "output_norm.weight": (gguf.GGML_F32, np.ones((H,))),
        "output.weight": (gguf.GGML_F16, rng.standard_normal((V, H)) * 0.02),
    }
    ref_w = {}
    for i in range(L):
        p = f"blk.{i}"
        tensors[f"{p}.attn_norm.weight"] = (gguf.GGML_F32, np.ones((H,)))
        tensors[f"{p}.ffn_norm.weight"] = (gguf.GGML_F32, np.ones((H,)))
        for n, shp in (("attn_q", (128, H)), ("attn_k", (128, H)),
                       ("attn_v", (128, H)), ("attn_output", (H, 128))):
            w = (rng.standard_normal(shp) * std).astype(np.float32)
            tensors[f"{p}.{n}.weight"] = (gguf.GGML_Q4_0, w)
        tensors[f"{p}.ffn_gate_inp.weight"] = (
            gguf.GGML_F32, rng.standard_normal((E, H)) * 0.02)
        for n, shp in (("ffn_gate_exps", (E, Ie, H)),
                       ("ffn_up_exps", (E, Ie, H)),
                       ("ffn_down_exps", (E, H, Ie))):
            w = (rng.standard_normal(shp) * std).astype(np.float32)
            tensors[f"{p}.{n}.weight"] = (gguf.GGML_Q4_0, w)
            ref_w[f"{p}.{n}"] = w
    gguf.write_gguf(path, md, tensors)

    cfg, params = gguf.convert_gguf_model(path, name="tiny-moe-gguf")
    assert cfg.num_experts == E and cfg.num_experts_per_tok == 2
    assert cfg.moe_intermediate_size == Ie

    # expert 2's gate/up slices must match the original per-expert weights
    from tmac_tpu.models.moe import expert_view
    layer = params["layers"][0]
    x = rng.standard_normal((2, H)).astype(np.float32)
    qt = expert_view(layer["experts_gate_up"], 2)
    got = np.asarray(qgemm_xla(jnp.asarray(x), qt, out_dtype=jnp.float32))
    e1 = nmse(x @ ref_w["blk.0.ffn_gate_exps"][2].T, got[:, :Ie])
    e2 = nmse(x @ ref_w["blk.0.ffn_up_exps"][2].T, got[:, Ie:2 * Ie])
    assert e1 < 2e-2 and e2 < 2e-2, (e1, e2)
    qtd = expert_view(layer["experts_down"], 2)
    gotd = np.asarray(qgemm_xla(jnp.asarray(x[:, :Ie]), qtd,
                                out_dtype=jnp.float32))
    e3 = nmse(x[:, :Ie] @ ref_w["blk.0.ffn_down_exps"][2].T, gotd[:, :H])
    assert e3 < 2e-2, e3

    # the model runs
    cache = KVCache.create(cfg, 1, 8)
    logits, _ = forward(params, cfg, jnp.asarray([[1, 2, 3]]), cache,
                        impl="xla")
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_convert_gguf_qwen2moe_shared_expert(tmp_path):
    """qwen2moe arch: shared-expert tensors (ffn_*_shexp + gate vector)
    and norm_topk=False routing come through the reader."""
    rng = np.random.default_rng(13)
    H, Ie, Is, V, L, E = 128, 128, 128, 512, 1, 4
    path = str(tmp_path / "q2moe.gguf")
    md = {
        "general.architecture": "qwen2moe",
        "qwen2moe.embedding_length": H,
        "qwen2moe.block_count": L,
        "qwen2moe.attention.head_count": 2,
        "qwen2moe.attention.head_count_kv": 2,
        "qwen2moe.feed_forward_length": Ie,
        "qwen2moe.vocab_size": V,
        "qwen2moe.rope.freq_base": 1e6,
        "qwen2moe.attention.layer_norm_rms_epsilon": 1e-6,
        "qwen2moe.attention.key_length": 64,
        "qwen2moe.expert_count": E,
        "qwen2moe.expert_used_count": 2,
        "qwen2moe.expert_feed_forward_length": Ie,
        "qwen2moe.expert_shared_feed_forward_length": Is,
    }
    tensors = {
        "token_embd.weight": (gguf.GGML_F16,
                              rng.standard_normal((V, H)) * 0.02),
        "output_norm.weight": (gguf.GGML_F32, np.ones((H,))),
        "output.weight": (gguf.GGML_F16, rng.standard_normal((V, H)) * 0.02),
    }
    p = "blk.0"
    std = 1 / np.sqrt(H)
    tensors[f"{p}.attn_norm.weight"] = (gguf.GGML_F32, np.ones((H,)))
    tensors[f"{p}.ffn_norm.weight"] = (gguf.GGML_F32, np.ones((H,)))
    for n, shp in (("attn_q", (128, H)), ("attn_k", (128, H)),
                   ("attn_v", (128, H)), ("attn_output", (H, 128))):
        tensors[f"{p}.{n}.weight"] = (
            gguf.GGML_Q4_0, (rng.standard_normal(shp) * std))
    bq_ref = rng.standard_normal((128,)).astype(np.float32) * 0.1
    tensors[f"{p}.attn_q.bias"] = (gguf.GGML_F32, bq_ref)
    tensors[f"{p}.attn_k.bias"] = (
        gguf.GGML_F32, rng.standard_normal((128,)) * 0.1)
    tensors[f"{p}.attn_v.bias"] = (
        gguf.GGML_F32, rng.standard_normal((128,)) * 0.1)
    tensors[f"{p}.ffn_gate_inp.weight"] = (
        gguf.GGML_F32, rng.standard_normal((E, H)) * 0.02)
    for n, shp in (("ffn_gate_exps", (E, Ie, H)),
                   ("ffn_up_exps", (E, Ie, H)),
                   ("ffn_down_exps", (E, H, Ie))):
        tensors[f"{p}.{n}.weight"] = (
            gguf.GGML_Q4_0, rng.standard_normal(shp) * std)
    shex_gate = (rng.standard_normal((Is, H)) * std)
    tensors[f"{p}.ffn_gate_shexp.weight"] = (gguf.GGML_Q4_0, shex_gate)
    tensors[f"{p}.ffn_up_shexp.weight"] = (
        gguf.GGML_Q4_0, rng.standard_normal((Is, H)) * std)
    tensors[f"{p}.ffn_down_shexp.weight"] = (
        gguf.GGML_Q4_0, rng.standard_normal((H, Is)) * std)
    tensors[f"{p}.ffn_gate_inp_shexp.weight"] = (
        gguf.GGML_F32, rng.standard_normal((1, H)) * 0.02)
    gguf.write_gguf(path, md, tensors)

    cfg, params = gguf.convert_gguf_model(path, name="tiny-q2moe-gguf")
    assert cfg.num_experts == E and not cfg.moe_norm_topk
    assert cfg.moe_shared_intermediate_size == Is and cfg.moe_shared_gate
    assert cfg.attention_bias
    layer = params["layers"][0]
    assert "shared_gate_up" in layer and "shared_gate" in layer
    assert layer["shared_gate"].shape == (H,)
    # QKV biases land (qwen-family artifacts carry them as tensors)
    assert "bq" in layer and "bk" in layer and "bv" in layer
    np.testing.assert_allclose(np.asarray(layer["bq"], np.float32), bq_ref,
                               rtol=1e-2, atol=1e-3)
    x = rng.standard_normal((2, H)).astype(np.float32)
    got = np.asarray(qgemm_xla(jnp.asarray(x), layer["shared_gate_up"],
                               out_dtype=jnp.float32))
    assert nmse(x @ shex_gate.T, got[:, :Is]) < 2e-2

    cache = KVCache.create(cfg, 1, 8)
    logits, _ = forward(params, cfg, jnp.asarray([[1, 2, 3]]), cache,
                        impl="xla")
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_q2_k_exact_mapping(tmp_path):
    """Q2_K's per-16 affine model == the framework dequant contract at
    gs=16: q2_k_to_quantized must reproduce reader.dequantized EXACTLY,
    so llama.cpp 2-bit artifacts run natively on the 2-bit kernels."""
    rng = np.random.default_rng(21)
    M, K = 16, 512
    w = rng.standard_normal((M, K)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, {}, {"w": (gguf.GGML_Q2_K, w)})
    r = gguf.GGUFReader(path)
    wdq = r.dequantized("w")
    wq, scales, sub = r.q2_k_to_quantized("w")
    assert wq.shape == (K, M) and scales.shape == (K // 16, M)
    from tmac_tpu.ops.packing import dequantize
    np.testing.assert_allclose(dequantize(wq, scales, sub, 16), wdq.T,
                               rtol=0, atol=1e-6)
    r.close()


def test_q3_k_exact_mapping(tmp_path):
    """Q3_K == the dequant contract at gs=16 with signed scales and
    sub = 4*sc: exact, so 3-bit artifacts hit the b3 bit-plane kernels."""
    rng = np.random.default_rng(22)
    M, K = 16, 512
    w = rng.standard_normal((M, K)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, {}, {"w": (gguf.GGML_Q3_K, w)})
    r = gguf.GGUFReader(path)
    wdq = r.dequantized("w")
    wq, scales, sub = r.q3_k_to_quantized("w")
    assert wq.max() <= 7 and scales.shape == (K // 16, M)
    from tmac_tpu.ops.packing import dequantize
    np.testing.assert_allclose(dequantize(wq, scales, sub, 16), wdq.T,
                               rtol=0, atol=1e-6)
    r.close()


def test_q2_k_model_forward(tmp_path):
    """A Q2_K-quantized model converts with the exact gs=16 mapping and
    its forward matches the dequant oracle."""
    from tests.test_gguf import _write_tiny_llama_gguf  # self-import ok
    from tmac_tpu.models.config import get_preset
    from tmac_tpu.ops.qgemm import qgemm

    cfg0 = get_preset("llama-2-7b").scaled(8)
    rng = np.random.default_rng(23)
    path = str(tmp_path / "m.gguf")
    ref_w = _write_tiny_llama_gguf(path, cfg0, rng, wtype=gguf.GGML_Q2_K)
    cfg, params = gguf.convert_gguf_model(path, name="q2k")
    assert cfg.quant.bits == 2 and cfg.quant.group_size == 16
    qt = params["layers"][0]["wo"]
    assert qt.bits == 2 and qt.group_size == 16
    r = gguf.GGUFReader(path)
    oracle_w = r.dequantized("blk.0.attn_output.weight").T
    r.close()
    x = rng.standard_normal((2, qt.kdim)).astype(np.float32)
    out = np.asarray(qgemm(jnp.asarray(x, jnp.bfloat16), qt, impl="xla"))
    ref = x @ oracle_w
    assert nmse(ref, out) < 5e-4
