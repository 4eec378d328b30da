"""gguf export (convert/gguf_export.py) -- the llama-quantize role.

Round trips: gguf -> packed checkpoint -> gguf must be lossless for
block-aligned types (dequant values requantize to themselves), and an
init_params model must survive export -> re-convert with only the target
codec's quantization noise.  Reference: tools/run_pipeline.py:164-175
(llama-quantize), 139-175 (conversion step).
"""

import numpy as np
import pytest

from tmac_tpu.convert import gguf
from tmac_tpu.convert.gguf_export import export_gguf, qt_to_float, split_fused
from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import init_params
from tmac_tpu.utils import nmse


def test_qt_to_float_matches_dequant_contract():
    from tmac_tpu.ops import packing
    from tmac_tpu.ops.qgemm import QuantizedTensor

    rng = np.random.default_rng(0)
    K, M = 256, 96  # unpadded M exercises slice_m
    w = rng.standard_normal((K, M)).astype(np.float32)
    wq, s, sub = packing.quantize_weights(w, 2, 128, True)
    qt = QuantizedTensor.from_quantized(wq, s, sub, bits=2, group_size=128)
    oracle = packing.dequantize(wq, s, sub, 128)
    np.testing.assert_allclose(qt_to_float(qt), oracle, rtol=0, atol=2e-2)


def test_split_fused_components():
    from tmac_tpu.ops.qgemm import QuantizedTensor, fuse_m

    rng = np.random.default_rng(1)
    K = 256
    widths = (128, 64, 64)
    ws = [rng.standard_normal((K, m)).astype(np.float32) for m in widths]
    qt = fuse_m([QuantizedTensor.from_float(w, bits=4, group_size=64)
                 for w in ws])
    parts = split_fused(qt, qt_to_float(qt))
    assert [p.shape[1] for p in parts] == list(widths)
    for p, w in zip(parts, ws):
        # 4-bit affine noise on N(0,1): step ~.3 sigma -> nmse ~7e-3
        assert nmse(w, p) < 2e-2


def _tiny_cfg(**kw):
    return get_preset("llama-2-7b", **kw).scaled(8)


def test_export_roundtrip_q4_0(tmp_path):
    """gguf Q4_0 -> checkpoint -> export Q4_0 is LOSSLESS: the packed
    checkpoint holds exactly the Q4_0 grid values, which requantize to
    themselves (same 32-blocks, same absmax)."""
    from tests.test_gguf import _write_tiny_llama_gguf

    cfg0 = _tiny_cfg()
    rng = np.random.default_rng(2)
    src = str(tmp_path / "src.gguf")
    _write_tiny_llama_gguf(src, cfg0, rng)
    cfg, params = gguf.convert_gguf_model(src, name="t")
    out = str(tmp_path / "out.gguf")
    r = export_gguf(out, cfg, params, wtype="Q4_0")
    assert r["wtype"] == "Q4_0" and r["bytes"] > 0

    r_src, r_out = gguf.GGUFReader(src), gguf.GGUFReader(out)
    for name in ("blk.0.attn_q.weight", "blk.0.ffn_down.weight",
                 "blk.1.attn_output.weight"):
        a = r_src.dequantized(name)
        b = r_out.dequantized(name)
        assert a.shape == b.shape, name
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-6, err_msg=name)
    # norms exported exactly
    np.testing.assert_allclose(
        r_out.dequantized("blk.0.attn_norm.weight"),
        r_src.dequantized("blk.0.attn_norm.weight"), atol=0)
    r_src.close(), r_out.close()


def test_export_reconvert_forward_parity(tmp_path):
    """init_params model -> export (auto wtype) -> re-convert -> the
    re-imported weights match the originals to codec noise."""
    cfg = _tiny_cfg(bits=4)
    params = init_params(cfg, seed=0)
    out = str(tmp_path / "m.gguf")
    r = export_gguf(out, cfg, params)
    assert r["wtype"] == "Q4_1"  # bits=4 + zero_point -> affine type
    cfg2, params2 = gguf.convert_gguf_model(out, name="re")
    assert cfg2.num_layers == cfg.num_layers
    assert cfg2.intermediate_size == params["layers"][0]["down"].kdim
    w_orig = qt_to_float(params["layers"][0]["wo"])
    w_re = qt_to_float(params2["layers"][0]["wo"])
    assert w_orig.shape == w_re.shape
    assert nmse(w_orig, w_re) < 5e-3


def test_export_ternary_auto(tmp_path):
    """BitNet w_a8 checkpoint -> auto wtype TQ2_0, ternary exact."""
    cfg = get_preset("bitnet-3b").scaled(8)
    params = init_params(cfg, seed=0)
    out = str(tmp_path / "bn.gguf")
    r = export_gguf(out, cfg, params)
    assert r["wtype"] == "TQ2_0"
    rd = gguf.GGUFReader(out)
    a = qt_to_float(params["layers"][0]["wo"])
    b = rd.dequantized("blk.0.attn_output.weight").T
    rd.close()
    # ternary GRID survives exactly; the only error is the per-block fp16
    # scale storage of the TQ2_0 codec (f32 scale -> fp16 d)
    assert nmse(a, b) < 1e-6


def test_export_tokenizer_rides_along(tmp_path):
    from tests.test_tokenizer import _spm
    from tmac_tpu.runtime.tokenizer import tokenizer_from_gguf

    cfg = _tiny_cfg()
    params = init_params(cfg, seed=0)
    ck = tmp_path / "ck"
    ck.mkdir()
    _spm().save(str(ck))
    out = str(tmp_path / "m.gguf")
    export_gguf(out, cfg, params, ckpt_dir=str(ck))
    rd = gguf.GGUFReader(out)
    tok = tokenizer_from_gguf(rd.metadata)
    rd.close()
    assert tok is not None
    assert tok.encode("hello") == _spm().encode("hello")


def test_export_moe_roundtrip(tmp_path):
    """Mixtral-family export: 3-D stacked expert tensors + router come
    back through convert_gguf_model with matching shapes and values."""
    cfg = get_preset("mixtral-8x7b", bits=4).scaled(8)
    params = init_params(cfg, seed=0)
    out = str(tmp_path / "moe.gguf")
    r = export_gguf(out, cfg, params)
    assert r["wtype"] == "Q4_1"
    cfg2, params2 = gguf.convert_gguf_model(out, name="re")
    assert cfg2.num_experts == cfg.num_experts
    assert cfg2.num_experts_per_tok == cfg.num_experts_per_tok
    from tmac_tpu.models.moe import expert_view
    for e in (0, cfg.num_experts - 1):
        a = qt_to_float(expert_view(params["layers"][0]["experts_down"], e))
        b = qt_to_float(expert_view(params2["layers"][0]["experts_down"], e))
        assert a.shape == b.shape
        assert nmse(a, b) < 5e-3, e
    np.testing.assert_allclose(
        np.asarray(params2["layers"][0]["moe_router"], np.float32),
        np.asarray(params["layers"][0]["moe_router"], np.float32),
        atol=2e-2)  # router: f32 out, bf16 back in


def test_export_qwen2moe_shared_expert(tmp_path):
    """Shared-expert family: arch flips to qwen2moe and the shexp tensors
    + gate vector round-trip."""
    import dataclasses
    cfg = dataclasses.replace(
        get_preset("qwen2-moe-a14b", bits=4).scaled(8), num_experts=4,
        num_experts_per_tok=2, num_heads=4, num_kv_heads=2,
        moe_intermediate_size=256, moe_shared_intermediate_size=256)
    params = init_params(cfg, seed=0)
    out = str(tmp_path / "qmoe.gguf")
    export_gguf(out, cfg, params)
    rd = gguf.GGUFReader(out)
    assert rd.metadata["general.architecture"] == "qwen2moe"
    assert "blk.0.ffn_gate_shexp.weight" in rd.tensors
    rd.close()
    cfg2, params2 = gguf.convert_gguf_model(out, name="re")
    assert cfg2.moe_shared_intermediate_size > 0
    assert cfg2.moe_shared_gate == cfg.moe_shared_gate
    a = qt_to_float(params["layers"][0]["shared_down"])
    b = qt_to_float(params2["layers"][0]["shared_down"])
    assert nmse(a, b) < 5e-3
