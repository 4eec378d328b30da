"""Hardware test tier: the BENCH.md accuracy gates as pytest, on real TPU.

Run with `TMAC_TEST_TPU=1 python -m pytest tests/test_tpu_hw.py -q` on a
machine with a TPU (the conftest skips these when no TPU is present).
These exercise the COMPILED Mosaic kernels -- the CPU suite only covers
interpret mode, which differs in unpack path (no SWAR), MXU precision, and
lowering legality.

Reference accuracy gate: NMSE <= 5e-4 vs the dequant oracle
(reference python/t_mac/ops/qgemm.py:278).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmac_tpu.ops import packing
from tmac_tpu.ops.qgemm import QuantizedTensor
from tmac_tpu.ops.pallas.qgemm_kernel import qgemm_pallas
from tmac_tpu.utils import nmse

pytestmark = pytest.mark.tpu


def _setup(bits, N, K, M, gs, zero_point, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((K, M)).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)
    wq, scales, sub = packing.quantize_weights(w, bits, gs, zero_point)
    wdq = packing.dequantize(wq, scales, sub, gs)
    qt = QuantizedTensor.from_quantized(wq, scales, sub, bits, gs)
    return x, qt, x @ wdq


@pytest.mark.parametrize("bits", [1, 2, 3, 4])
@pytest.mark.parametrize("zero_point", [False, True])
def test_hw_pallas_vs_oracle_grouped(bits, zero_point):
    """Compiled SWAR kernel vs dequant oracle at every bits x zp combo."""
    x, qt, oracle = _setup(bits, 4, 1024, 512, 128, zero_point)
    got = np.asarray(qgemm_pallas(jnp.asarray(x, jnp.bfloat16), qt,
                                  act="int8", out_dtype=jnp.float32))
    assert nmse(oracle, got) < 5e-4


def test_hw_int8_per_tensor_exact():
    """BitNet path: int8 acts x per-tensor scale accumulates exactly in
    int32 on the MXU."""
    rng = np.random.default_rng(1)
    K, M = 1024, 512
    wq = rng.integers(1, 4, (K, M)).astype(np.uint8)
    s = np.full((1, M), 0.031, np.float32)
    qt = QuantizedTensor.from_quantized(wq, s, 2 * s, bits=2, group_size=K)
    x = rng.integers(-127, 128, (4, K)).astype(np.int8)
    oracle = (x.astype(np.int64) @ (wq.astype(np.int64) - 2)
              ).astype(np.float32) * s[0]
    got = np.asarray(qgemm_pallas(jnp.asarray(x), qt, out_dtype=jnp.float32))
    assert nmse(oracle, got) < 1e-10


def test_hw_fused_equals_external_prologue():
    """act='fused' (in-kernel act quant) == external int8 prologue path."""
    rng = np.random.default_rng(2)
    K, M = 1024, 512
    wq = rng.integers(1, 4, (K, M)).astype(np.uint8)
    s = np.full((1, M), 0.02, np.float32)
    qt = QuantizedTensor.from_quantized(wq, s, 2 * s, bits=2, group_size=K)
    xb = jnp.asarray(rng.standard_normal((2, K)), jnp.bfloat16)
    fused = np.asarray(qgemm_pallas(xb, qt, act="fused",
                                    out_dtype=jnp.float32))
    # external per-token quantization (same math as the kernel prologue)
    xf = np.asarray(xb, np.float32)
    sc = np.maximum(np.abs(xf).max(1, keepdims=True), 1e-20) / 127.0
    xq = np.clip(np.rint(xf / sc), -127, 127).astype(np.int8)
    ext = np.asarray(qgemm_pallas(jnp.asarray(xq), qt,
                                  out_dtype=jnp.float32)) * sc
    assert nmse(ext, fused) < 1e-9


@pytest.mark.parametrize("dispatch", ["chunk", "dequant"])
def test_hw_large_n_grouped_paths(dispatch):
    """Both large-N grouped kernel paths stay within the gate on hardware
    (the dispatch choice is perf-only, never accuracy)."""
    x, qt, oracle = _setup(4, 256, 1024, 512, 128, True)
    got = np.asarray(qgemm_pallas(jnp.asarray(x, jnp.bfloat16), qt,
                                  act="fused", out_dtype=jnp.float32,
                                  dispatch=dispatch))
    assert nmse(oracle, got) < 5e-4


def test_hw_single_dot_large_n_per_tensor():
    rng = np.random.default_rng(3)
    K, M = 1024, 512
    wq = rng.integers(1, 4, (K, M)).astype(np.uint8)
    s = np.full((1, M), 0.05, np.float32)
    qt = QuantizedTensor.from_quantized(wq, s, 2 * s, bits=2, group_size=K)
    x = rng.integers(-127, 128, (128, K)).astype(np.int8)
    oracle = (x.astype(np.int64) @ (wq.astype(np.int64) - 2)
              ).astype(np.float32) * s[0]
    got = np.asarray(qgemm_pallas(jnp.asarray(x), qt, out_dtype=jnp.float32))
    assert nmse(oracle, got) < 1e-10


def test_hw_norm_glu_folds():
    """rms_norm and SwiGLU prologue folds == external ops, compiled."""
    rng = np.random.default_rng(4)
    K, M = 1024, 512
    wq = rng.integers(1, 4, (K, M)).astype(np.uint8)
    s = np.full((1, M), 0.02, np.float32)
    qt = QuantizedTensor.from_quantized(wq, s, 2 * s, bits=2, group_size=K)
    x = jnp.asarray(rng.standard_normal((2, K)), jnp.bfloat16)
    w_n = jnp.asarray(1.0 + 0.1 * rng.standard_normal(K), jnp.bfloat16)
    eps = 1e-5
    fused = np.asarray(qgemm_pallas(x, qt, act="fused",
                                    out_dtype=jnp.float32, norm=(w_n, eps)))
    xf = np.asarray(x, np.float32)
    var = np.mean(xf ** 2, 1, keepdims=True)
    xn = jnp.asarray(xf / np.sqrt(var + eps) * np.asarray(w_n, np.float32),
                     jnp.bfloat16)
    ref = np.asarray(qgemm_pallas(xn, qt, act="fused",
                                  out_dtype=jnp.float32))
    assert nmse(ref, fused) < 1e-4

    gu = jnp.asarray(rng.standard_normal((2, 2 * K)), jnp.bfloat16)
    fg = np.asarray(qgemm_pallas(gu, qt, act="fused", out_dtype=jnp.float32,
                                 glu=True))
    guf = np.asarray(gu, np.float32)
    prod = jnp.asarray(guf[:, :K] / (1 + np.exp(-guf[:, :K])) * guf[:, K:],
                       jnp.bfloat16)
    rf = np.asarray(qgemm_pallas(prod, qt, act="fused",
                                 out_dtype=jnp.float32))
    assert nmse(rf, fg) < 1e-4


@pytest.mark.parametrize("D,S", [(100, 256), (128, 256), (128, 2048)])
def test_hw_flash_decode_vs_oracle(D, S):
    """Flash-decode kernel vs masked-softmax oracle on hardware, padded
    head_dim (D=100 -> Dp=128) and per-slot lens included."""
    from tmac_tpu.ops.pallas.attention_kernel import flash_decode_stacked
    rng = np.random.default_rng(5)
    L, B, KV, rep = 2, 2, 2, 2
    Dp = 128
    k = rng.standard_normal((L, B, KV, S, Dp)).astype(np.float32)
    v = rng.standard_normal((L, B, KV, S, Dp)).astype(np.float32)
    if D < Dp:
        k[..., D:] = 0.0
        v[..., D:] = 0.0
    q = rng.standard_normal((B, KV, rep, D)).astype(np.float32)
    lens = np.array([S // 3, S - 1], np.int32)
    li = 1
    scale = 1.0 / np.sqrt(D)
    out = np.asarray(flash_decode_stacked(
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(k, jnp.bfloat16), jnp.asarray(v, jnp.bfloat16),
        jnp.asarray(lens), jnp.int32(li), scale=scale))
    # oracle in f64 on host
    qb = np.asarray(np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32))
    kb = np.asarray(np.asarray(jnp.asarray(k, jnp.bfloat16), np.float32))
    vb = np.asarray(np.asarray(jnp.asarray(v, jnp.bfloat16), np.float32))
    for b in range(B):
        n = lens[b]
        for h in range(KV):
            for r in range(rep):
                sc = (kb[li, b, h, :n, :D] @ qb[b, h, r]) * scale
                p = np.exp(sc - sc.max())
                p /= p.sum()
                o = p @ vb[li, b, h, :n, :D]
                got = np.asarray(out).reshape(B, KV, rep, -1)[b, h, r, :D]
                assert nmse(o, got) < 1e-3, (b, h, r)


@pytest.mark.parametrize("KV,S", [(4, 256), (8, 2048)])
def test_hw_flash_decode_int8_cache(KV, S):
    """Quantized-cache flash decode on hardware: int8 codes + per-vector
    scale blocks (the (KV, blk) f32 scale DMA rides beside the code DMA;
    KV=4 exercises a sub-sublane-tile scale slice like qwen2-7b's GQA).
    Must equal float attention over the dequantized cache."""
    from tmac_tpu.ops.pallas.attention_kernel import flash_decode_stacked
    rng = np.random.default_rng(11)
    L, B, rep, Dp = 2, 2, 2, 128
    k = rng.standard_normal((L, B, KV, S, Dp)).astype(np.float32)
    v = rng.standard_normal((L, B, KV, S, Dp)).astype(np.float32)
    ksc = (np.abs(k).max(-1) / 127.0).astype(np.float32)
    vsc = (np.abs(v).max(-1) / 127.0).astype(np.float32)
    kq = np.clip(np.round(k / ksc[..., None]), -127, 127).astype(np.int8)
    vq = np.clip(np.round(v / vsc[..., None]), -127, 127).astype(np.int8)
    q = rng.standard_normal((B, KV, rep, Dp)).astype(np.float32)
    lens = np.array([S // 3, S - 1], np.int32)
    li = 1
    scale = 1.0 / np.sqrt(Dp)
    out = np.asarray(flash_decode_stacked(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(kq), jnp.asarray(vq),
        jnp.asarray(lens), jnp.int32(li), scale=scale,
        k_scale=jnp.asarray(ksc), v_scale=jnp.asarray(vsc)))
    kdq = kq.astype(np.float32) * ksc[..., None]
    vdq = vq.astype(np.float32) * vsc[..., None]
    qb = np.asarray(np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32))
    for b in range(B):
        n = lens[b]
        for h in range(KV):
            for r in range(rep):
                sc = (kdq[li, b, h, :n] @ qb[b, h, r]) * scale
                p = np.exp(sc - sc.max())
                p /= p.sum()
                o = p @ vdq[li, b, h, :n]
                got = np.asarray(out).reshape(B, KV, rep, -1)[b, h, r]
                assert nmse(o, got) < 1e-3, (b, h, r)


@pytest.mark.parametrize("quant", [False, True])
def test_hw_flash_decode_append_write(quant):
    """append-write flash decode on hardware: the in-kernel cache commit
    (one DMA at a runtime-dynamic, sublane-UNALIGNED S offset into the
    aliased HBM cache) must (a) match the plain append variant's output,
    (b) write exactly the committed row, (c) leave every other row
    bit-identical.  This is the decode default (models/llama.forward
    inkernel_kv), so it gates the headline bench path."""
    from tmac_tpu.models.llama import _quantize_kv
    from tmac_tpu.ops.pallas.attention_kernel import (
        flash_decode_stacked_append, flash_decode_stacked_append_write)
    rng = np.random.default_rng(17)
    L, B, KV, rep, S, Dp = 2, 2, 4, 2, 256, 128
    # odd positions: exercises the unaligned dynamic-offset write
    cached = np.array([37, 201], np.int32)
    li = 1
    if quant:
        k = jnp.asarray(rng.integers(-127, 128, (L, B, KV, S, Dp)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 128, (L, B, KV, S, Dp)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, KV, S)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, KV, S)), jnp.float32)
    else:
        k = jnp.asarray(rng.standard_normal((L, B, KV, S, Dp)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((L, B, KV, S, Dp)), jnp.bfloat16)
        ks = vs = None
    q = jnp.asarray(rng.standard_normal((B, KV, rep, Dp)), jnp.bfloat16)
    ck = jnp.asarray(rng.standard_normal((B, KV, Dp)), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((B, KV, Dp)), jnp.bfloat16)
    want = np.asarray(flash_decode_stacked_append(
        q, k, v, jnp.asarray(cached), jnp.int32(li), ck, cv,
        k_scale=ks, v_scale=vs), np.float32)
    out = flash_decode_stacked_append_write(
        q, k, v, jnp.asarray(cached), jnp.int32(li), ck, cv,
        k_scale=ks, v_scale=vs)
    if quant:
        o, k2, v2, ks2, vs2 = out
    else:
        o, k2, v2 = out
    assert nmse(want, np.asarray(o, np.float32)) < 1e-5
    ke, ve = np.asarray(k).copy(), np.asarray(v).copy()
    if quant:
        kse, vse = np.asarray(ks).copy(), np.asarray(vs).copy()
        ckq, cksc = _quantize_kv(ck)
        cvq, cvsc = _quantize_kv(cv)
        for b in range(B):
            ke[li, b, :, cached[b], :] = np.asarray(ckq)[b]
            ve[li, b, :, cached[b], :] = np.asarray(cvq)[b]
            kse[li, b, :, cached[b]] = np.asarray(cksc)[b]
            vse[li, b, :, cached[b]] = np.asarray(cvsc)[b]
        np.testing.assert_allclose(np.asarray(ks2), kse, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(vs2), vse, rtol=1e-6)
    else:
        for b in range(B):
            ke[li, b, :, cached[b], :] = np.asarray(ck)[b]
            ve[li, b, :, cached[b], :] = np.asarray(cv)[b]
    np.testing.assert_array_equal(np.asarray(k2), ke)
    np.testing.assert_array_equal(np.asarray(v2), ve)


def test_hw_decode_inkernel_kv_token_equality():
    """Model-level gate for the in-kernel KV default: a short greedy
    decode with TMAC_KV_INKERNEL=1 (default) must produce the same tokens
    and the same final cache rows as the explicit dynamic_update_slice
    path (TMAC_KV_INKERNEL=0) on the chip."""
    from tmac_tpu.models.config import get_preset
    from tmac_tpu.models import llama as M
    import dataclasses
    cfg = get_preset("bitnet-3b")
    cfg = dataclasses.replace(
        cfg, num_layers=2, hidden_size=640, intermediate_size=1728,
        num_heads=8, num_kv_heads=8, vocab_size=1024, head_bits=16)
    params = M.init_params(cfg, seed=3)
    toks = jnp.asarray([[7, 11, 13]], jnp.int32)

    def run(inkernel: str):
        os.environ["TMAC_KV_INKERNEL"] = inkernel
        try:
            cache = M.KVCache.create(cfg, 1, 64)
            logits, cache = M.forward(params, cfg, toks, cache)
            out = []
            tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            for _ in range(6):
                out.append(int(tok[0, 0]))
                logits, cache = M.forward(params, cfg, tok, cache)
                tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            return out, np.asarray(cache.k), np.asarray(cache.v), \
                np.asarray(cache.pos)
        finally:
            os.environ.pop("TMAC_KV_INKERNEL", None)

    tok_in, k_in, v_in, pos_in = run("1")
    tok_dus, k_dus, v_dus, pos_dus = run("0")
    assert tok_in == tok_dus
    np.testing.assert_array_equal(pos_in, pos_dus)
    # rows written by decode steps must agree to bf16 exactness; compare
    # only the valid prefix (both paths leave garbage-free zeros beyond)
    n = int(pos_in[0])
    assert nmse(k_dus[:, :, :, :n, :], k_in[:, :, :, :n, :]) < 1e-9
    assert nmse(v_dus[:, :, :, :n, :], v_in[:, :, :, :n, :]) < 1e-9


def test_hw_moe_mlp_pallas_vs_xla():
    """MoE MLP through the compiled pallas expert kernels (dense, select,
    and dispatch forms) vs the XLA dequant path on the same weights."""
    import dataclasses

    from tmac_tpu.models.config import get_preset
    from tmac_tpu.models.llama import init_params, rms_norm
    from tmac_tpu.models.moe import moe_mlp

    cfg = dataclasses.replace(
        get_preset("mixtral-8x7b").scaled(8), num_experts=4,
        num_experts_per_tok=2, num_kv_heads=2, moe_intermediate_size=1024)
    params = init_params(cfg, seed=0)
    layer = params["layers"][0]
    rng = np.random.default_rng(0)

    # decode-shaped (dense + select) and prefill-shaped (dispatch) blocks
    for T, moe_impl in ((1, "dense"), (1, "select"), (96, "dispatch")):
        x = jnp.asarray(rng.standard_normal((1, T, cfg.hidden_size)) * 0.5,
                        jnp.bfloat16)
        got = np.asarray(moe_mlp(x, layer, cfg, cfg.quant.mode,
                                 impl="pallas", moe_impl=moe_impl),
                         np.float32)
        want = np.asarray(moe_mlp(x, layer, cfg, cfg.quant.mode,
                                  impl="xla", moe_impl="dense"), np.float32)
        assert nmse(want, got) < 5e-4, (moe_impl, nmse(want, got))


def test_hw_moe_forward_decode():
    """Full MoE model forward on the chip: prefill + 3 greedy decode steps
    through the flash-decode attention and pallas expert kernels."""
    import dataclasses

    from tmac_tpu.models.config import get_preset
    from tmac_tpu.models.llama import KVCache, forward, init_params

    cfg = dataclasses.replace(
        get_preset("mixtral-8x7b").scaled(8), num_experts=4,
        num_experts_per_tok=2, num_kv_heads=2, moe_intermediate_size=1024)
    params = init_params(cfg, seed=1)
    rng = np.random.default_rng(2)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)))
    cache = KVCache.create(cfg, 1, 128)
    logits, cache = forward(params, cfg, toks, cache)
    ref_logits, _ = forward(params, cfg, toks, KVCache.create(cfg, 1, 128),
                            impl="xla")
    e = nmse(np.asarray(ref_logits, np.float32),
             np.asarray(logits, np.float32))
    assert e < 2e-3, e
    tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
    for _ in range(3):
        lg, cache = forward(params, cfg, tok[:, None], cache)
        tok = jnp.argmax(lg[:, -1, :], -1).astype(jnp.int32)
    assert int(cache.pos[0]) == 11
    assert np.isfinite(np.asarray(lg, np.float32)).all()


@pytest.mark.parametrize("bits", [2, 3])
def test_hw_gs16_kquant_mapping(bits):
    """group_size=16 on the compiled kernel: the exact Q2_K/Q3_K gguf
    mappings (convert/gguf.q{2,3}_k_to_quantized) produce gs=16 tensors;
    Mosaic lowering must handle the 16-element scale groups."""
    x, qt, oracle = _setup(bits, 4, 512, 256, 16, True)
    got = np.asarray(qgemm_pallas(jnp.asarray(x, jnp.bfloat16), qt,
                                  act="int8", out_dtype=jnp.float32))
    assert nmse(oracle, got) < 5e-4


def test_hw_signed_scales_q3_k():
    """Q3_K carries SIGNED per-group scales (sub = 4*sc); the kernel
    epilogue algebra must be sign-agnostic on hardware."""
    rng = np.random.default_rng(5)
    K, M = 512, 256
    w = rng.standard_normal((K, M)).astype(np.float32)
    wq, s, _ = packing.quantize_weights(w, 3, 16, True)
    s[::2] *= -1.0
    sub = 4.0 * s
    qt = QuantizedTensor.from_quantized(wq, s, sub, bits=3, group_size=16)
    oracle_w = packing.dequantize(wq, s, sub, 16)
    x = rng.standard_normal((4, K)).astype(np.float32)
    got = np.asarray(qgemm_pallas(jnp.asarray(x, jnp.bfloat16), qt,
                                  act="int8", out_dtype=jnp.float32))
    assert nmse(x @ oracle_w, got) < 5e-4


def test_hw_flash_decode_window():
    """Windowed flash-decode on the chip: the static window bound skips
    whole KV blocks (traced loop start) -- validate vs the masked oracle
    with a window crossing block boundaries."""
    rng = np.random.default_rng(9)
    B, KV, rep, D, S, W = 2, 4, 2, 128, 256, 72
    q = rng.standard_normal((B, KV, rep, D)).astype(np.float32)
    k = rng.standard_normal((1, B, KV, S, D)).astype(np.float32)
    v = rng.standard_normal((1, B, KV, S, D)).astype(np.float32)
    lens = np.asarray([200, 40], np.int32)
    from tmac_tpu.ops.pallas.attention_kernel import flash_decode_stacked
    import jax.numpy as jnp
    got = np.asarray(flash_decode_stacked(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(lens), jnp.int32(0),
        blk=64, window=W))
    s = np.einsum("bkrd,bksd->bkrs", q, k[0]) / np.sqrt(D)
    idx = np.arange(S)
    for b in range(B):
        lo = max(0, lens[b] - W)
        s[b][..., (idx >= lens[b]) | (idx < lo)] = -np.inf
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bkrs,bksd->bkrd", p, v[0])
    assert nmse(ref, got) < 2e-3  # bf16 operands
