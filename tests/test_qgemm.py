"""qgemm implementations (XLA and Pallas-interpret) vs the dequant oracle
and vs each other. The Pallas kernel runs in interpreter mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.ops import packing
from tmac_tpu.ops.qgemm import QuantizedTensor, qgemm_xla, dequant_baseline_matmul
from tmac_tpu.ops.pallas.qgemm_kernel import qgemm_pallas
from tmac_tpu.utils import nmse


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
def test_qgemm_xla_exact(bits, zero_point):
    x, qt, oracle = _setup(bits, 3, 512, 128, 128, zero_point)
    got = np.asarray(qgemm_xla(jnp.asarray(x), qt))
    np.testing.assert_allclose(got, oracle, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("bits", [1, 2, 4])
@pytest.mark.parametrize("zero_point", [False, True])
def test_qgemm_pallas_matches_oracle(bits, zero_point):
    x, qt, oracle = _setup(bits, 2, 512, 256, 128, zero_point)
    got = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True, act="native"))
    assert nmse(oracle, got) < 1e-8


@pytest.mark.parametrize("bits", [1, 2, 4])
def test_qgemm_pallas_int8_act_gate(bits):
    """Default act=int8 group quantization stays within the reference\n    accuracy gate (NMSE <= 5e-4, reference ops/qgemm.py:278)."""
    x, qt, oracle = _setup(bits, 2, 512, 256, 128, True)
    got = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True, act="int8"))
    assert nmse(oracle, got) < 5e-4


def test_qgemm_pallas_b3():
    x, qt, oracle = _setup(3, 2, 512, 256, 128, False)
    got = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True, act="native"))
    assert nmse(oracle, got) < 1e-8


def test_qgemm_pallas_unpadded_m():
    """M not a lane multiple gets padded internally and sliced back."""
    x, qt, oracle = _setup(2, 2, 256, 200, 64, False)
    assert qt.mdim_padded == 256
    got = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True, act="native"))
    assert got.shape == (2, 200)
    assert nmse(oracle, got) < 1e-8


def test_qgemm_pallas_int8_per_tensor_exact():
    """BitNet path: int8 activations, per-tensor scale, int32 accumulation
    must be bit-exact vs integer oracle."""
    rng = np.random.default_rng(7)
    N, K, M = 2, 512, 256
    wq = rng.integers(0, 3, (K, M)).astype(np.uint8)  # ternary biased at 2... mid=2 for bits=2
    s = np.float32(0.11)
    scales = np.full((1, M), s, np.float32)
    sub = np.full((1, M), 2 * s, np.float32)
    qt = QuantizedTensor.from_quantized(wq, scales, sub, bits=2, group_size=K)
    x = rng.integers(-127, 128, (N, K)).astype(np.int8)
    oracle = (x.astype(np.int64) @ (wq.astype(np.int64) - 2)).astype(np.float32) * s
    got = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True))
    # int32 accumulation is exact; the only difference vs the oracle is the
    # order of the two f32 scale multiplies in the epilogue
    np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-3)


def test_qgemm_pallas_int8_grouped():
    rng = np.random.default_rng(8)
    N, K, M, gs, bits = 2, 512, 256, 128, 4
    wq = rng.integers(0, 16, (K, M)).astype(np.uint8)
    scales = (rng.standard_normal((K // gs, M)).astype(np.float32) * 0.01 + 0.05)
    sub = 8 * scales
    qt = QuantizedTensor.from_quantized(wq, scales, sub, bits, gs)
    x = rng.integers(-64, 64, (N, K)).astype(np.int8)
    wdq = packing.dequantize(wq, scales, sub, gs)
    oracle = x.astype(np.float32) @ wdq
    got = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True))
    assert nmse(oracle, got) < 1e-9


def test_xla_matches_pallas_bf16():
    x, qt, _ = _setup(2, 2, 512, 256, 128, True)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    a = np.asarray(qgemm_xla(xb, qt, out_dtype=jnp.float32))
    b = np.asarray(qgemm_pallas(xb, qt, out_dtype=jnp.float32, interpret=True, act="native"))
    assert nmse(a, b) < 1e-4


def test_dequant_baseline_agrees():
    x, qt, oracle = _setup(4, 2, 512, 128, 128, False)
    w_int8 = np.asarray(qt.unpack())[:, :128]
    got = np.asarray(dequant_baseline_matmul(
        jnp.asarray(x), jnp.asarray(w_int8), qt.scales[:, :128], qt.sub[:, :128], 128))
    np.testing.assert_allclose(got, oracle, rtol=2e-4, atol=2e-4)


def test_fuse_m_matches_individual():
    """qgemm on a fused tensor == concatenated individual qgemms, with and
    without m-sharding (the fused-QKV path in models/llama.py)."""
    from tmac_tpu.ops.qgemm import fuse_m
    rng = np.random.default_rng(11)
    K, gs, bits = 512, 128, 2
    Ms = [256, 192, 192]   # 192 forces per-shard lane padding at m_shards=2
    x = rng.standard_normal((2, K)).astype(np.float32)
    for m_shards in (1, 2):
        qts, outs = [], []
        for i, M in enumerate(Ms):
            w = rng.standard_normal((K, M)).astype(np.float32)
            wq, scales, sub = packing.quantize_weights(w, bits, gs, True)
            qt = QuantizedTensor.from_quantized(wq, scales, sub, bits, gs,
                                                m_shards=m_shards)
            qts.append(qt)
            outs.append(np.asarray(qgemm_xla(jnp.asarray(x), qt)))
        fused = fuse_m(qts)
        assert fused.mdim == sum(Ms)
        got = np.asarray(qgemm_xla(jnp.asarray(x), fused))
        # accumulation order differs between the fused and per-component
        # einsums -> float noise only
        np.testing.assert_allclose(got, np.concatenate(outs, axis=1),
                                   rtol=1e-4, atol=1e-4)
        # pallas path too
        gp = np.asarray(qgemm_pallas(jnp.asarray(x), fused, interpret=True,
                                     act="native"))
        np.testing.assert_allclose(gp, np.concatenate(outs, axis=1),
                                   rtol=2e-3, atol=2e-3)


def test_fuse_m_localized_splits_per_shard():
    """localized(tp, axis=1) of a fused tensor: each shard's slice_m output
    is [q_s | k_s | v_s] at local widths."""
    from tmac_tpu.ops.qgemm import fuse_m
    import dataclasses as dc
    rng = np.random.default_rng(12)
    K, gs, bits, tp = 256, 128, 2, 2
    Ms = [256, 128, 128]
    qts = []
    for M in Ms:
        w = rng.standard_normal((K, M)).astype(np.float32)
        wq, scales, sub = packing.quantize_weights(w, bits, gs, False)
        qts.append(QuantizedTensor.from_quantized(wq, scales, sub, bits, gs,
                                                  m_shards=tp))
    fused = fuse_m(qts)
    x = rng.standard_normal((1, K)).astype(np.float32)
    full = np.asarray(qgemm_xla(jnp.asarray(x), fused))  # (1, sum Ms)

    # simulate the shard_map local view: slice the packed arrays by hand
    loc = fused.localized(tp, axis=1)
    for s in range(tp):
        def half(a):
            w = a.shape[1] // tp
            return jnp.asarray(np.asarray(a)[:, s * w:(s + 1) * w])
        lqt = dc.replace(loc, packed=half(fused.packed), scales=half(fused.scales),
                         sub=half(fused.sub))
        got = np.asarray(qgemm_xla(jnp.asarray(x), lqt))  # (1, sum Ms / tp)
        # expected: per-component local slices concatenated
        exp, off = [], 0
        for M in Ms:
            m_loc = M // tp
            exp.append(full[:, off + s * m_loc: off + (s + 1) * m_loc])
            off += M
        np.testing.assert_allclose(got, np.concatenate(exp, axis=1),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gs", [512, 128])
def test_qgemm_bits8(gs):
    """bits=8 (quantized lm_head path): signed-code storage, near-exact."""
    rng = np.random.default_rng(13)
    N, K, M = 2, 512, 256
    w = rng.standard_normal((K, M)).astype(np.float32) * 0.02
    wq, scales, sub = packing.quantize_weights(w, 8, gs, False)
    wdq = packing.dequantize(wq, scales, sub, gs)
    qt = QuantizedTensor.from_quantized(wq, scales, sub, 8, gs)
    x = rng.standard_normal((N, K)).astype(np.float32)
    oracle = x @ wdq
    got = np.asarray(qgemm_xla(jnp.asarray(x), qt))
    np.testing.assert_allclose(got, oracle, rtol=2e-4, atol=2e-4)
    gp = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True, act="native"))
    assert nmse(oracle, gp) < 1e-8
    # int8-activation grouped path (what the decode head uses)
    gq = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True, act="int8"))
    assert nmse(oracle, gq) < 5e-4
    # unpack returns the signed codes
    np.testing.assert_array_equal(
        np.asarray(qt.unpack()), (wq.astype(np.int16) - 128).astype(np.int8))


def test_qgemm_pallas_fused_act_quant():
    """act='fused' (in-kernel per-token quantization, per-tensor scale)
    must match the XLA-prologue int8 path and the dequant oracle."""
    rng = np.random.default_rng(21)
    N, K, M = 3, 512, 256
    wq = rng.integers(1, 4, (K, M)).astype(np.uint8)  # ternary {1,2,3}
    s = np.full((1, M), 0.07, np.float32)
    qt = QuantizedTensor.from_quantized(wq, s, 2 * s, bits=2, group_size=K)
    x = (rng.standard_normal((N, K)) * 0.5).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)

    got = np.asarray(qgemm_pallas(xb, qt, interpret=True, act="fused",
                                  out_dtype=jnp.float32))

    # external-prologue reference (same quantization recipe)
    xf = np.asarray(xb, np.float32)
    scale = np.maximum(np.abs(xf).max(1, keepdims=True), 1e-20) / 127.0
    xq = np.clip(np.rint(xf / scale), -127, 127)
    oracle = (xq @ (wq.astype(np.float64) - 2)).astype(np.float32) * (s[0] * scale)
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-3)


def test_qgemm_pallas_fused_grouped():
    """act='fused' with grouped scales (G > 1): in-kernel per-group
    quantization matches the external-prologue int8 path."""
    rng = np.random.default_rng(22)
    N, K, M, gs, bits = 2, 512, 256, 128, 2
    w = rng.standard_normal((K, M)).astype(np.float32)
    wq, scales, sub = packing.quantize_weights(w, bits, gs, True)
    qt = QuantizedTensor.from_quantized(wq, scales, sub, bits, gs)
    x = (rng.standard_normal((N, K)) * 0.5).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    fused = np.asarray(qgemm_pallas(xb, qt, interpret=True, act="fused",
                                    out_dtype=jnp.float32))
    pro = np.asarray(qgemm_pallas(xb, qt, interpret=True, act="int8",
                                  out_dtype=jnp.float32))
    assert nmse(pro, fused) < 1e-9
    # and within the reference accuracy gate vs the dequant oracle
    wdq = packing.dequantize(wq, scales, sub, gs)
    oracle = np.asarray(xb, np.float32) @ wdq
    assert nmse(oracle, fused) < 5e-4


def test_pick_block_m_vmem_budget():
    """N-aware budget caps the block; tiny-N decode shapes are unaffected."""
    from tmac_tpu.ops.pallas.qgemm_kernel import _pick_block_m
    # decode (N=1): budget not binding, 2 MB packed rule decides
    assert _pick_block_m(9600, 800) == _pick_block_m(9600, 800, 0, 2 * 800 + 8, (13 << 20))
    # large-N: per_bm dominated by N*4 output rows -> small blocks
    per_bm = 2 * (2160 + 256 * 4)
    bm = _pick_block_m(3200, 2160, 0, per_bm, (13 << 20) - 2 * 256 * 8640 * 2 - 256 * 8640)
    assert bm * per_bm <= (13 << 20)
    assert bm >= 128 and 3200 % bm == 0


def test_qgemm_pallas_single_dot_large_n():
    """The large-N per-tensor path (unpack-to-scratch + one dot) must match
    the small-N chunked path and the oracle."""
    rng = np.random.default_rng(30)
    K, M = 512, 256
    wq = rng.integers(1, 4, (K, M)).astype(np.uint8)
    s = np.full((1, M), 0.05, np.float32)
    qt = QuantizedTensor.from_quantized(wq, s, 2 * s, bits=2, group_size=K)
    x = rng.integers(-127, 128, (64, K)).astype(np.int8)  # N=64 -> single_dot
    oracle = (x.astype(np.int64) @ (wq.astype(np.int64) - 2)).astype(np.float32) * s[0]
    got = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True,
                                  out_dtype=jnp.float32))
    np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-3)
    # fused float path at large N too
    xb = jnp.asarray(x.astype(np.float32) / 127.0, jnp.bfloat16)
    gf = np.asarray(qgemm_pallas(xb, qt, interpret=True, act="fused",
                                 out_dtype=jnp.float32))
    small = np.asarray(qgemm_pallas(xb[:2], qt, interpret=True, act="fused",
                                    out_dtype=jnp.float32))
    np.testing.assert_allclose(gf[:2], small, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bits", [1, 2, 3, 4])
@pytest.mark.parametrize("zero_point", [False, True])
def test_qgemm_pallas_dequant_dot_large_n(bits, zero_point):
    """Grouped float acts at N >= 64, act='auto': the bf16 dequant-dot path
    (scale AND zero-offset folded into the bf16 scratch, one MXU dot),
    within bf16 rounding of the dequant oracle.  act='native' keeps its
    exactness contract at EVERY N -- it pins the chunked f32-scale path and
    is never rerouted through bf16-rounded weights (round-2 advisor fix)."""
    x, qt, oracle = _setup(bits, 128, 512, 256, 32, zero_point)
    # act='auto' at N >= 3*gs (the dispatch heuristic) routes large-N
    # grouped floats to the bf16 dequant-dot path -- not through int8 quant
    auto = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True,
                                   act="auto"))
    assert nmse(oracle, auto) < 5e-5  # bf16 weight rounding only
    # native: exact w.r.t. the dequant model, even at large N
    got = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True,
                                  act="native"))
    assert nmse(oracle, got) < 1e-8
    # explicit dispatch forces each path regardless of the heuristic
    chunk = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True,
                                    act="auto", dispatch="chunk"))
    assert nmse(oracle, chunk) < 5e-4  # int8 act quant gate
    assert not np.array_equal(chunk, auto)
    # consistency with the small-N chunk path on the same rows (both exact)
    small = np.asarray(qgemm_pallas(jnp.asarray(x[:2]), qt, interpret=True,
                                    act="native"))
    np.testing.assert_allclose(small, got[:2], rtol=1e-6, atol=1e-5)


def test_act_group_size_production_paths():
    """Independent act_group_size (reference -ags knob): finer act groups
    on the chunked int8 paths reduce activation quant error and stay
    within the accuracy gate; fused and external paths agree."""
    x, qt, oracle = _setup(2, 2, 512, 256, 128, True, seed=11)
    e_default = nmse(oracle, np.asarray(qgemm_pallas(
        jnp.asarray(x), qt, interpret=True, act="int8")))
    e_fine = nmse(oracle, np.asarray(qgemm_pallas(
        jnp.asarray(x), qt, interpret=True, act="int8", act_group_size=32)))
    assert e_fine < 5e-4 and e_default < 5e-4
    assert e_fine <= e_default * 1.5  # typically strictly better
    # fused prologue honors it too
    xb = jnp.asarray(x, jnp.bfloat16)
    f_fine = np.asarray(qgemm_pallas(xb, qt, interpret=True, act="fused",
                                     out_dtype=jnp.float32,
                                     act_group_size=32))
    assert nmse(oracle, f_fine) < 5e-4
    # invalid values (not dividing gs / coarser than gs) are ignored
    same = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True,
                                   act="int8", act_group_size=96))
    base = np.asarray(qgemm_pallas(jnp.asarray(x), qt, interpret=True,
                                   act="int8"))
    np.testing.assert_array_equal(same, base)


def test_dequant_dot_tuned_dispatch(tmp_path, monkeypatch):
    """A tuned dispatch entry overrides the heuristic for fused grouped
    large-N calls (the kcfg analog extended to path choice)."""
    import json
    from tmac_tpu.ops.pallas import tune_table
    x, qt, oracle = _setup(2, 128, 512, 256, 128, True)  # N=128 < 3*gs
    xb = jnp.asarray(x, jnp.bfloat16)
    # default heuristic -> chunk; force dequant via a table entry
    base = np.asarray(qgemm_pallas(xb, qt, interpret=True, act="fused",
                                   out_dtype=jnp.float32))
    deq = np.asarray(qgemm_pallas(xb, qt, interpret=True, act="fused",
                                  out_dtype=jnp.float32, dispatch="dequant"))
    assert not np.array_equal(base, deq)  # different numerics -> different path
    tab = str(tmp_path / "tune.json")
    key = tune_table.key(2, qt.kdim_padded, qt.mdim_padded, 128, 128,
                         "dispatch-fused")
    with open(tab, "w") as f:
        json.dump({"cpu_unknown": {key: {"block_m": 0, "us": 1.0,
                                         "path": "dequant"}}}, f)
    monkeypatch.setenv("TMAC_TUNE_TABLE", tab)
    monkeypatch.setattr(tune_table, "_device_kind", "cpu_unknown")
    tune_table.invalidate_cache()
    try:
        tuned = np.asarray(qgemm_pallas(xb, qt, interpret=True, act="fused",
                                        out_dtype=jnp.float32))
        np.testing.assert_array_equal(tuned, deq)
    finally:
        tune_table.invalidate_cache()


def test_qgemm_pallas_dequant_dot_fused_prologue():
    """act='fused' grouped at large N: the prologue only applies norm/glu
    (activations stay bf16); output must match norm-outside + native path."""
    rng = np.random.default_rng(33)
    K, M, gs, N = 512, 256, 128, 128
    w = rng.standard_normal((K, M)).astype(np.float32)
    wq, scales, sub = packing.quantize_weights(w, 2, gs, True)
    wdq = packing.dequantize(wq, scales, sub, gs)
    qt = QuantizedTensor.from_quantized(wq, scales, sub, 2, gs)
    x = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)
    w_n = jnp.asarray(1.0 + 0.1 * rng.standard_normal(K), jnp.bfloat16)
    eps = 1e-5
    fused = np.asarray(qgemm_pallas(x, qt, interpret=True, act="fused",
                                    out_dtype=jnp.float32, norm=(w_n, eps),
                                    dispatch="dequant"))
    xf = np.asarray(x, np.float32)
    var = np.mean(xf ** 2, axis=1, keepdims=True)
    xn = xf / np.sqrt(var + eps) * np.asarray(w_n, np.float32)
    oracle = xn @ wdq
    assert nmse(oracle, fused) < 5e-5
    # glu fold at large N
    gu = jnp.asarray(rng.standard_normal((N, 2 * K)), jnp.bfloat16)
    fg = np.asarray(qgemm_pallas(gu, qt, interpret=True, act="fused",
                                 out_dtype=jnp.float32, glu=True,
                                 dispatch="dequant"))
    guf = np.asarray(gu, np.float32)
    prod = guf[:, :K] / (1 + np.exp(-guf[:, :K])) * guf[:, K:]
    assert nmse(prod @ wdq, fg) < 5e-5


def test_qgemm_fused_norm_matches_external():
    """rms_norm folded into the fused prologue == norm outside + fused,
    including K padding (variance over logical K only)."""
    rng = np.random.default_rng(31)
    K, M = 500, 256  # K pads to 512 -> exercises the logical-K variance
    wq = rng.integers(1, 4, (K, M)).astype(np.uint8)
    s = np.full((1, M), 0.05, np.float32)
    qt = QuantizedTensor.from_quantized(wq, s, 2 * s, bits=2, group_size=K)
    x = jnp.asarray(rng.standard_normal((2, K)), jnp.bfloat16)
    w_n = jnp.asarray(1.0 + 0.1 * rng.standard_normal(K), jnp.bfloat16)
    eps = 1e-5
    fused = np.asarray(qgemm_pallas(x, qt, interpret=True, act="fused",
                                    out_dtype=jnp.float32, norm=(w_n, eps)))
    xf = np.asarray(x, np.float32)
    var = np.mean(xf ** 2, axis=1, keepdims=True)
    xn = jnp.asarray(xf / np.sqrt(var + eps) * np.asarray(w_n, np.float32),
                     jnp.bfloat16)
    ref = np.asarray(qgemm_pallas(xn, qt, interpret=True, act="fused",
                                  out_dtype=jnp.float32))
    # the folded path normalizes in f32 from the bf16 input (no bf16
    # round-trip of the normalized activations) -> tiny quantization-code
    # differences possible
    assert nmse(ref, fused) < 1e-4


def test_qgemm_fused_glu_matches_external():
    """SwiGLU folded into the fused prologue == silu outside + fused."""
    rng = np.random.default_rng(32)
    K, M = 512, 256
    wq = rng.integers(1, 4, (K, M)).astype(np.uint8)
    s = np.full((1, M), 0.05, np.float32)
    qt = QuantizedTensor.from_quantized(wq, s, 2 * s, bits=2, group_size=K)
    gu = rng.standard_normal((2, 2 * K)).astype(np.float32)
    gub = jnp.asarray(gu, jnp.bfloat16)
    fused = np.asarray(qgemm_pallas(gub, qt, interpret=True, act="fused",
                                    out_dtype=jnp.float32, glu=True))
    gf = np.asarray(gub, np.float32)
    prod = jnp.asarray(gf[:, :K] / (1 + np.exp(-gf[:, :K])) * gf[:, K:],
                       jnp.bfloat16)
    ref = np.asarray(qgemm_pallas(prod, qt, interpret=True, act="fused",
                                  out_dtype=jnp.float32))
    # kernel keeps the product in f32 (no bf16 round-trip) -> small
    # quantization-code noise only
    assert nmse(ref, fused) < 1e-4
