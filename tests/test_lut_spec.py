"""The executable LUT spec must match the dequant-GEMM oracle.

This is the framework's version of the reference's central invariant:
LUT-mpGEMM output ~= dequant-GEMM output within NMSE 5e-4
(reference python/t_mac/ops/qgemm.py:277-282, tests/test_e2e.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.ops import lut, packing
from tmac_tpu.utils import nmse

NMSE_GATE = 5e-4  # reference ops/qgemm.py:278


def test_lut_mirror_symmetry():
    """lut[c] == -lut[2^g-1-c] (reference lut_ctor.cc:50-71 trick)."""
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    t = np.asarray(lut.build_lut(b))
    np.testing.assert_allclose(t, -t[..., ::-1], rtol=1e-6)


def test_lut_entries():
    """lut[k, c] = sum_j sign_j(c) * b[4k+j]."""
    rng = np.random.default_rng(1)
    b = rng.standard_normal((1, 8)).astype(np.float32)
    t = np.asarray(lut.build_lut(jnp.asarray(b)))
    for k in range(2):
        for c in range(16):
            signs = [(2 * ((c >> j) & 1) - 1) for j in range(4)]
            want = sum(s * b[0, 4 * k + j] for j, s in enumerate(signs))
            assert abs(t[0, k, c] - want) < 1e-5


def test_quantize_lut_bias_is_neg_group_sum():
    rng = np.random.default_rng(2)
    ags = 64
    b = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
    t = lut.build_lut(b)
    _, _, biases = lut.quantize_lut(t, ags)
    want = -np.asarray(b).reshape(2, 256 // ags, ags).sum(-1)
    np.testing.assert_allclose(np.asarray(biases), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bits", [1, 2, 3, 4])
@pytest.mark.parametrize("zero_point", [False, True])
def test_lut_gemm_vs_dequant_oracle(bits, zero_point):
    rng = np.random.default_rng(bits * 10 + zero_point)
    N, K, M, gs, ags = 2, 512, 128, 128, 64
    w = rng.standard_normal((K, M)).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)

    wq, scales, sub = packing.quantize_weights(w, bits, gs, zero_point)
    wdq = packing.dequantize(wq, scales, sub, gs)
    oracle = x @ wdq

    qlut, lut_scales, lut_biases = lut.lut_ctor(jnp.asarray(x), ags)
    idx = packing.group_indices(wq, bits)
    got = lut.lut_gemm_spec(
        qlut, lut_scales, lut_biases, idx,
        jnp.asarray(scales), jnp.asarray(sub),
        bits=bits, group_size=gs, act_group_size=ags,
    )
    err = nmse(oracle, np.asarray(got))
    assert err <= NMSE_GATE, f"NMSE {err} vs oracle"


def test_lut_gemm_bitnet_per_tensor():
    """m_groups=1 / per-tensor scale path (BitNet, group_size == K)."""
    rng = np.random.default_rng(42)
    N, K, M = 1, 256, 128
    # ternary weights in {-1, 0, 1}, stored biased {0, 1, 2} with bits=2
    wt = rng.integers(-1, 2, (K, M)).astype(np.float32)
    s = 0.37
    wq = (wt + 2).astype(np.uint8)  # biased by mid=2
    scales = np.full((1, M), s, np.float32)
    sub = np.full((1, M), 2 * s, np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)
    oracle = x @ (wt * s)

    qlut, lut_scales, lut_biases = lut.lut_ctor(jnp.asarray(x), 64)
    idx = packing.group_indices(wq, 2)
    got = lut.lut_gemm_spec(
        qlut, lut_scales, lut_biases, idx,
        jnp.asarray(scales), jnp.asarray(sub),
        bits=2, group_size=K, act_group_size=64,
    )
    assert nmse(oracle, np.asarray(got)) <= NMSE_GATE


def test_halving_add_tree_semantics():
    """vrhaddq_s8 pairwise tree: value ~= sum/2^n with positive rounding
    bias in [0, 2^n-1] scaled (reference tests/test_halving_adder.cc)."""
    from tmac_tpu.ops.lut import halving_add_tree
    rng = np.random.default_rng(0)
    vals = rng.integers(-100, 100, (5, 16)).astype(np.int32)
    got = np.asarray(halving_add_tree(jnp.asarray(vals), axis=1))
    exact = vals.sum(1) / 16.0
    # halving tree = sum/16 + rounding bias of up to +0.5 per level (4
    # levels for 16 elements; cf. reference test_halving_adder.cc:117-127,
    # whose x16 comparison shows the same bounded drift)
    assert (np.abs(got - exact) <= 2.0).all()
    assert (got - exact >= -0.5).all()  # bias is one-sided (round-half-up)


def test_fast_aggregation_correction_reference_semantics():
    from tmac_tpu.ops.lut import fast_aggregation_correction
    s = jnp.asarray([[2.0]])
    b = jnp.asarray([[10.0]])
    s2, b2 = fast_aggregation_correction(s, b, act_k=16, bits=2)
    # ActK=16: log2=4, 4//4=1, bias_scale(2)=3 -> b' = 10 - 32*3
    np.testing.assert_allclose(np.asarray(s2), [[32.0]])
    np.testing.assert_allclose(np.asarray(b2), [[10.0 - 32.0 * 3]])
    # ActK=8: integer division log2(8)//4 = 0 -> bias unchanged
    s3, b3 = fast_aggregation_correction(s, b, act_k=8, bits=2)
    np.testing.assert_allclose(np.asarray(s3), [[16.0]])
    np.testing.assert_allclose(np.asarray(b3), [[10.0]])


@pytest.mark.parametrize("bits", [2, 4])
def test_fast_aggregation_accuracy_delta(bits):
    """Quantified -fa accuracy trade-off (reference README.md:50 claims
    +10-20% CPU speed for 'nonnegligible error'): the halving-add tree with
    the closed-form correction must stay within ~20x of the exact path's
    NMSE but measurably worse -- the documented reason -fa defaults OFF
    here (TPU int32 MXU accumulation is free, so -fa has no speed upside)."""
    rng = np.random.default_rng(77 + bits)
    N, K, M, gs = 4, 512, 128, 64
    ags = gs  # aligned groups; gpa = 16 tables -> correction term active
    w = rng.standard_normal((K, M)).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)
    wq, scales, sub = packing.quantize_weights(w, bits, gs, True)
    oracle = x @ packing.dequantize(wq, scales, sub, gs)

    qlut, lut_scales, lut_biases = lut.lut_ctor(jnp.asarray(x), ags)
    idx = packing.group_indices(wq, bits)
    args = (qlut, lut_scales, lut_biases, idx,
            jnp.asarray(scales), jnp.asarray(sub))
    kw = dict(bits=bits, group_size=gs, act_group_size=ags)
    exact = np.asarray(lut.lut_gemm_spec(*args, **kw))
    fa = np.asarray(lut.lut_gemm_spec(*args, fast_aggregation=True, **kw))
    e_exact = nmse(oracle, exact)
    e_fa = nmse(oracle, fa)
    # exact path obeys the reference gate; fa degrades but bounded
    assert e_exact <= NMSE_GATE
    assert e_fa > e_exact, "fa should be measurably lossier"
    assert e_fa < 50 * NMSE_GATE, f"fa error out of envelope: {e_fa}"
