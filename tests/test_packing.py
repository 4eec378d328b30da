"""Packing layout round-trips and quantization oracle sanity."""

import numpy as np
import pytest

from tmac_tpu.ops import packing


@pytest.mark.parametrize("bits", [1, 2, 4])
@pytest.mark.parametrize("k_shards", [1, 2, 4])
def test_pack_roundtrip(bits, k_shards):
    rng = np.random.default_rng(0)
    K, M = 256, 128
    wq = rng.integers(0, 1 << bits, (K, M)).astype(np.uint8)
    packed = packing.pack_strided(wq, bits, k_shards)
    assert packed.shape == (K // (8 // bits), M)
    out = packing.unpack_strided(packed, bits, k_shards)
    np.testing.assert_array_equal(out, wq)


def test_pack_b3_roundtrip():
    rng = np.random.default_rng(1)
    K, M = 256, 128
    wq = rng.integers(0, 8, (K, M)).astype(np.uint8)
    lo, hi = packing.pack_b3(wq)
    assert lo.shape == (K // 4, M) and hi.shape == (K // 8, M)
    np.testing.assert_array_equal(packing.unpack_b3(lo, hi), wq)


def test_shard_locality():
    """Row-sharding the packed array must equal per-shard local packing."""
    rng = np.random.default_rng(2)
    K, M, bits, shards = 512, 128, 2, 4
    wq = rng.integers(0, 4, (K, M)).astype(np.uint8)
    packed = packing.pack_strided(wq, bits, k_shards=shards)
    rows = packed.shape[0] // shards
    for s in range(shards):
        local = packed[s * rows:(s + 1) * rows]
        local_ref = packing.pack_strided(
            wq[s * (K // shards):(s + 1) * (K // shards)], bits
        )
        np.testing.assert_array_equal(local, local_ref)


@pytest.mark.parametrize("bits", [2, 4])
@pytest.mark.parametrize("zero_point", [False, True])
def test_quantize_dequantize_error(bits, zero_point):
    rng = np.random.default_rng(3)
    K, M, gs = 512, 128, 128
    w = rng.standard_normal((K, M)).astype(np.float32)
    wq, scales, sub = packing.quantize_weights(w, bits, gs, zero_point)
    wdq = packing.dequantize(wq, scales, sub, gs)
    step = np.repeat(scales, gs, axis=0)
    if zero_point:
        # affine quant: error bounded by half a step per element
        assert np.all(np.abs(wdq - w) <= 0.5 * step + 1e-5)
    else:
        # symmetric quant clips +amax to the top code (range is -mid..mid-1)
        assert np.all(np.abs(wdq - w) <= 1.0 * step + 1e-5)


def test_group_indices_match_bitplanes():
    rng = np.random.default_rng(4)
    K, M, bits = 64, 32, 4
    wq = rng.integers(0, 16, (K, M)).astype(np.uint8)
    idx = packing.group_indices(wq, bits, g=4)
    planes = packing.bitplanes(wq, bits)
    for b in range(bits):
        for kg in range(K // 4):
            want = sum(planes[b, kg * 4 + i] << i for i in range(4))
            np.testing.assert_array_equal(idx[b, kg], want.astype(np.uint8))
