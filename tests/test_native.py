"""Native (C++) weight pipeline vs the numpy reference implementations.

The C++ kernels (csrc/tmac_native.cc) must be bit-compatible with the
numpy code in ops/packing.py / convert/gptq.py / convert/bitnet.py --
except where float summation order legitimately differs (bitnet absmean),
where we allow f32-noise-level divergence.
"""

import numpy as np
import pytest

from tmac_tpu import native
from tmac_tpu.ops import packing

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built and no g++")


def _np_pack(wq, bits, k_shards):
    # force the numpy path regardless of size thresholds
    p = 8 // bits
    K, M = wq.shape
    ks = K // k_shards
    w = wq.reshape(k_shards, p, ks // p, M)
    out = np.zeros((k_shards, ks // p, M), dtype=np.uint8)
    for j in range(p):
        out |= w[:, j] << (bits * j)
    return out.reshape(K // p, M)


@pytest.mark.parametrize("bits", [1, 2, 4])
@pytest.mark.parametrize("k_shards", [1, 4])
def test_pack_strided_bitexact(bits, k_shards):
    rng = np.random.default_rng(0)
    K, M = 512, 384
    wq = rng.integers(0, 1 << bits, (K, M)).astype(np.uint8)
    got = native.pack_strided(wq, bits, k_shards)
    np.testing.assert_array_equal(got, _np_pack(wq, bits, k_shards))
    # roundtrip through the native unpack
    np.testing.assert_array_equal(native.unpack_strided(got, bits, k_shards), wq)


@pytest.mark.parametrize("bits", [2, 4])
@pytest.mark.parametrize("zero_point", [False, True])
def test_quantize_weights_matches_numpy(bits, zero_point):
    rng = np.random.default_rng(1)
    K, M, gs = 512, 256, 128
    w = rng.standard_normal((K, M)).astype(np.float32)
    # numpy reference (direct, bypassing the native dispatch)
    G = K // gs
    wg = w.reshape(G, gs, M)
    qmax, mid = (1 << bits) - 1, 1 << (bits - 1)
    if zero_point:
        wmin, wmax = wg.min(1), wg.max(1)
        scales = np.maximum(wmax - wmin, 1e-8) / qmax
        wq = np.clip(np.rint((wg - wmin[:, None, :]) / scales[:, None, :]), 0, qmax)
        sub = -wmin
    else:
        amax = np.abs(wg).max(1)
        scales = np.maximum(amax, 1e-8) / mid
        wq = np.clip(np.rint(wg / scales[:, None, :]) + mid, 0, qmax)
        sub = mid * scales
    wq = wq.reshape(K, M).astype(np.uint8)

    nwq, nscales, nsub = native.quantize_weights(w, bits, gs, zero_point)
    np.testing.assert_allclose(nscales, scales.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(nsub, sub.astype(np.float32), rtol=1e-6)
    # quantized codes: identical except possible rint ties at float noise
    mismatch = (nwq != wq).mean()
    assert mismatch < 1e-3, mismatch


@pytest.mark.parametrize("bits", [2, 4])
@pytest.mark.parametrize("v2", [False, True])
def test_gptq_unpack_bitexact(bits, v2):
    from tmac_tpu.convert.gptq import quantize_gptq_like, _unpack_int32_fields
    rng = np.random.default_rng(2)
    K, M, gs = 256, 128, 64
    w = rng.standard_normal((K, M)).astype(np.float32)
    qweight, scales, qzeros = quantize_gptq_like(w, bits, gs)

    ref_wq = _unpack_int32_fields(
        qweight.view(np.uint32).astype(np.int64), bits, axis=0)[:K].astype(np.uint8)
    got_wq = native.unpack_gptq_qweight(qweight, bits)[:K]
    np.testing.assert_array_equal(got_wq, ref_wq)

    ref_zq = _unpack_int32_fields(
        qzeros.view(np.uint32).astype(np.int64), bits, axis=1)[:, :M].astype(np.int64)
    if not v2:
        ref_zq = ref_zq + 1
    got_zq = native.unpack_gptq_qzeros(qzeros, bits, add_one=not v2)[:, :M]
    np.testing.assert_array_equal(got_zq.astype(np.int64), ref_zq)


def test_bitnet_matches_numpy():
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((1024, 512)) * 0.02).astype(np.float32)
    gamma = max(float(np.mean(np.abs(w)).astype(np.float32)), 1e-8)
    ref_wq = (np.clip(np.rint(w / gamma), -1, 1) + 2).astype(np.uint8)
    wq, scales, sub = native.quantize_bitnet(w, k_shards=2)
    assert scales.shape == (2, 512) and sub.shape == (2, 512)
    np.testing.assert_allclose(scales, gamma, rtol=1e-6)
    np.testing.assert_allclose(sub, 2 * gamma, rtol=1e-6)
    assert (wq != ref_wq).mean() < 1e-4  # rint ties under f32-sum-order noise


def test_dispatch_thresholds():
    """packing.pack_strided must produce identical results either side of
    the native-dispatch size threshold."""
    rng = np.random.default_rng(4)
    big = rng.integers(0, 4, (2048, 1024)).astype(np.uint8)  # >= 1 MB -> native
    got = packing.pack_strided(big, 2)
    np.testing.assert_array_equal(got, _np_pack(big, 2, 1))
    np.testing.assert_array_equal(packing.unpack_strided(got, 2), big)
