"""Low-bit weight packing for TPU.

The reference (T-MAC) stores n-bit weights as 4-bit LUT indices permuted
through a 6-level layout (reference python/t_mac/weights.py:5-88) purely so
that ARM NEON / AVX2 `tbl` loads are contiguous.  None of that layout makes
sense on a TPU; the constraint here is instead:

  * HBM traffic must be bits/8 bytes per weight (that is T-MAC's entire
    advantage -- decode is bandwidth-bound),
  * the in-kernel unpack must be cheap VPU work with **no cross-lane data
    movement** (TPU has no byte shuffle across 128 lanes),
  * the unpacked tile must land directly in the (sublane, lane) layout the
    MXU wants.

Layout ("strided field packing"): weights live in kernel layout Wq[k, m]
(K x M, biased-unsigned in [0, 2^bits)).  With p = 8 // bits fields per
byte, the packed array is uint8 of shape (K // p, M):

    packed[r, m] = sum_j Wq[r + j * (K // p), m] << (bits * j)

i.e. field j of packed row r holds the weight for k = r + j*K/p.  Unpacking
field j is one shift + one mask on the whole tile, and the p unpacked
blocks are *contiguous ranges of k* ([j*K/p, (j+1)*K/p)), so activation
slices and per-group scales line up with static slices -- no permutation of
activations, scales, or outputs anywhere.

For tensor-parallel K-sharding (row-parallel layers) the packing is applied
per contiguous K-shard (`k_shards` argument) so that an even split of the
packed rows across `k_shards` devices gives each device exactly the local
packing of its K-chunk.

bits=3 is handled as 2+1: a 2-bit packed array (low planes) plus a 1-bit
packed array (plane 2), recombined in-kernel as v = lo + 4*hi; total
traffic remains 3 bits per weight.  (Reference handles bits=3 with bm
multiples of 192 instead -- a TVM tiling concern we don't have.)
"""

from __future__ import annotations

import numpy as np


def _fields_per_byte(bits: int) -> int:
    # bits=8 is the degenerate case (p=1, packed == raw int8 codes): used
    # for 8-bit tensors like the quantized lm_head, sharing the whole
    # QuantizedTensor/qgemm machinery with zero unpack cost.
    assert bits in (1, 2, 4, 8), f"packing supports bits in (1,2,4,8), got {bits}"
    return 8 // bits


_NATIVE_MIN_SIZE = 1 << 20  # below this numpy is fast enough


def _native():
    """The C++ fast path (tmac_tpu/native.py) or None."""
    from tmac_tpu import native
    return native if native.available() else None


def pack_strided(wq: np.ndarray, bits: int, k_shards: int = 1) -> np.ndarray:
    """Pack (K, M) biased-unsigned weights into (K//p, M) uint8.

    bits=3 packs as two arrays via `pack_b3`; use that entry point instead.
    Large tensors go through the multithreaded C++ kernel (csrc/) when the
    library is available; numpy otherwise (bit-identical).
    """
    p = _fields_per_byte(bits)
    K, M = wq.shape
    assert K % (p * k_shards) == 0, (K, p, k_shards)
    wq = np.asarray(wq, dtype=np.uint8)
    if bits == 8:
        return wq.copy()  # degenerate: packed == codes
    # Validate BEFORE the native dispatch: the C++ packer ORs unmasked
    # shifted bytes, so an out-of-range code would silently corrupt the
    # adjacent bit-field instead of failing loudly like the numpy path.
    assert wq.max(initial=0) < (1 << bits), "weight values exceed bit width"
    if wq.size >= _NATIVE_MIN_SIZE:
        nat = _native()
        if nat is not None:
            return nat.pack_strided(wq, bits, k_shards)
    # (k_shards, Ks, M) -> per-shard strided pack
    ks = K // k_shards
    w = wq.reshape(k_shards, ks, M)
    # (k_shards, p, ks//p, M): field j = block j of the shard's K range
    w = w.reshape(k_shards, p, ks // p, M)
    packed = np.zeros((k_shards, ks // p, M), dtype=np.uint8)
    for j in range(p):
        packed |= w[:, j] << (bits * j)
    return packed.reshape(K // p, M)


def unpack_strided(packed: np.ndarray, bits: int, k_shards: int = 1) -> np.ndarray:
    """Inverse of pack_strided: (K//p, M) uint8 -> (K, M) uint8 values."""
    p = _fields_per_byte(bits)
    KP, M = packed.shape
    assert KP % k_shards == 0
    packed = np.asarray(packed, dtype=np.uint8)
    if bits == 8:
        return packed.copy()
    if packed.size >= _NATIVE_MIN_SIZE // 4:
        nat = _native()
        if nat is not None:
            return nat.unpack_strided(packed, bits, k_shards)
    kps = KP // k_shards
    pk = packed.reshape(k_shards, kps, M)
    mask = (1 << bits) - 1
    blocks = [(pk >> (bits * j)) & mask for j in range(p)]
    w = np.concatenate(blocks, axis=1)  # (k_shards, ks, M)
    return w.reshape(KP * p, M)


def pack_b3(wq: np.ndarray, k_shards: int = 1):
    """Pack 3-bit weights as (2-bit low planes, 1-bit high plane)."""
    assert wq.max(initial=0) < 8
    lo = (wq & 0b11).astype(np.uint8)
    hi = ((wq >> 2) & 0b1).astype(np.uint8)
    return pack_strided(lo, 2, k_shards), pack_strided(hi, 1, k_shards)


def unpack_b3(packed_lo: np.ndarray, packed_hi: np.ndarray, k_shards: int = 1) -> np.ndarray:
    lo = unpack_strided(packed_lo, 2, k_shards)
    hi = unpack_strided(packed_hi, 1, k_shards)
    return (lo + (hi << 2)).astype(np.uint8)


def bitplanes(wq: np.ndarray, bits: int) -> np.ndarray:
    """Split biased-unsigned (K, M) weights into (bits, K, M) 0/1 planes.

    Used by the executable LUT spec (ops/lut.py) and tests; mirrors the
    bit-plane decomposition at reference python/t_mac/weights.py:57.
    """
    wq = np.asarray(wq, dtype=np.uint8)
    return np.stack([(wq >> b) & 1 for b in range(bits)], axis=0)


def group_indices(wq: np.ndarray, bits: int, g: int = 4) -> np.ndarray:
    """Bit-plane LUT indices: (bits, K//g, M) uint8 nibbles.

    Index for plane b at group kg gathers lut[kg, idx] where
    idx = sum_i plane_b[kg*g + i] << i.  This is the T-MAC LUT index
    stream (reference weights.py:60) in unpermuted kernel layout; only the
    pure-JAX spec consumes it (the production kernel uses pack_strided).
    """
    planes = bitplanes(wq, bits)  # (bits, K, M)
    B, K, M = planes.shape
    assert K % g == 0
    pg = planes.reshape(B, K // g, g, M)
    idx = np.zeros((B, K // g, M), dtype=np.uint8)
    for i in range(g):
        idx |= pg[:, :, i, :] << i
    return idx


# ---------------------------------------------------------------------------
# Weight quantization helpers (for tests, benchmarks, and converters).
# ---------------------------------------------------------------------------

def quantize_weights(
    w: np.ndarray,
    bits: int,
    group_size: int,
    zero_point: bool = False,
):
    """Quantize float weights (K, M) to biased-unsigned with per-group scales.

    Returns (wq uint8 (K, M), scales (K//gs, M) f32, sub (K//gs, M) f32)
    under the dequant model  Wdq[k, m] = scales[k//gs, m] * wq[k, m] - sub[k//gs, m].

    Symmetric (zero_point=False): sub = mid * scales (mid = 2^(bits-1)).
    Asymmetric: min/max affine quant, sub = -wmin (folded zero offset).
    """
    K, M = w.shape
    assert K % group_size == 0
    if w.size >= _NATIVE_MIN_SIZE:
        nat = _native()
        if nat is not None:
            return nat.quantize_weights(np.asarray(w, np.float32), bits,
                                        group_size, zero_point)
    G = K // group_size
    wg = w.reshape(G, group_size, M)
    qmax = (1 << bits) - 1
    mid = 1 << (bits - 1)
    if zero_point:
        wmin = wg.min(axis=1)  # (G, M)
        wmax = wg.max(axis=1)
        scales = np.maximum(wmax - wmin, 1e-8) / qmax
        wq = np.clip(np.rint((wg - wmin[:, None, :]) / scales[:, None, :]), 0, qmax)
        sub = -wmin
    else:
        amax = np.abs(wg).max(axis=1)
        scales = np.maximum(amax, 1e-8) / mid
        wq = np.clip(np.rint(wg / scales[:, None, :]) + mid, 0, qmax)
        sub = mid * scales
    return (
        wq.reshape(K, M).astype(np.uint8),
        scales.astype(np.float32),
        sub.astype(np.float32),
    )


def dequantize(wq: np.ndarray, scales: np.ndarray, sub: np.ndarray, group_size: int) -> np.ndarray:
    """Dequant oracle: Wdq = scales * wq - sub (per k-group)."""
    K, M = wq.shape
    G = K // group_size
    wq = wq.reshape(G, group_size, M).astype(np.float32)
    return (scales[:, None, :] * wq - sub[:, None, :]).reshape(K, M)
