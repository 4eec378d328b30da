"""Public mpGEMM op: quantized-weight matmul without HBM dequantization.

The TPU analog of the reference's generated `qgemm_lut` kernels + the
`TMACGeMMWrapper` dispatcher (reference include/t-mac/tmac_gemm_wrapper.h).
Weights travel HBM -> VMEM as packed bit-fields (bits/8 bytes each); the
unpack + scale math happens on-chip.

Three implementations, all computing C = x @ Wdq with
Wdq[k, m] = scales[k//gs, m] * wq[k, m] - sub[k//gs, m]:

  * "pallas"  -- production kernel (ops/pallas/qgemm_kernel.py)
  * "xla"     -- pure-jnp unpack + grouped matmul (baseline / fallback;
                 also the "dequant-based XLA baseline" bench comparator)
  * "spec"    -- the LUT executable spec (ops/lut.py), test oracle only
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tmac_tpu.ops import packing
from tmac_tpu.utils import round_up


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["packed", "packed_hi", "scales", "sub"],
    meta_fields=["bits", "group_size", "k_shards", "shape"],
)
@dataclasses.dataclass
class QuantizedTensor:
    """A low-bit quantized weight matrix in TPU packed layout.

    packed:    uint8 (K//p, M_pad)  strided bit-field packing (ops/packing.py);
               for bits=3 this is the 2-bit low-plane array
    packed_hi: uint8 (K//8, M_pad)  1-bit high plane, bits=3 only, else None
    scales:    (G, M_pad)           per-k-group scales, G = K // group_size
    sub:       (G, M_pad)           zero offsets: Wdq = scales*wq - sub
    bits:      1 | 2 | 3 | 4
    group_size: k elements per scale group (== K for per-tensor / BitNet)
    k_shards:  packing shard count along K (for row-parallel sharding)
    shape:     logical (K, M) before lane padding

    Replaces the reference's kcfg.ini + permuted-blob contract
    (deploy/compile.py:156-165, python/t_mac/weights.py:73-88).
    """

    packed: jax.Array
    packed_hi: Optional[jax.Array]
    scales: jax.Array
    sub: jax.Array
    bits: int
    group_size: int
    k_shards: int
    shape: tuple

    @property
    def kdim(self) -> int:
        return self.shape[0]

    @property
    def mdim(self) -> int:
        return self.shape[1]

    @property
    def mdim_padded(self) -> int:
        return self.packed.shape[1]

    @property
    def bytes_per_weight(self) -> float:
        nb = self.packed.size + (self.packed_hi.size if self.packed_hi is not None else 0)
        nb += self.scales.size * self.scales.dtype.itemsize
        nb += self.sub.size * self.sub.dtype.itemsize
        return nb / (self.kdim * self.mdim_padded)

    @classmethod
    def from_quantized(
        cls,
        wq: np.ndarray,
        scales: np.ndarray,
        sub: np.ndarray,
        bits: int,
        group_size: int,
        k_shards: int = 1,
        scale_dtype=jnp.float32,
        device_put: bool = True,
    ) -> "QuantizedTensor":
        """Pack biased-unsigned (K, M) weights + (G, M) scales/sub."""
        K, M = wq.shape
        assert scales.shape == (K // group_size, M), (scales.shape, K, group_size, M)
        mpad = round_up(M, 128)
        if mpad != M:
            wq = np.pad(wq, ((0, 0), (0, mpad - M)))
            scales = np.pad(scales, ((0, 0), (0, mpad - M)))
            sub = np.pad(sub, ((0, 0), (0, mpad - M)))
        if bits == 3:
            lo, hi = packing.pack_b3(wq, k_shards)
        else:
            lo, hi = packing.pack_strided(wq, bits, k_shards), None
        arrs = dict(
            packed=lo,
            packed_hi=hi,
            scales=scales.astype(scale_dtype),
            sub=sub.astype(scale_dtype),
        )
        if device_put:
            arrs = {k: (jnp.asarray(v) if v is not None else None) for k, v in arrs.items()}
        return cls(
            **arrs,
            bits=bits,
            group_size=group_size,
            k_shards=k_shards,
            shape=(K, M),
        )

    @classmethod
    def from_float(
        cls,
        w: np.ndarray,
        bits: int,
        group_size: Optional[int] = None,
        zero_point: bool = False,
        k_shards: int = 1,
        **kw,
    ) -> "QuantizedTensor":
        """Quantize float (K, M) weights and pack (testing / on-the-fly quant)."""
        K, M = w.shape
        group_size = group_size or K
        wq, scales, sub = packing.quantize_weights(np.asarray(w), bits, group_size, zero_point)
        return cls.from_quantized(wq, scales, sub, bits, group_size, k_shards, **kw)

    def unpack(self) -> jax.Array:
        """Unpacked biased-unsigned weights (K, M_pad) as int8 (debug/tests)."""
        return _unpack_jnp(self.packed, self.packed_hi, self.bits, self.k_shards)


def _unpack_jnp(packed, packed_hi, bits: int, k_shards: int) -> jax.Array:
    """jnp version of packing.unpack_strided (+ b3 recombine). -> int8 (K, M)."""

    def _un(pk, b):
        p = 8 // b
        KP, M = pk.shape
        kps = KP // k_shards
        pk = pk.reshape(k_shards, kps, M)
        mask = jnp.uint8((1 << b) - 1)
        blocks = [(pk >> jnp.uint8(b * j)) & mask for j in range(p)]
        return jnp.concatenate(blocks, axis=1).reshape(KP * p, M)

    if bits == 3:
        lo = _un(packed, 2)
        hi = _un(packed_hi, 1)
        return (lo + (hi << jnp.uint8(2))).astype(jnp.int8)
    return _un(packed, bits).astype(jnp.int8)


# ---------------------------------------------------------------------------
# XLA implementation (and dequant baseline).
# ---------------------------------------------------------------------------

def qgemm_xla(x: jax.Array, qt: QuantizedTensor, out_dtype=None) -> jax.Array:
    """Grouped dequant matmul in plain XLA.

    C[n,m] = sum_g scales[g,m] * (x_g @ wq_g)[n,m] - (sum_k x_g)[n] * sub[g,m].

    For int8 x the inner matmuls accumulate exactly in int32 (the analog of
    the reference's do_scale_final int16/int32 path, tbl.cc:536-670).
    """
    N = x.shape[0]
    K, M = qt.kdim, qt.mdim
    Mp = qt.mdim_padded
    gs = qt.group_size
    G = K // gs
    wq = _unpack_jnp(qt.packed, qt.packed_hi, qt.bits, qt.k_shards)  # (K, Mp) int8
    int_path = x.dtype == jnp.int8
    xg = x.reshape(N, G, gs)
    wg = wq.reshape(G, gs, Mp)
    if int_path:
        parts = jax.lax.dot_general(
            xg, wg,
            dimension_numbers=(((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (G, N, Mp)
        xsums = jnp.sum(xg.astype(jnp.int32), axis=-1)  # (N, G)
        acc = jnp.einsum(
            "gnm,gm->nm", parts.astype(jnp.float32), qt.scales.astype(jnp.float32)
        )
        acc = acc - jnp.einsum(
            "ng,gm->nm", xsums.astype(jnp.float32), qt.sub.astype(jnp.float32)
        )
    else:
        parts = jax.lax.dot_general(
            xg, wg.astype(x.dtype),
            dimension_numbers=(((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, N, Mp)
        xsums = jnp.sum(xg.astype(jnp.float32), axis=-1)
        acc = jnp.einsum("gnm,gm->nm", parts, qt.scales.astype(jnp.float32))
        acc = acc - jnp.einsum("ng,gm->nm", xsums, qt.sub.astype(jnp.float32))
    acc = acc[:, :M]
    return acc.astype(out_dtype or (jnp.float32 if int_path else x.dtype))


def dequant_baseline_matmul(x: jax.Array, w_int8: jax.Array, scales: jax.Array,
                            sub: jax.Array, group_size: int) -> jax.Array:
    """The comparator: weights stored 1 byte each (int8), dequantized to the
    activation dtype in HBM-visible form, then a plain XLA matmul.

    This is the 'dequant-based XLA INT baseline' from BASELINE.json that the
    packed kernels must beat by >=2x at decode.
    """
    K, M = w_int8.shape
    G = K // group_size
    w = w_int8.astype(jnp.float32).reshape(G, group_size, M)
    wdq = scales.astype(jnp.float32)[:, None, :] * w - sub.astype(jnp.float32)[:, None, :]
    return jnp.dot(x.astype(jnp.float32), wdq.reshape(K, M),
                   preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Dispatch.
# ---------------------------------------------------------------------------

def qgemm(x: jax.Array, qt: QuantizedTensor, impl: str = "auto",
          out_dtype=None, block_m: int = 0) -> jax.Array:
    """Quantized matmul x (N, K) @ Wdq (K, M) -> (N, M).

    impl: "auto" (pallas on TPU, xla elsewhere), "pallas", "xla".
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return qgemm_xla(x, qt, out_dtype)
    if impl == "pallas":
        from tmac_tpu.ops.pallas.qgemm_kernel import qgemm_pallas
        return qgemm_pallas(x, qt, out_dtype=out_dtype, block_m=block_m)
    raise ValueError(f"unknown impl {impl}")
