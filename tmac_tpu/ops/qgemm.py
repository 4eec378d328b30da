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
    meta_fields=["bits", "group_size", "k_shards", "m_shards", "shape",
                 "m_segments"],
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
    m_shards: int
    shape: tuple
    # fused tensors (fuse_m): per-component (M_logical, per-shard padded
    # width); None for plain tensors
    m_segments: Optional[tuple] = None

    @property
    def kdim(self) -> int:
        return self.shape[0]

    @property
    def mdim(self) -> int:
        return self.shape[1]

    @property
    def mdim_padded(self) -> int:
        # negative index: also correct for STACKED expert tensors, whose
        # arrays carry a leading E axis (models/moe.stack_experts)
        return self.packed.shape[-1]

    @property
    def kdim_padded(self) -> int:
        """Total K after per-shard zero padding (see from_quantized)."""
        p = 4 if self.bits == 3 else 8 // self.bits
        return self.packed.shape[-2] * p

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
        m_shards: int = 1,
        scale_dtype=jnp.float32,
        device_put: bool = True,
    ) -> "QuantizedTensor":
        """Pack biased-unsigned (K, M) weights + (G, M) scales/sub.

        Padding (all zero-filled and transparent -- qgemm zero-pads x along
        K to match and slices the M padding off the output):
          * M: padded PER m-shard to a lane multiple (so an even split over
            m_shards devices keeps each local chunk aligned AND column j of
            local shard s is logical column s*(M/m_shards)+j),
          * K: padded PER k-shard so the kernel's field-block x scale-group
            chunk structure divides each shard.
        Sharded-dim divisibility (M % m_shards, K % (k_shards*group_size))
        is the converter's job -- it pads the model's intermediate size.
        """
        K, M = wq.shape
        per_tensor = group_size >= K // k_shards  # one scale row per shard
        G = k_shards if per_tensor else K // group_size
        assert scales.shape == (G, M), (scales.shape, G, M)

        assert M % m_shards == 0, (M, m_shards)
        ms = M // m_shards
        msp = round_up(ms, 128)
        if msp != ms:
            def _pad_m(a):
                a = a.reshape(a.shape[0], m_shards, ms)
                a = np.pad(a, ((0, 0), (0, 0), (0, msp - ms)))
                return a.reshape(a.shape[0], m_shards * msp)
            wq, scales, sub = _pad_m(wq), _pad_m(scales), _pad_m(sub)
        mpad = m_shards * msp

        p_lo = 4 if bits == 3 else 8 // bits
        pmax = 8 if bits == 3 else p_lo
        if per_tensor:
            assert K % k_shards == 0
            ks = K // k_shards
            # x4: the kernel's SWAR unpack consumes packed rows 4 at a time
            ksp = round_up(ks, pmax * 4)
        else:
            assert K % (k_shards * group_size) == 0, (K, k_shards, group_size)
            ks = K // k_shards
            ksp = round_up(ks, pmax * group_size)
        if ksp != ks:
            wq = wq.reshape(k_shards, ks, mpad)
            wq = np.pad(wq, ((0, 0), (0, ksp - ks), (0, 0))).reshape(k_shards * ksp, mpad)
            if not per_tensor:
                gsh, gp = ks // group_size, ksp // group_size
                scales = scales.reshape(k_shards, gsh, mpad)
                scales = np.pad(scales, ((0, 0), (0, gp - gsh), (0, 0)))
                scales = scales.reshape(k_shards * gp, mpad)
                sub = sub.reshape(k_shards, gsh, mpad)
                sub = np.pad(sub, ((0, 0), (0, gp - gsh), (0, 0)))
                sub = sub.reshape(k_shards * gp, mpad)

        if bits == 3:
            lo, hi = packing.pack_b3(wq, k_shards)
        elif bits == 8:
            # store signed codes (wq - 128, two's complement) so kernels can
            # feed bytes straight to the int8 MXU with zero unpack work;
            # fold the -128 shift into the zero-offset term
            wq = ((wq.astype(np.int16) - 128) & 0xFF).astype(np.uint8)
            sub = sub - 128.0 * scales
            lo, hi = wq, None
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
            group_size=group_size if not per_tensor else ksp,
            k_shards=k_shards,
            m_shards=m_shards,
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
        m_shards: int = 1,
        **kw,
    ) -> "QuantizedTensor":
        """Quantize float (K, M) weights and pack (testing / on-the-fly quant)."""
        K, M = w.shape
        group_size = group_size or K
        wq, scales, sub = packing.quantize_weights(np.asarray(w), bits, group_size, zero_point)
        return cls.from_quantized(wq, scales, sub, bits, group_size, k_shards,
                                  m_shards, **kw)

    def localized(self, tp: int, axis: int) -> "QuantizedTensor":
        """The per-device static view under shard_map: axis 0 = row-parallel
        (k-sharded), axis 1 = column-parallel (m-sharded).  Arrays inside
        shard_map are already local slices; this fixes up the static meta."""
        if axis == 0:
            assert self.k_shards == tp
            # group_size is already per-shard-correct: per-tensor tensors
            # store the per-shard padded size, grouped ones the group size
            return dataclasses.replace(
                self, k_shards=1, shape=(self.kdim // tp, self.mdim))
        assert self.m_shards == tp
        segs = None
        if self.m_segments is not None:
            segs = tuple((Mi // tp, mspi) for (Mi, mspi) in self.m_segments)
        return dataclasses.replace(
            self, m_shards=1, shape=(self.kdim, self.mdim // tp),
            m_segments=segs)

    def _k_pad_geometry(self):
        """(ks, ksp): per-shard logical and padded K."""
        return self.kdim // self.k_shards, self.kdim_padded // self.k_shards

    def slice_m(self, out: jax.Array) -> jax.Array:
        """Strip the per-m-shard lane padding off a (..., mdim_padded) array.

        For fused tensors (fuse_m) this also re-orders the per-shard
        component interleave back to logical [comp0 | comp1 | ...] order, so
        callers can split components with plain static slices at the
        logical widths."""
        lead = out.shape[:-1]
        if self.m_segments is not None:
            o = out.reshape(*lead, self.m_shards, -1)
            pieces, off = [], 0
            for (Mi, mspi) in self.m_segments:
                seg = o[..., off:off + mspi][..., : Mi // self.m_shards]
                pieces.append(seg.reshape(*lead, Mi))
                off += mspi
            return jnp.concatenate(pieces, axis=-1)
        if self.mdim_padded == self.mdim:
            return out
        ms = self.mdim // self.m_shards
        msp = self.mdim_padded // self.m_shards
        o = out.reshape(*lead, self.m_shards, msp)[..., :ms]
        return o.reshape(*lead, self.mdim)

    def unpack(self) -> jax.Array:
        """Unpacked biased-unsigned weights as int8, logical (K, M) shape."""
        w = _unpack_jnp(self.packed, self.packed_hi, self.bits, self.k_shards)
        ks, ksp = self._k_pad_geometry()
        if ksp != ks:
            w = w.reshape(self.k_shards, ksp, -1)[:, :ks].reshape(self.kdim, -1)
        return self.slice_m(w.reshape(self.kdim, -1))


def _unpack_jnp(packed, packed_hi, bits: int, k_shards: int) -> jax.Array:
    """jnp version of packing.unpack_strided (+ b3 recombine). -> int8 (K, M).

    bits=8: stored bytes ARE the signed codes (see from_quantized)."""
    if bits == 8:
        return jax.lax.bitcast_convert_type(packed, jnp.int8)

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


def fuse_m(qts: list) -> QuantizedTensor:
    """Fuse QuantizedTensors sharing K into one along M (fused QKV/GateUp).

    One kernel invocation then serves several linears of the same input --
    fewer launches, larger DMA blocks (better HBM utilization for decode),
    and the activation quantization is computed once.  Components are
    interleaved PER M-SHARD ([q_s0 k_s0 v_s0 | q_s1 ...]) so a plain
    contiguous 1/m_shards split along the packed M axis (column-parallel
    NamedSharding) still gives every device its own q/k/v slices.

    slice_m on the fused tensor returns logical [comp0 | comp1 | ...] order;
    split outputs with static slices at the logical component widths.
    """
    base = qts[0]
    for q in qts[1:]:
        assert q.kdim == base.kdim and q.kdim_padded == base.kdim_padded
        assert q.bits == base.bits and q.group_size == base.group_size
        assert q.k_shards == base.k_shards and q.m_shards == base.m_shards
        assert q.scales.shape[0] == base.scales.shape[0]
        assert q.m_segments is None, "cannot re-fuse a fused tensor"
    ms = base.m_shards

    def cat(arrs):
        arrs = [jnp.asarray(a).reshape(a.shape[0], ms, -1) for a in arrs]
        out = jnp.concatenate(arrs, axis=2)
        return out.reshape(out.shape[0], -1)

    return QuantizedTensor(
        packed=cat([q.packed for q in qts]),
        packed_hi=cat([q.packed_hi for q in qts])
        if base.packed_hi is not None else None,
        scales=cat([q.scales for q in qts]),
        sub=cat([q.sub for q in qts]),
        bits=base.bits,
        group_size=base.group_size,
        k_shards=base.k_shards,
        m_shards=ms,
        shape=(base.kdim, sum(q.mdim for q in qts)),
        m_segments=tuple((q.mdim, q.mdim_padded // ms) for q in qts),
    )


# ---------------------------------------------------------------------------
# XLA implementation (and dequant baseline).
# ---------------------------------------------------------------------------

def pad_x_for(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """Zero-pad activations along K to match the per-shard K padding."""
    N = x.shape[0]
    K, Kp = qt.kdim, qt.kdim_padded
    if Kp == K:
        return x
    ks, ksp = qt._k_pad_geometry()
    xr = x.reshape(N, qt.k_shards, ks)
    xr = jnp.pad(xr, ((0, 0), (0, 0), (0, ksp - ks)))
    return xr.reshape(N, Kp)


def qgemm_xla(x: jax.Array, qt: QuantizedTensor, out_dtype=None) -> jax.Array:
    """Grouped dequant matmul in plain XLA.

    C[n,m] = sum_g scales[g,m] * (x_g @ wq_g)[n,m] - (sum_k x_g)[n] * sub[g,m].

    For int8 x the inner matmuls accumulate exactly in int32 (the analog of
    the reference's do_scale_final int16/int32 path, tbl.cc:536-670).
    """
    x = pad_x_for(x, qt)
    N = x.shape[0]
    K, M = qt.kdim_padded, qt.mdim
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
    acc = qt.slice_m(acc)
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
          out_dtype=None, block_m: int = 0, act: str = "auto",
          norm=None, glu: bool = False, residual=None,
          act_group_size: int = 0) -> jax.Array:
    """Quantized matmul x (N, K) @ Wdq (K, M) -> (N, M).

    impl: "auto" (pallas on TPU, xla elsewhere), "pallas", "xla".
    act: float-activation handling for the pallas impl ("int8" group-quant
         by default -- the int8-LUT analog; "native" for exact).
    norm: optional (weight (K,), eps) rms_norm folded into the kernel
          prologue (pallas act='fused' only).
    act_group_size: finer activation quantization granularity for the
         pallas chunked int8 paths (see models/config.QuantConfig); the
         xla impl keeps float activations, so it has no effect there.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        if glu:
            K = qt.kdim
            g, u = x[..., :K].astype(jnp.float32), x[..., K:].astype(jnp.float32)
            x = (g * jax.nn.sigmoid(g) * u).astype(x.dtype)
        if norm is not None:
            w_n, eps = norm
            xf = x.astype(jnp.float32)
            var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            x = (xf * jax.lax.rsqrt(var + eps) * w_n.astype(jnp.float32)
                 ).astype(x.dtype)
        out = qgemm_xla(x, qt, out_dtype)
        if residual is not None:
            out = out + residual.astype(out.dtype)
        return out
    if impl == "pallas":
        from tmac_tpu.ops.pallas.qgemm_kernel import qgemm_pallas
        return qgemm_pallas(x, qt, out_dtype=out_dtype, block_m=block_m,
                            act=act, norm=norm, glu=glu, residual=residual,
                            act_group_size=act_group_size)
    raise ValueError(f"unknown impl {impl}")
