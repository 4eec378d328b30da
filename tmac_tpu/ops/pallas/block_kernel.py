"""Fused residual-block kernel: wo + residual + rms_norm + gate_up +
SwiGLU + down + residual in ONE Pallas program (decode, N=1, per-tensor
scales -- the BitNet path).

Round-2 decode optimization: the per-layer decode cost is dominated by
HBM weight streaming plus ~5 us of fixed cost per kernel launch (Mosaic
entry/exit + pipeline ramp).  Merging the three post-attention linears
into one program removes two launches per layer AND lets the automatic
pipeline prefetch the next matmul's first weight block while the previous
matmul (or the phase-boundary VPU work) is still running -- cross-kernel
overlap that separate launches cannot express.

Phase layout over a single grid:

    steps [0, s_wo)            wo blocks; step 0 quantizes attn_out
    step  s_wo (first gu step) x2 = wo_out + residual is complete ->
                               rms_norm + quantize into scratch
    steps [s_wo, s_wo+s_gu)    gate_up blocks -> gu_out scratch
    step  s_wo+s_gu            SwiGLU(gu_out) -> quantize
    steps [.., +s_dn)          down blocks -> out = acc + x2 (residual)

Weight/scale inputs use phase-clamped BlockSpec index maps: outside its
phase a tensor's index pins to its first/last block, so the pipeline
fetches each block exactly once and keeps one block resident (no refetch
traffic).  All matmuls run the exact-int32 per-tensor path (the
do_scale_final analog): per-token absmax int8 activations, int32 MXU
accumulation, one scale + zero-offset fold per phase.

Only bits in (1, 2, 4, 8) per-tensor tensors (BitNet b1.58 uses 2) and
tp_axis-free layers (the residual add must see the full sum, not a
per-shard partial) use this kernel; models/llama.py falls back to the
separate fused qgemm calls otherwise.  Reference analog: none -- the
reference's llama.cpp runs each ggml node as its own op; this is the
TPU-native fusion its graph executor cannot do.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tmac_tpu.ops.qgemm import QuantizedTensor
from tmac_tpu.ops.pallas.qgemm_kernel import (_unpack_block,
                                              _unpack_block_swar)


def _quantize_row(xf, k_logical):
    """Per-token absmax int8 over the leading k_logical lanes (padding is
    zero so absmax/sums are unaffected).  Returns (xq f32 vals, scale)."""
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sc = jnp.maximum(amax, 1e-20) / 127.0
    xq = jnp.clip(jnp.rint(xf / sc), -127, 127)
    return xq, sc


def _int_dot(xq_i8, v_i8):
    return jax.lax.dot_general(
        xq_i8, v_i8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _make_block_kernel(H, I2, Ip, bits, swar, s_wo, s_gu, s_dn,
                       bm_wo, bm_gu, bm_dn, norm_eps, out_dtype):
    """H: hidden (== wo M == down M, unpadded); I2: gate_up M (= 2*Ip);
    Ip: down K (padded intermediate).  All shapes lane-aligned by the
    caller's QuantizedTensor padding rules."""
    p = 8 // bits
    I = I2 // 2

    def kernel(attn_ref, resid_ref, norm_ref,
               wo_p, wo_s, wo_z,
               gu_p, gu_s, gu_z,
               dn_p, dn_s, dn_z,
               out_ref,
               xq1_s, x2_s, xq2_s, gu_o_s, xq3_s, sc_s):
        # sc_s: SMEM (6,) f32 = [sc1, xsum1, sc2, xsum2, sc3, xsum3]
        i = pl.program_id(0)
        unpack = _unpack_block_swar if swar else _unpack_block

        def widen(ref):
            if swar:
                return pltpu.bitcast(ref[:], jnp.int32)
            return ref[:].astype(jnp.int32)

        def int_matmul(wp_ref, xq_s):
            """Full-depth per-tensor int dot of the resident xq scratch
            against this step's weight block (p strided-field dots)."""
            w32 = widen(wp_ref)
            KPr = wp_ref.shape[0]  # packed rows == unpacked rows per field
            acc = None
            for j in range(p):
                v = unpack(w32, bits, j)
                vj = v if swar else v.astype(jnp.int8)
                part = _int_dot(xq_s[:, j * KPr:(j + 1) * KPr], vj)
                acc = part if acc is None else acc + part
            return acc

        # ---------------- phase boundaries (VPU work) -------------------
        @pl.when(i == 0)
        def _():
            xf = attn_ref[:].astype(jnp.float32)
            xq, sc = _quantize_row(xf, H)
            xq1_s[:] = xq.astype(jnp.int8)
            sc_s[0] = sc[0, 0]
            sc_s[1] = jnp.sum(xq)  # raw int sum, exact in f32 (< 2^24)

        @pl.when(i == s_wo)
        def _():
            xf = x2_s[:]
            var = jnp.sum(jnp.square(xf), axis=1, keepdims=True) * (1.0 / H)
            xn = xf * jax.lax.rsqrt(var + norm_eps)
            xn = xn * norm_ref[:].astype(jnp.float32)
            xq, sc = _quantize_row(xn, H)
            xq2_s[:] = xq.astype(jnp.int8)
            sc_s[2] = sc[0, 0]
            sc_s[3] = jnp.sum(xq)

        @pl.when(i == s_wo + s_gu)
        def _():
            g = gu_o_s[:, :I]
            u = gu_o_s[:, I:]
            prod = g * jax.nn.sigmoid(g) * u
            xq, sc = _quantize_row(prod, Ip)
            xq3_s[:] = xq.astype(jnp.int8)
            sc_s[4] = sc[0, 0]
            sc_s[5] = jnp.sum(xq)

        # ---------------- matmul phases ---------------------------------
        @pl.when(i < s_wo)
        def _():
            acc = int_matmul(wo_p, xq1_s[:])
            o = (acc.astype(jnp.float32) * wo_s[0, :][None, :] * sc_s[0]
                 - (sc_s[1] * sc_s[0]) * wo_z[0, :][None, :])
            off = pl.multiple_of(i * bm_wo, bm_wo)
            x2_s[:, pl.ds(off, bm_wo)] = \
                o + resid_ref[:, pl.ds(off, bm_wo)].astype(jnp.float32)

        @pl.when((i >= s_wo) & (i < s_wo + s_gu))
        def _():
            acc = int_matmul(gu_p, xq2_s[:])
            o = (acc.astype(jnp.float32) * gu_s[0, :][None, :] * sc_s[2]
                 - (sc_s[3] * sc_s[2]) * gu_z[0, :][None, :])
            off = pl.multiple_of((i - s_wo) * bm_gu, bm_gu)
            gu_o_s[:, pl.ds(off, bm_gu)] = o

        @pl.when(i >= s_wo + s_gu)
        def _():
            acc = int_matmul(dn_p, xq3_s[:])
            o = (acc.astype(jnp.float32) * dn_s[0, :][None, :] * sc_s[4]
                 - (sc_s[5] * sc_s[4]) * dn_z[0, :][None, :])
            off = pl.multiple_of((i - s_wo - s_gu) * bm_dn, bm_dn)
            out_ref[:, :] = (o + x2_s[:, pl.ds(off, bm_dn)]
                             ).astype(out_dtype)

    return kernel


def _pick_bm(Mp, KP, target_bytes=2 << 20, min_steps=1):
    best = 128
    for d in range(1, Mp // 128 + 1):
        bm = 128 * d
        if Mp % bm == 0 and KP * bm <= target_bytes and Mp // bm >= min_steps:
            best = max(best, bm)
    return best


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _block_call(attn_out, resid, norm_w, wo, gu, dn, meta, interpret):
    (H, I2, Ip, bits, eps, out_dtype) = meta
    swar = not interpret
    bm_wo = _pick_bm(H, wo.packed.shape[0])
    bm_gu = _pick_bm(I2, gu.packed.shape[0])
    bm_dn = _pick_bm(H, dn.packed.shape[0])
    s_wo, s_gu, s_dn = H // bm_wo, I2 // bm_gu, H // bm_dn
    grid = (s_wo + s_gu + s_dn,)

    kernel = _make_block_kernel(H, I2, Ip, bits, swar, s_wo, s_gu, s_dn,
                                bm_wo, bm_gu, bm_dn, float(eps), out_dtype)

    def clamp(lo, n):
        return lambda i: (0, jnp.clip(i - lo, 0, n - 1))

    in_specs = [
        pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [attn_out.astype(jnp.float32), resid.astype(jnp.float32),
            norm_w.reshape(1, H)]
    for qt, bm, lo, n in ((wo, bm_wo, 0, s_wo),
                          (gu, bm_gu, s_wo, s_gu),
                          (dn, bm_dn, s_wo + s_gu, s_dn)):
        KP = qt.packed.shape[0]
        in_specs += [
            pl.BlockSpec((KP, bm), clamp(lo, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), clamp(lo, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), clamp(lo, n), memory_space=pltpu.VMEM),
        ]
        args += [qt.packed, qt.scales, qt.sub]

    out_specs = pl.BlockSpec((1, bm_dn), clamp(s_wo + s_gu, s_dn),
                             memory_space=pltpu.VMEM)

    scratch = [
        pltpu.VMEM((1, H), jnp.int8),      # xq1 (attn quant)
        pltpu.VMEM((1, H), jnp.float32),   # x2
        pltpu.VMEM((1, H), jnp.int8),      # xq2 (normed x2)
        pltpu.VMEM((1, I2), jnp.float32),  # gu_out
        pltpu.VMEM((1, Ip), jnp.int8),     # xq3 (swiglu)
        pltpu.SMEM((6,), jnp.float32),     # [sc1,xsum1,sc2,xsum2,sc3,xsum3]
    ]
    wbytes = wo.packed.size + gu.packed.size + dn.packed.size
    cost = pl.CostEstimate(
        flops=2 * (H * H + H * I2 + Ip * H),
        bytes_accessed=wbytes + 16 * H,
        transcendentals=2 * I2,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((1, H), out_dtype),
        scratch_shapes=scratch,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=24 << 20),
        interpret=interpret,
    )(*args)


def wo_mlp_block(attn_out: jax.Array, resid: jax.Array, norm_w: jax.Array,
                 wo: QuantizedTensor, gu: QuantizedTensor,
                 dn: QuantizedTensor, eps: float,
                 out_dtype=jnp.float32,
                 interpret: bool | None = None) -> jax.Array:
    """One decode token through [wo +resid, rms_norm, gate_up, SwiGLU,
    down +resid].  attn_out/resid: (1, H).  Per-tensor-scale tensors only
    (BitNet); all three must share bits in (1, 2, 4) and be unpadded in M.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H = attn_out.shape[1]
    assert attn_out.shape[0] == 1, "decode-only (N=1)"
    for qt in (wo, gu, dn):
        assert qt.scales.shape[0] == 1 and qt.k_shards == 1
        assert qt.bits == wo.bits and qt.bits in (1, 2, 4)
        assert qt.mdim_padded == qt.mdim
    assert wo.kdim_padded == wo.kdim == H, "wo K must be the hidden size"
    assert dn.mdim == H and wo.mdim == H
    I2 = gu.mdim_padded
    Ip = dn.kdim_padded
    assert I2 == 2 * dn.kdim, (I2, dn.kdim)
    assert Ip == dn.kdim, "down K must be unpadded (padded_intermediate)"
    meta = (H, I2, Ip, wo.bits, float(eps), out_dtype)
    return _block_call(attn_out, resid, norm_w, wo, gu, dn, meta, interpret)
