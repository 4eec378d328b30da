"""Production Pallas mpGEMM kernel: packed low-bit weights x activations.

TPU-native replacement for the reference's generated `qgemm_lut_t*` TVM
kernels + `tbl_g4_*` SIMD intrinsics (reference python/t_mac/intrins/tbl.cc,
deploy/tuned/*/kernels.cc).  Identical math, different realization:

  CPU (reference): 4-bit LUT indices -> vqtbl1q_s8 16-entry shuffle ->
                   int8 adder tree -> fp16 fma with per-group scales.
  TPU (here):      packed bit-fields -> VPU shift/mask extract ->
                   MXU matmul per scale-group chunk -> f32 scale epilogue,
                   zero-offsets folded through precomputed activation
                   group-sums (one extra tiny MXU dot).

Why no literal table gather: the TPU has no cross-lane byte shuffle; a
16-entry gather per 4-bit index would serialize on the VPU.  The lookup
lut[k, idx(m,k)] is mathematically sum_j s_j * b[4k+j], i.e. a +-1 matmul
-- which is exactly what the MXU does natively at 100x the VPU's rate.  The
LUT formulation is kept as the executable spec (ops/lut.py); this kernel is
bit-exact to the same dequant model and is tested against both.

Memory traffic per weight = bits/8 bytes (+ scales) -- the same as the
reference's LUT-index stream, preserving T-MAC's bandwidth advantage, which
is the entire game for N=1 decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tmac_tpu.ops.qgemm import QuantizedTensor


def _pick_block_m(mpad: int, kp: int, requested: int = 0,
                  per_bm_bytes: int = 0, avail_bytes: int = 0) -> int:
    """Block size along M for the packed-weight grid.

    Two forces: DMA efficiency wants large blocks (measured: ~1.7 MB packed
    blocks hit 530 GB/s vs 400 GB/s at 410 KB on v5e), while the Mosaic
    pipeline needs >= 2 grid steps so the next block's HBM->VMEM DMA
    overlaps the current block's unpack+MXU work -- with grid=1 the kernel
    serializes DMA then compute, which costs ~40% at decode.  So: largest
    block <= ~2 MB packed that still leaves >= 2 grid steps (>= 3 preferred
    when the shape allows).  per_bm_bytes/avail_bytes additionally cap the
    block by the TOTAL per-block VMEM footprint (packed + output double
    buffers) against what's left after the N-dependent fixed buffers --
    large-N prefill otherwise blows the scoped-VMEM limit.
    """
    if requested:
        assert mpad % requested == 0 and requested % 128 == 0
        return requested
    bm_cap = mpad
    if per_bm_bytes and avail_bytes:
        bm_cap = max(128, avail_bytes // per_bm_bytes)
    best = 128
    for min_steps in (3, 2):
        for d in range(1, mpad // 128 + 1):
            bm = 128 * d
            if mpad % bm:
                continue
            if (kp * bm <= (2 << 20) and bm <= bm_cap
                    and mpad // bm >= min_steps and bm > best):
                best = bm
        if best > 128 or mpad // 128 <= min_steps:
            break
    return best


def _unpack_block(wp32, bits: int, j: int):
    """Extract field j from packed bytes widened to int32.

    Mosaic has no sub-32-bit vector shifts (arith.shrui on i8 fails to
    legalize), so the byte tile is widened to i32 once per m-tile and
    fields are extracted with i32 shift+mask -- still one VPU pass each
    since VPU lanes are 32-bit regardless of element type.
    (Interpret-mode fallback; compiled kernels use the SWAR path below.)
    """
    mask = (1 << bits) - 1
    if j == 0:
        return wp32 & mask
    return (wp32 >> (bits * j)) & mask


def _unpack_block_swar(wp_swar, bits: int, j: int):
    """SWAR field extraction: 4 packed bytes (4 K-rows) per int32 lane.

    wp_swar = pltpu.bitcast(packed_u8_tile, int32), shape (KP/4, MT): on
    TPU the bitcast merges 4 *sublanes* into one i32 lane.  One shift + one
    mask processes 4 bytes at once; bits shifted across byte boundaries and
    the i32 sign-propagation both land outside the per-byte field mask.
    Bitcasting back to int8 restores the (KP, MT) row order, already in the
    dtype the int8 MXU path consumes -- 8x fewer VPU ops than widening and
    zero per-weight converts.

    bits=8 stores signed codes directly (qgemm.from_quantized): the bitcast
    IS the unpack.
    """
    if bits == 8:
        return pltpu.bitcast(wp_swar, jnp.int8)
    mask = int.from_bytes(bytes([(1 << bits) - 1] * 4), "little")
    v = wp_swar if j == 0 else (wp_swar >> (bits * j))
    return pltpu.bitcast(v & mask, jnp.int8)


def _unpack_block_swar_shifted(wp_swar, bits: int, j: int, lshift: int):
    """SWAR extract with an in-i32 left shift (for the b3 high plane: the
    1-bit field scaled by 4 without an illegal i8 vector shift; per-byte
    values stay < 2^(bits+lshift) <= 8 so no cross-byte carry)."""
    mask = int.from_bytes(bytes([(1 << bits) - 1] * 4), "little")
    v = wp_swar if j == 0 else (wp_swar >> (bits * j))
    return pltpu.bitcast((v & mask) << lshift, jnp.int8)


def _make_kernel(N, K, bits, gs, int_acc, out_dtype, swar, grouped_int,
                 fused_quant=False, single_dot=False, norm_eps=0.0,
                 norm_k=0, glu=False, with_residual=False,
                 dequant_dot=False, ags=0):
    p = 8 // bits if bits != 3 else 4
    kb = K // p  # unpacked k-rows per field block
    # ags: independent activation-group size (reference run_pipeline.py
    # -ags knob); 0 = act groups coincide with weight scale groups.  Chunks
    # must respect BOTH granularities so each chunk has one weight scale
    # and one act scale.
    chunk = min(gs, kb) if not ags else min(gs, ags, kb)
    if bits == 3:
        # chunks must also fit inside one 1-bit high-plane block (K//8 rows)
        chunk = min(chunk, K // 8)
    assert kb % chunk == 0 and (chunk == gs or gs % kb == 0), (
        f"group_size {gs} incompatible with K {K} and {p} fields/byte"
    )
    if ags:
        assert gs % chunk == 0 and ags % chunk == 0, (gs, ags, chunk)
    nchunks = kb // chunk

    G = K // gs
    Ga = K // ags if ags else G  # activation scale groups

    def kernel(x_ref, *rest):
        xscale = None
        if fused_quant:
            # in-kernel activation quantization: the reference's
            # preprocessor/GEMM fusion for small N (SURVEY.md 7.2 step 3).
            # Replaces ~8 tiny XLA fusions per linear in the decode step.
            # One scale per (token, weight-group); G == 1 covers the
            # per-tensor (BitNet) case.  Computed ONCE on grid step 0 into
            # scratch (TPU grid steps run sequentially; scratch persists),
            # so the M-blocked grid doesn't redo it.
            xsum_ref = None
            if norm_eps:
                norm_ref, *rest = rest
            if dequant_dot:
                *rest, xq_s = rest  # bf16 activation scratch, no quant state
                xs_s = xsum_s = None
            else:
                *rest, xq_s, xs_s, xsum_s = rest

            @pl.when(pl.program_id(0) == 0)
            def _():
                xf = x_ref[:].astype(jnp.float32)
                if glu:
                    # SwiGLU gating folded into the prologue: x is the raw
                    # fused gate_up output (N, 2K); compute silu(g) * u
                    # here instead of in XLA glue ops
                    g_half = xf[:, :K]
                    xf = g_half * jax.nn.sigmoid(g_half) * xf[:, K:]
                if norm_eps:
                    # rms_norm folded into the prologue (the norm input is
                    # only consumed by this linear) -- one less XLA fusion
                    # round-trip per layer.  Divide by the LOGICAL K: the
                    # kernel's K is zero-padded (zeros add nothing to the
                    # sum but would skew a mean).
                    var = jnp.sum(jnp.square(xf), axis=1, keepdims=True) \
                        * (1.0 / norm_k)
                    xf = xf * jax.lax.rsqrt(var + norm_eps)
                    xf = xf * norm_ref[:].astype(jnp.float32)
                if dequant_dot:
                    # large-N grouped path: activations stay float (bf16 on
                    # the MXU); only the glu/norm folds run here
                    xq_s[:] = xf.astype(jnp.bfloat16)
                    return
                if G == 1:
                    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)  # (N,1)
                    sc = jnp.maximum(amax, 1e-20) / 127.0
                    xqf = jnp.clip(jnp.rint(xf / sc), -127, 127)
                    xsum = jnp.sum(xqf, axis=1, keepdims=True) * sc
                else:
                    # quantize per ACT group (Ga >= G when an independent
                    # act_group_size is set); the zero-offset fold needs
                    # per-WEIGHT-group dequantized sums
                    asz = K // Ga
                    xg = xf.reshape(N, Ga, asz)
                    amax = jnp.max(jnp.abs(xg), axis=2, keepdims=True)
                    sc_g = jnp.maximum(amax, 1e-20) / 127.0
                    xqf = jnp.clip(jnp.rint(xg / sc_g), -127, 127).reshape(N, K)
                    sc = sc_g[..., 0]                                 # (N, Ga)
                    xsum_a = jnp.sum(
                        xqf.reshape(N, Ga, asz), axis=2) * sc
                    # Ga >= G (finer act groups, enforced by the caller):
                    # aggregate to per-weight-group sums for the zero fold
                    xsum = (xsum_a.reshape(N, G, Ga // G).sum(-1)
                            if Ga != G else xsum_a)
                xq_s[:] = xqf.astype(jnp.int8)
                xs_s[:] = sc
                xsum_s[:] = xsum

            x = xq_s[:]
            if not dequant_dot:
                xscale = xs_s[:]
                xsum_f = xsum_s[:]
        else:
            xsum_ref, *rest = rest
        if grouped_int:
            xs_ref, wp_ref, *rest = rest
        else:
            wp_ref, *rest = rest
            xs_ref = None
        w_s = None
        if single_dot or dequant_dot:
            *rest2, w_s = rest
            rest = rest2
        res_ref = None
        if with_residual:
            if bits == 3:
                wph_ref, scales_ref, sub_ref, res_ref, out_ref = rest
            else:
                scales_ref, sub_ref, res_ref, out_ref = rest
                wph_ref = None
        elif bits == 3:
            wph_ref, scales_ref, sub_ref, out_ref = rest
        else:
            scales_ref, sub_ref, out_ref = rest
            wph_ref = None

        def _finish(acc):
            # residual fold: the layer's skip connection added in the
            # epilogue (only when no cross-chip psum follows)
            if with_residual:
                acc = acc + res_ref[:].astype(jnp.float32)
            out_ref[:] = acc.astype(out_dtype)

        if not fused_quant:
            x = x_ref[:]
        # per-group activation scales: from the prologue input (grouped_int)
        # or computed in-kernel (fused, G > 1)
        if grouped_int:
            xs_all = xs_ref[:]
        elif fused_quant and G > 1:
            xs_all = xscale
        else:
            xs_all = None
        acc = jnp.zeros(out_ref.shape, dtype=jnp.int32 if int_acc else jnp.float32)

        if swar:
            wp32 = pltpu.bitcast(wp_ref[:], jnp.int32)
            wph32 = pltpu.bitcast(wph_ref[:], jnp.int32) if bits == 3 else None
            unpack = _unpack_block_swar
        else:
            wp32 = wp_ref[:].astype(jnp.int32)  # widen once per m-tile
            wph32 = wph_ref[:].astype(jnp.int32) if bits == 3 else None
            unpack = _unpack_block

        if single_dot:
            # large-N path (per-tensor scales): unpack the whole m-block
            # into int8 scratch, then ONE MXU dot.  p separate per-field
            # dots fragment MXU work at big N (measured: our 4-dot kernel
            # 87.2 us vs a single XLA int8 dot 49.5 us at 256x8640x3200).
            for j in range(p):
                v = unpack(wp32, bits, j)
                # interpret mode (swar=False) yields int32 values even for
                # bits=8; astype int8 wraps two's-complement codes correctly
                w_s[j * kb:(j + 1) * kb, :] = (
                    v if swar else v.astype(jnp.int8))
            acc = jax.lax.dot_general(
                x, w_s[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = acc.astype(jnp.float32) * scales_ref[0, :].astype(jnp.float32)[None, :]
            if fused_quant:
                acc = acc * xscale
                acc = acc - xsum_f * sub_ref[0, :].astype(jnp.float32)[None, :]
            else:
                acc = acc - jax.lax.dot_general(
                    xsum_ref[:].astype(jnp.float32), sub_ref[:].astype(jnp.float32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            _finish(acc)
            return

        def _chunk_v(j, c, wj):
            """Unpacked weight chunk (chunk, bm) for field j, chunk c."""
            k0 = j * kb + c * chunk  # global k of this chunk
            if bits == 3:
                # combine the 1-bit high plane: hi block j' = k0 // (K//8)
                kb_hi = K // 8
                jh = k0 // kb_hi
                rh = k0 % kb_hi
                if swar:
                    # i8 vector add is not legalizable; combine lo+4*hi
                    # in the i32 SWAR domain, one bitcast at the end
                    m2 = int.from_bytes(b"\x03" * 4, "little")
                    m1 = int.from_bytes(b"\x01" * 4, "little")
                    l32 = wp32[c * chunk // 4:(c + 1) * chunk // 4, :]
                    h32 = wph32[rh // 4:rh // 4 + chunk // 4, :]
                    lo = (l32 >> (2 * j)) & m2 if j else l32 & m2
                    hi = ((h32 >> jh) & m1) << 2 if jh else (h32 & m1) << 2
                    return pltpu.bitcast(lo + hi, jnp.int8)
                v = wj[c * chunk:(c + 1) * chunk, :]
                hi = _unpack_block(wph32, 1, jh)
                return v + (hi[rh:rh + chunk, :] << 2)
            return wj[c * chunk:(c + 1) * chunk, :]

        if dequant_dot:
            # Grouped-scale large-N path (the reference's prefill claim,
            # README.md:70-73): fold scales AND zero offsets into a bf16
            # dequantized VMEM scratch (w_s[k,:] = s[g]*wq - sub[g]), then
            # ONE bf16 MXU dot over the whole K.  Per-group int8 dots can't
            # merge across scale groups; folding into bf16 weights recovers
            # a single full-depth dot (and drops the xsum zero-point
            # correction entirely -- sub is inside w_s).  VPU dequant cost
            # is per-weight but N-independent; the dot runs at the bf16 MXU
            # rate, vs G fragmented depth-gs int8 dots + G f32 VPU scale
            # passes on the chunk-loop path.
            for j in range(p):
                wj = None if (bits == 3 and swar) else unpack(
                    wp32, 2 if bits == 3 else bits, j)
                for c in range(nchunks):
                    k0 = j * kb + c * chunk
                    g = k0 // gs
                    wf = _chunk_v(j, c, wj).astype(jnp.float32)
                    sc = scales_ref[g, :].astype(jnp.float32)[None, :]
                    sb = sub_ref[g, :].astype(jnp.float32)[None, :]
                    w_s[k0:k0 + chunk, :] = (wf * sc - sb).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                x.astype(jnp.bfloat16), w_s[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            _finish(acc)
            return

        for j in range(p):
            wj = None if (bits == 3 and swar) else unpack(wp32, 2 if bits == 3 else bits, j)
            for c in range(nchunks):
                k0 = j * kb + c * chunk  # global k of this chunk
                v = _chunk_v(j, c, wj)
                g = k0 // gs               # weight scale group
                ga = k0 // (K // Ga)       # activation scale group
                xb = x[:, k0:k0 + chunk]
                if int_acc:
                    part = jax.lax.dot_general(
                        xb, v.astype(jnp.int8),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc = acc + part
                elif xs_all is not None:
                    # int8 acts quantized per weight-group (the int8-LUT
                    # analog, reference lut_ctor.cc): int8 MXU dot, both
                    # scales folded per group
                    part = jax.lax.dot_general(
                        xb, v.astype(jnp.int8),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                    acc = acc + part * (
                        xs_all[:, ga:ga + 1].astype(jnp.float32)
                        * scales_ref[g, :].astype(jnp.float32)[None, :])
                else:
                    part = jax.lax.dot_general(
                        xb, v.astype(jnp.int8).astype(x.dtype) if not swar
                        else v.astype(x.dtype),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = acc + part * scales_ref[g, :].astype(jnp.float32)[None, :]

        if int_acc:
            # per-tensor scale (G == 1): exact int32 accumulation, one final
            # scale -- the analog of the reference's do_scale_final path
            # (tbl.cc:536-670, chosen when m_groups != -1 and ags == K).
            acc = acc.astype(jnp.float32) * scales_ref[0, :].astype(jnp.float32)[None, :]

        if fused_quant:
            if G == 1:
                # per-row dequant + zero-offset fold as an outer product
                acc = acc * xscale
                acc = acc - xsum_f * sub_ref[0, :].astype(jnp.float32)[None, :]
            else:
                # grouped: scales already folded per chunk; fold the
                # zero offsets through the in-kernel group sums
                acc = acc - jax.lax.dot_general(
                    xsum_f, sub_ref[:].astype(jnp.float32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            _finish(acc)
            return

        # zero-offset fold: C -= xsum @ sub  (covers both the 2^(bits-1)
        # midpoint and GPTQ zero points; reference folds this via the
        # entry-0 LUT bias, tbl.cc:374-415)
        # precision=HIGHEST: xsum magnitudes ~K*127 would lose integer
        # exactness in the MXU's default bf16-input f32 pass
        acc = acc - jax.lax.dot_general(
            xsum_ref[:].astype(jnp.float32), sub_ref[:].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        _finish(acc)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("qt_meta", "out_dtype", "block_m", "interpret",
                     "norm_meta", "glu", "dispatch"),
)
def _qgemm_pallas_call(x, xsum, xscales, packed, packed_hi, scales, sub,
                       qt_meta, out_dtype, block_m, interpret,
                       norm_w=None, norm_meta=None, glu=False, residual=None,
                       dispatch=None):
    bits, gs, K, M, ags = (qt_meta + (0,))[:5]
    N = x.shape[0]
    KP, Mp = packed.shape
    G = scales.shape[0]
    fused = xsum is None  # in-kernel activation quantization
    int_acc = (fused and G == 1) or (
        (x.dtype == jnp.int8) and G == 1 and xscales is None)
    grouped_int = xscales is not None
    # big-N per-tensor shapes: unpack to int8 scratch + one int8 dot
    single_dot = N >= 64 and G == 1 and bits in (1, 2, 4, 8) and int_acc
    # big-N grouped shapes: dequantize (scales AND zero offsets) into bf16
    # scratch + one bf16 dot (see kernel)
    dequant_dot = (N >= 64 and G > 1 and not grouped_int and not int_acc
                   and (fused or x.dtype != jnp.int8))
    if dequant_dot and dispatch == "chunk":
        # grouped large-N chunk-vs-dequant choice: resolved by the caller
        # (qgemm_pallas) OUTSIDE jit so the decision is part of the jit
        # cache key -- a table lookup here would be frozen into the first
        # compilation.  Also forced for act='native' float x, whose
        # exactness contract the bf16 dequant scratch would break.
        dequant_dot = False
    if not block_m:
        # tuned table first (the kcfg analog), static heuristic otherwise.
        # fused G>1 chunk shares 'grouped' with the external-int8 path --
        # same chunked-dot structure, same block_m trade-offs.
        from tmac_tpu.ops.pallas import tune_table
        path = ("int" if int_acc else
                ("dequant" if dequant_dot else
                 ("grouped" if grouped_int or (fused and G > 1) else
                  "native")))
        block_m = tune_table.lookup_block_m(bits, K, Mp, N, gs, path)
        if block_m and (Mp % block_m or block_m % 128):
            block_m = 0
    # N-aware VMEM budget: x (possibly double-buffered by the pipeline) +
    # fused-quant scratch are resident for the whole call; packed + output
    # blocks are double-buffered per grid step
    fixed = 2 * N * x.shape[1] * x.dtype.itemsize
    if fused:
        fixed += (2 * N * K) if dequant_dot else (N * K + 2 * N * G * 4)
    out_itemsize = jnp.dtype(out_dtype).itemsize
    per_bm = 2 * (KP + N * out_itemsize + 2 * G * 4)
    if bits == 3 and packed_hi is not None:
        per_bm += 2 * packed_hi.shape[0]
    if single_dot:
        per_bm += K  # int8 unpack scratch
    elif dequant_dot:
        per_bm += 2 * K  # bf16 dequant scratch
    avail = (13 << 20) - fixed
    bm = _pick_block_m(Mp, KP, block_m, per_bm, max(avail, 1))
    grid = (Mp // bm,)
    # Large-N only: headroom x2 + 24 MB floor (Mosaic's epilogue
    # temporaries aren't itemized and a too-tight limit is a hard compile
    # error -- grouped N=256 chunk path needed 17.6 MB against a 16 MB
    # floor).  Decode (small N) keeps the tighter limit: raising it
    # REGRESSED decode 554 -> 425 tok/s (vmem_limit steers Mosaic's
    # scheduling, not just a cap).
    est_vmem = fixed + per_bm * bm + (1 << 20)
    if N >= 64:
        vmem_limit = int(min(100 << 20, max(24 << 20, est_vmem * 2)))
    else:
        vmem_limit = int(min(100 << 20, max(16 << 20, est_vmem * 3 // 2)))

    # SWAR unpack needs 4-row-aligned packed tiles and compiled (Mosaic)
    # bitcast semantics; interpret mode uses the widening fallback
    swar = (not interpret) and KP % 4 == 0 and (
        bits != 3 or packed_hi.shape[0] % 4 == 0)
    norm_eps, norm_k = norm_meta if norm_meta else (0.0, 0)
    # independent act-group size applies only to the chunked int8 paths
    # (dequant_dot keeps float acts; per-tensor paths are per-token)
    ags_eff = ags if (G > 1 and not dequant_dot and not int_acc
                      and ags and ags != gs) else 0
    Ga = K // ags_eff if ags_eff else G
    kernel = _make_kernel(N, K, bits, gs, int_acc, out_dtype, swar, grouped_int,
                          fused_quant=fused, single_dot=single_dot,
                          norm_eps=norm_eps, norm_k=norm_k, glu=glu,
                          with_residual=residual is not None,
                          dequant_dot=dequant_dot, ags=ags_eff)

    x_cols = 2 * K if glu else K
    assert x.shape[1] == x_cols, (x.shape, K, glu)
    in_specs = [
        pl.BlockSpec((N, x_cols), lambda i: (0, 0), memory_space=pltpu.VMEM),  # x
    ]
    args = [x]
    if norm_meta:
        assert fused and norm_w is not None
        in_specs.append(pl.BlockSpec((1, K), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))                 # norm w
        args.append(norm_w.reshape(1, K))
    if not fused:
        in_specs.append(pl.BlockSpec((N, G), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))                 # xsum
        args.append(xsum)
    if grouped_int:
        in_specs.append(pl.BlockSpec((N, Ga), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(xscales)
    in_specs.append(pl.BlockSpec((KP, bm), lambda i: (0, i), memory_space=pltpu.VMEM))
    args.append(packed)
    if bits == 3:
        KH = packed_hi.shape[0]
        in_specs.append(pl.BlockSpec((KH, bm), lambda i: (0, i), memory_space=pltpu.VMEM))
        args.append(packed_hi)
    in_specs += [
        pl.BlockSpec((G, bm), lambda i: (0, i), memory_space=pltpu.VMEM),      # scales
        pl.BlockSpec((G, bm), lambda i: (0, i), memory_space=pltpu.VMEM),      # sub
    ]
    args += [scales, sub]
    if residual is not None:
        in_specs.append(pl.BlockSpec((N, bm), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))                 # residual
        args.append(residual)

    wbytes = KP * Mp + (packed_hi.size if packed_hi is not None else 0)
    cost = pl.CostEstimate(
        flops=2 * N * K * Mp,
        bytes_accessed=wbytes + x.size * x.dtype.itemsize + 2 * G * Mp * 4 + N * Mp * 4,
        transcendentals=0,
    )

    scratch = []
    if single_dot:
        # FIRST so the fused path's trailing unpack stays stable
        scratch.append(pltpu.VMEM((K, bm), jnp.int8))  # unpacked weights
    elif dequant_dot:
        scratch.append(pltpu.VMEM((K, bm), jnp.bfloat16))  # dequantized block
    if fused:
        if dequant_dot:
            scratch.append(pltpu.VMEM((N, K), jnp.bfloat16))  # glu/norm acts
        else:
            scratch += [
                pltpu.VMEM((N, K), jnp.int8),      # quantized activations
                pltpu.VMEM((N, Ga), jnp.float32),  # per-ACT-group scales
                pltpu.VMEM((N, G), jnp.float32),   # per-WEIGHT-group sums
            ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Mp), out_dtype),
        scratch_shapes=scratch,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*args)
    return out


def qgemm_pallas(x: jax.Array, qt: QuantizedTensor, out_dtype=None,
                 block_m: int = 0, interpret: bool | None = None,
                 act: str = "auto", norm=None, glu: bool = False,
                 residual=None, dispatch: str | None = None,
                 act_group_size: int = 0) -> jax.Array:
    """x (N, K) bf16/f32/int8 @ packed Wdq -> (N, M).

    act: activation handling for float x --
      "int8"   quantize per weight-group to int8 and use int8 MXU dots with
               per-group scale folding: the TPU analog of the reference's
               int8-LUT quantization (lut_ctor.cc), ~25% faster than the
               bf16 path and within the same NMSE budget
      "fused"  the quantization happens INSIDE the kernel (per-(token,
               weight-group) absmax int8; exact int32 accumulation when
               G == 1) -- no XLA prologue at all; the preprocessor/GEMM
               fusion of SURVEY.md 7.2 step 3.  At large N the grouped
               chunk variant runs its prologue in XLA instead (see below).
      "native" keep x's dtype on the MXU (exact w.r.t. the dequant model)
      "auto"   "int8"; large-N grouped shapes may stay float and take the
               bf16 dequant-dot path (tuned/heuristic dispatch)
    dispatch: force the large-N grouped kernel path ("chunk"/"dequant");
         None = tuned table, then the N >= 3*gs VPU-cost heuristic.
    act_group_size: finer act-quant granularity (must divide group_size).
    With int8 x and per-tensor scales (BitNet) the accumulation is exact
    int32 on the MXU.  k_shards > 1 tensors must be called under shard_map
    (see tmac_tpu/parallel) so the kernel sees its local K chunk.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from tmac_tpu.ops.qgemm import pad_x_for
    if glu:
        # x is the raw fused gate_up output (N, 2K); silu(g)*u happens in
        # the kernel prologue.  Requires an unpadded K (padded_intermediate
        # guarantees this for model shapes) and act='fused'.
        assert act == "fused" and norm is None
        N, K2 = x.shape
        assert K2 == 2 * qt.kdim, (K2, qt.kdim)
        assert qt.kdim_padded == qt.kdim, "glu fold needs K == K_padded"
        K = qt.kdim
    else:
        N, K = x.shape
        assert K == qt.kdim, (K, qt.kdim)
    assert qt.k_shards == 1, "k-sharded tensors must run under shard_map (localized)"
    if not glu:
        x = pad_x_for(x, qt)
    Kp = qt.kdim_padded
    out_dtype = out_dtype or (jnp.float32 if x.dtype == jnp.int8 else x.dtype)
    G = qt.scales.shape[0]
    gs = qt.group_size
    # independent act-group size (reference -ags knob): only FINER than the
    # weight groups is meaningful here (ags | gs); otherwise ignored
    ags = act_group_size if (act_group_size and G > 1
                             and 0 < act_group_size < gs
                             and gs % act_group_size == 0) else 0
    if residual is not None:
        assert qt.mdim_padded == qt.mdim and qt.m_segments is None, \
            "residual fold needs an unpadded, unfused M"

    if act == "fused":
        assert x.dtype != jnp.int8, "fused quantization needs float x"
        if dispatch is None and N >= 64 and G > 1:
            # chunk (per-group int8 dots) vs the bf16 dequant-dot path is
            # shape-dependent: tuned table first, then the VPU-cost
            # crossover heuristic (chunk's extra VPU work ~ N*M*G fma vs
            # dequant's ~ 3*K*M -> chunk cheaper when N < 3*gs).  Resolved
            # here, OUTSIDE jit, so the decision keys the jit cache.
            from tmac_tpu.ops.pallas import tune_table
            d = tune_table.lookup_dispatch(
                qt.bits, Kp, qt.mdim_padded, N, gs, "fused")
            dispatch = d or ("dequant" if N >= 3 * gs else "chunk")
        if N >= 64 and (G == 1 or dispatch == "chunk"):
            # Large-N fused variants with an IN-KERNEL quantization
            # prologue make Mosaic compilation pathological (> 5-7 min
            # measured at N=256 on v5e for BOTH the grouped chunk and the
            # per-tensor single-dot forms, vs seconds for everything
            # else).  Run the glu/norm prologue in XLA and fall through to
            # the external-int8 kernels -- same math, fast compile; XLA
            # fuses the prologue into one pass.
            xf = x.astype(jnp.float32)
            if glu:
                g_half = xf[:, :K]
                xf = g_half * jax.nn.sigmoid(g_half) * xf[:, K:]
                xf = pad_x_for(xf, qt)
                glu = False
            if norm is not None:
                # variance over the LOGICAL K (x is zero-padded to Kp)
                w_n, eps = norm
                var = jnp.sum(jnp.square(xf), axis=1, keepdims=True) \
                    * (1.0 / K)
                xf = xf * jax.lax.rsqrt(var + float(eps))
                xf = xf * pad_x_for(w_n.reshape(1, K).astype(jnp.float32), qt)
                norm = None
            if G == 1:
                # per-tensor: per-token absmax int8 -> exact-int32
                # single-dot kernel; act scale and residual applied in the
                # XLA epilogue (identical numerics to the fused form)
                amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
                xs = jnp.maximum(amax, 1e-20) / 127.0
                xq = jnp.clip(jnp.rint(xf / xs), -127, 127).astype(jnp.int8)
                xsum = jnp.sum(xq.astype(jnp.int32), axis=1,
                               keepdims=True).astype(jnp.float32)
                out = _qgemm_pallas_call(
                    xq, xsum, None, qt.packed, qt.packed_hi, qt.scales,
                    qt.sub, (qt.bits, gs, Kp, qt.mdim, 0), jnp.float32,
                    block_m, interpret, dispatch=dispatch)
                out = qt.slice_m(out) * xs
                if residual is not None:
                    out = out + residual.astype(out.dtype)
                return out.astype(out_dtype)
            x = xf
            act = "int8"
        else:
            norm_w, norm_meta = None, None
            if norm is not None:
                # rms_norm folded into the kernel prologue: norm = (weight
                # (K,), eps).  Weight padded like x; variance divides by
                # the logical K.
                w_n, eps = norm
                norm_w = pad_x_for(w_n.reshape(1, K), qt)
                norm_meta = (float(eps), K)
            out = _qgemm_pallas_call(
                x.astype(jnp.bfloat16), None, None, qt.packed, qt.packed_hi,
                qt.scales, qt.sub, (qt.bits, gs, Kp, qt.mdim, ags),
                out_dtype, block_m, interpret, norm_w=norm_w,
                norm_meta=norm_meta, glu=glu, residual=residual,
                dispatch=dispatch)
            return qt.slice_m(out)

    assert norm is None, "norm folding requires act='fused'"
    assert not glu, "glu folding requires act='fused'"
    xscales = None
    if act == "native" and x.dtype != jnp.int8 and dispatch is None:
        # exactness contract: 'native' promises bit-identity with the
        # dequant model (f32 scale folding); the large-N bf16 dequant-dot
        # reroute would round s*wq-sub to bf16, so pin the chunked path
        dispatch = "chunk"
    quantize = x.dtype != jnp.int8 and act in ("auto", "int8")
    if quantize and act == "auto" and N >= 64 and G > 1:
        # same dispatch decision for externally-driven float activations
        from tmac_tpu.ops.pallas import tune_table
        d = dispatch or tune_table.lookup_dispatch(
            qt.bits, Kp, qt.mdim_padded, N, gs, "float")
        if d == "dequant" or (d is None and N >= 3 * gs):
            quantize = False  # stay float -> kernel dequant_dot path
    if quantize:
        # per-act-group activation quantization (lut_ctor analog; act
        # groups == weight groups unless act_group_size is set).
        # Explicit act='int8' always quantizes.
        asz = ags or gs
        Ga = Kp // asz
        xg = x.reshape(N, Ga, asz).astype(jnp.float32)
        amax = jnp.max(jnp.abs(xg), axis=-1)  # (N, Ga)
        xscales = jnp.maximum(amax, 1e-20) / 127.0
        xq = jnp.clip(jnp.rint(xg / xscales[..., None]), -127, 127).astype(jnp.int8)
        # zero fold needs per-WEIGHT-group dequantized sums
        xsum_a = (jnp.sum(xq.astype(jnp.int32), -1).astype(jnp.float32)
                  * xscales)
        xsum = (xsum_a.reshape(N, G, Ga // G).sum(-1) if Ga != G else xsum_a)
        x = xq.reshape(N, Kp)
    else:
        ags = 0  # float acts: no act quantization granularity in play
        xsum = jnp.sum(
            x.reshape(N, G, gs).astype(jnp.float32 if x.dtype != jnp.int8 else jnp.int32),
            axis=-1,
        ).astype(jnp.float32)
    out = _qgemm_pallas_call(
        x, xsum, xscales, qt.packed, qt.packed_hi, qt.scales, qt.sub,
        (qt.bits, gs, Kp, qt.mdim, ags), out_dtype, block_m, interpret,
        residual=residual, dispatch=dispatch,
    )
    return qt.slice_m(out)
