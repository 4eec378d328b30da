"""Flash-decode attention: pos-bounded KV streaming for T=1 steps.

The reference has no attention code of its own (it lives in the absent
llama.cpp fork; context handled via `-c 2048`, reference
tools/run_pipeline.py:262).  This is the TPU-native design SURVEY.md
section 5 calls for: the KV cache stays in HBM, and each decode step DMAs
only the `pos+1` valid entries per batch row -- all KV heads in one
strided DMA per S-block, double-buffered -- doing the online-softmax
(flash) accumulation in VMEM.  An XLA einsum over the same cache reads the
FULL S_max allocation every step; at S_max=2048 that is ~870 MB/step for
BitNet-3B, more than the packed weights themselves.  This kernel reads
only what exists, so decode cost stays ~flat in S_max.  Measured on v5e
(32 heads, D=128): 4.5 us vs 14.6 us XLA at S=256; 5.5 vs 92.4 at S=2048.

The kernel takes the WHOLE stacked cache (L, B, KV, S, D) plus a layer
index so the per-layer slice never materializes (an HBM ref is indexed,
not copied); `flash_decode` is the single-layer convenience wrapper.

Layouts: q (B, KV, rep, D); cache (L, B, KV, S, D) -- per-head history
contiguous along S (models/llama.py KVCache); kv_lens (B,) int32 valid
lengths; D must be lane-aligned (the cache allocation pads head_dim).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lens_ref, li_ref, q_ref, k_ref, v_ref, *rest, blk: int,
            scale: float, dp: int, append: bool = False,
            quant: bool = False, window: int = 0, write: bool = False):
    """Grid (B,). k_ref/v_ref are FULL HBM-resident (L, B, KV, S, Dp) refs
    (memory_space=HBM, DMA'd manually); q_ref (1, KV, rep, Dl) and o_ref in
    VMEM; lens/li are scalar-prefetch.  Dl (logical head_dim) may be below
    the cache's lane-padded Dp: q is zero-extended and the output sliced
    IN-KERNEL, so the caller needs no pad/slice glue ops.

    append: rest ends with (ck_ref, cv_ref, o_ref) -- the CURRENT token's
    k/v (1, KV, Dl) arrive as separate VMEM operands and are folded in as
    a final online-softmax step, so the cache read covers only lens[b]
    ALREADY-WRITTEN entries.  This is what lets the model defer (and
    batch) the per-layer cache writes: attention no longer needs the
    current token to be in HBM first.

    quant: rest starts with (ks_ref, vs_ref) -- (L, B, KV, S) f32
    per-vector scales for an int8 cache, DMA'd in (KV, blk) blocks beside
    the codes.  The k scale folds into the SCORES (s *= ksc) and the v
    scale into the PROBS (p *= vsc): rep*blk multiplies each, never a
    dequantized (blk, Dp) KV copy -- the int8 stream is what the MXU dots
    consume, so the HBM read per step genuinely halves.

    write (requires append): rest additionally ends with aliased
    full-cache output refs (k_out, v_out[, ks_out, vs_out]) and the
    kernel COMMITS the current token's k/v into the cache at position
    lens[b] via a post-loop DMA -- the decode step's cache update becomes
    a 16 KB in-kernel write instead of XLA dynamic_update_slices (the
    measured 228 us/step of decode glue, bench_artifacts/r5/
    decode_breakdown.log).  In quant mode the row is quantized in-kernel
    with the _quantize_kv convention (per-vector absmax/127)."""
    if quant:
        ks_ref, vs_ref, *rest = rest
    if append:
        ck_ref, cv_ref, *rest = rest
    o_ref, *rest = rest
    if write:
        k_out_ref, v_out_ref, *rest = rest
        if quant:
            ks_out_ref, vs_out_ref = rest
    b = pl.program_id(0)
    li = li_ref[0]
    KV, rep, Dl = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    D = dp
    L = lens_ref[b]
    nblk = pl.cdiv(L, blk)
    # sliding window (static): query position is L-1 (L in append mode,
    # where the current token rides as an operand), so the visible cached
    # range is [win_lo, L); blocks before win_lo//blk are skipped entirely
    if window > 0:
        win_lo = jnp.maximum(L - window + (1 if append else 0), 0)
        first = win_lo // blk
    else:
        win_lo = jnp.int32(0)
        first = jnp.int32(0)
    q = q_ref[0].astype(jnp.float32) * scale  # (KV, rep, Dl)
    if Dl != D:
        q = jnp.concatenate(
            [q, jnp.zeros((KV, rep, D - Dl), jnp.float32)], axis=-1)

    def body(k_sc, v_sc, sem, ks_sc=None, vs_sc=None, ssem=None,
             wk_sc=None, wv_sc=None, wsem=None, wks_sc=None, wvs_sc=None):
        # scratch (2, KV, blk, D): one strided DMA per block covers every
        # kv head (head histories are S-major, so this is KV descriptors
        # of blk*D contiguous bytes each -- large and sequential)
        def start(slot, i):
            @pl.when(i < nblk)
            def _():
                off = pl.multiple_of(i * blk, blk)
                pltpu.make_async_copy(
                    k_ref.at[li, b, :, pl.ds(off, blk), :], k_sc.at[slot],
                    sem.at[slot, 0]).start()
                pltpu.make_async_copy(
                    v_ref.at[li, b, :, pl.ds(off, blk), :], v_sc.at[slot],
                    sem.at[slot, 1]).start()
                if quant:
                    pltpu.make_async_copy(
                        ks_ref.at[li, b, :, pl.ds(off, blk)], ks_sc.at[slot],
                        ssem.at[slot, 0]).start()
                    pltpu.make_async_copy(
                        vs_ref.at[li, b, :, pl.ds(off, blk)], vs_sc.at[slot],
                        ssem.at[slot, 1]).start()

        def wait(slot, i):
            off = pl.multiple_of(i * blk, blk)
            pltpu.make_async_copy(
                k_ref.at[li, b, :, pl.ds(off, blk), :], k_sc.at[slot],
                sem.at[slot, 0]).wait()
            pltpu.make_async_copy(
                v_ref.at[li, b, :, pl.ds(off, blk), :], v_sc.at[slot],
                sem.at[slot, 1]).wait()
            if quant:
                pltpu.make_async_copy(
                    ks_ref.at[li, b, :, pl.ds(off, blk)], ks_sc.at[slot],
                    ssem.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    vs_ref.at[li, b, :, pl.ds(off, blk)], vs_sc.at[slot],
                    ssem.at[slot, 1]).wait()

        start(first % 2, first)

        def step(i, carry):
            m, l, acc = carry
            slot = i % 2
            start(1 - slot, i + 1)
            wait(slot, i)
            kb = k_sc[slot]  # (KV, blk, D) cache dtype
            vb = v_sc[slot]
            # batched over KV: (KV, rep, D) x (KV, blk, D) -> (KV, rep, blk)
            s = jax.lax.dot_general(
                q, kb.astype(jnp.float32),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if quant:
                s = s * ks_sc[slot][:, None, :]          # (KV, 1, blk)
            idx = jax.lax.broadcasted_iota(jnp.int32, (KV, rep, blk), 2) + i * blk
            ok = idx < L
            if window > 0:
                ok &= idx >= win_lo
            s = jnp.where(ok, s, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
            # exp(-inf - -inf) guards: a FULLY-masked block (tight sliding
            # window straddling a block boundary) must contribute zeros,
            # not NaN (cf. parallel/sp.py's online-softmax guards)
            p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
            corr = jnp.where(jnp.isfinite(m), jnp.exp(m - m_new), 0.0)
            l = l * corr + jnp.sum(p, axis=2, keepdims=True)
            pv = p * vs_sc[slot][:, None, :] if quant else p
            acc = acc * corr + jax.lax.dot_general(
                pv, vb.astype(jnp.float32),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # (KV, rep, D)
            return m_new, l, acc

        m0 = jnp.full((KV, rep, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((KV, rep, 1), jnp.float32)
        a0 = jnp.zeros((KV, rep, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(first, nblk, step, (m0, l0, a0))
        write_copies = []
        if write:
            # commit the current token into the (aliased) cache at row L.
            # Started AFTER the read loop: the trailing read block can
            # cover row L (its bytes are masked, but don't race the DMA);
            # waited at the very end so the 16 KB write overlaps the
            # final online-softmax step and output store.
            ckw = ck_ref[0].astype(jnp.float32)  # (KV, Dl)
            cvw = cv_ref[0].astype(jnp.float32)
            if quant:
                # the _quantize_kv convention (models/llama.py): one
                # absmax/127 scale per vector, computed pre-padding
                ksc_w = jnp.maximum(jnp.max(jnp.abs(ckw), -1), 1e-20) / 127.0
                vsc_w = jnp.maximum(jnp.max(jnp.abs(cvw), -1), 1e-20) / 127.0
                ckw = jnp.clip(jnp.round(ckw / ksc_w[:, None]), -127, 127)
                cvw = jnp.clip(jnp.round(cvw / vsc_w[:, None]), -127, 127)
                wks_sc[:, 0] = ksc_w.astype(jnp.float32)
                wvs_sc[:, 0] = vsc_w.astype(jnp.float32)
            if Dl != D:
                padw = jnp.zeros((KV, D - Dl), jnp.float32)
                ckw = jnp.concatenate([ckw, padw], axis=-1)
                cvw = jnp.concatenate([cvw, padw], axis=-1)
            wk_sc[:, 0, :] = ckw.astype(wk_sc.dtype)
            wv_sc[:, 0, :] = cvw.astype(wv_sc.dtype)
            write_copies = [
                pltpu.make_async_copy(
                    wk_sc, k_out_ref.at[li, b, :, pl.ds(L, 1), :],
                    wsem.at[0]),
                pltpu.make_async_copy(
                    wv_sc, v_out_ref.at[li, b, :, pl.ds(L, 1), :],
                    wsem.at[1]),
            ]
            if quant:
                write_copies += [
                    pltpu.make_async_copy(
                        wks_sc, ks_out_ref.at[li, b, :, pl.ds(L, 1)],
                        wsem.at[2]),
                    pltpu.make_async_copy(
                        wvs_sc, vs_out_ref.at[li, b, :, pl.ds(L, 1)],
                        wsem.at[3]),
                ]
            for cp in write_copies:
                cp.start()
        if append:
            # final online step over the current token (always valid --
            # a fresh sequence has L == 0 and skips the loop entirely)
            ck = ck_ref[0].astype(jnp.float32)  # (KV, Dl)
            cv = cv_ref[0].astype(jnp.float32)
            if Dl != D:
                pad = jnp.zeros((KV, D - Dl), jnp.float32)
                ck = jnp.concatenate([ck, pad], axis=-1)
                cv = jnp.concatenate([cv, pad], axis=-1)
            s_c = jnp.sum(q * ck[:, None, :], axis=-1,
                          keepdims=True)                  # (KV, rep, 1)
            m_new = jnp.maximum(m, s_c)
            p_c = jnp.exp(s_c - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + p_c
            acc = acc * corr + p_c * cv[:, None, :]
        o = acc / jnp.maximum(l, 1e-30)
        if Dl != D:
            o = o[..., :Dl]
        o_ref[0] = o.astype(o_ref.dtype)
        for cp in write_copies:
            cp.wait()

    scoped = dict(
        k_sc=pltpu.VMEM((2, KV, blk, D), k_ref.dtype),
        v_sc=pltpu.VMEM((2, KV, blk, D), v_ref.dtype),
        sem=pltpu.SemaphoreType.DMA((2, 2)),
    )
    if quant:
        scoped.update(
            ks_sc=pltpu.VMEM((2, KV, blk), jnp.float32),
            vs_sc=pltpu.VMEM((2, KV, blk), jnp.float32),
            ssem=pltpu.SemaphoreType.DMA((2, 2)),
        )
    if write:
        scoped.update(
            wk_sc=pltpu.VMEM((KV, 1, D), k_ref.dtype),
            wv_sc=pltpu.VMEM((KV, 1, D), v_ref.dtype),
            wsem=pltpu.SemaphoreType.DMA((4,) if quant else (2,)),
        )
        if quant:
            scoped.update(
                wks_sc=pltpu.VMEM((KV, 1), jnp.float32),
                wvs_sc=pltpu.VMEM((KV, 1), jnp.float32),
            )
    pl.run_scoped(body, **scoped)


def _pick_blk(S: int, KV: int, D: int, itemsize: int,
              vmem_budget: int = 4 << 20, quant: bool = False) -> int:
    """Largest 128-multiple block with 2 double-buffered k+v scratch copies
    inside the VMEM budget (kept well under the ~16 MB core VMEM so the
    scratch doesn't evict neighboring kernels' pipeline buffers).

    quant: the per-vector scale buffers (L, B, KV, S) ride beside the
    codes, and THEIR slice along S is the LANE dimension -- Mosaic
    requires 128-aligned lane slices, so blk must be a 128-multiple
    divisor of S (a 224-divisor pick compiled fine for the 5D codes,
    where S is the sublane dim, then failed on the scale DMA at the
    ctx-8k shape S=8064: bench_artifacts/r5/longctx_ab.log)."""
    per_row = 4 * KV * D * itemsize  # 2 slots x (k, v) per sequence position
    blk = max(128, (vmem_budget // per_row) // 128 * 128)
    blk = min(blk, S)
    if S % blk:
        # largest divisor of S within budget beats gcd shrinkage: blk=64
        # (gcd(128, 320)) measured 184 us/layer at pos 300 vs ~5 us at
        # blk=128 -- small strided DMA blocks serialize the pipeline
        step = 128 if quant else 8
        divs = [d for d in range(step, blk + 1, step)
                if S % d == 0 and d * per_row // 4 * 4 <= vmem_budget]
        blk = max(divs) if divs else int(np.gcd(blk, S))
    # Mosaic DMA slices along S must be 8-aligned (sublane tiling) -- and
    # 128-aligned in quant mode (scale lane slices); odd allocations
    # (e.g. S=27) would yield an uncompilable blk
    align = 128 if quant else 8
    assert blk % align == 0, (
        f"cache max_len {S} must be a multiple of {align} for the "
        "flash-decode kernel (KVCache allocations should round up)")
    return blk


@functools.partial(jax.jit,
                   static_argnames=("blk", "interpret", "scale", "window"))
def flash_decode_stacked(q: jax.Array, k_all: jax.Array, v_all: jax.Array,
                         kv_lens: jax.Array, layer: jax.Array, blk: int = 0,
                         interpret: bool | None = None,
                         scale: float | None = None,
                         k_scale: jax.Array | None = None,
                         v_scale: jax.Array | None = None,
                         window: int = 0) -> jax.Array:
    """Single-step attention over layer `layer` of a stacked cache.

    q (B, KV, rep, Dl); k_all/v_all (L, B, KV, S, Dp); kv_lens (B,) valid
    entries (current token already written); layer: traced int32 scalar.
    Returns (B, KV, rep, Dl) in q.dtype.  Dl <= Dp: the kernel zero-extends
    q and slices the output in-kernel.  scale: softmax scale; defaults to
    1/sqrt(Dl).  Dp (cache head_dim) must be a lane (128) multiple on
    hardware (KVCache.create pads).  k_scale/v_scale (L, B, KV, S) f32:
    per-vector scales of an int8-quantized cache (KVCache quant mode).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, KV, rep, Dl = q.shape
    S = k_all.shape[3]
    Dp = k_all.shape[4]
    if scale is None:
        scale = 1.0 / float(np.sqrt(Dl))
    quant = k_scale is not None
    assert Dl <= Dp, (Dl, Dp)
    assert interpret or Dp % 128 == 0, (
        f"cache head_dim {Dp} must be lane-aligned (KVCache.create pads)")
    if not blk:
        blk = _pick_blk(S, KV, Dp, k_all.dtype.itemsize, quant=quant)
    else:
        blk = min(blk, S)
        if S % blk:
            blk = int(np.gcd(blk, S))

    # lens/li ride as plain SMEM inputs, NOT PrefetchScalarGridSpec:
    # runtime-dynamic scalar prefetch stalls the pipeline ~15 us per call
    # (measured in-model: 450 tok/s with prefetched pos-derived lens vs
    # 534.6 with a constant) because the scalars must land in SMEM before
    # the grid starts; regular SMEM operands flow with the normal operand
    # pipeline.  Neither value is used in an index_map, so prefetch
    # semantics aren't needed.
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # lens (B,)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # li (1,)
        pl.BlockSpec((1, KV, rep, Dl), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # q
        pl.BlockSpec(memory_space=pltpu.HBM),    # k: full ref, stays HBM
        pl.BlockSpec(memory_space=pltpu.HBM),    # v
    ]
    operands = [kv_lens.astype(jnp.int32),
                jnp.asarray(layer, jnp.int32).reshape(1), q, k_all, v_all]
    if quant:
        in_specs += [pl.BlockSpec(memory_space=pltpu.HBM),   # k_scale
                     pl.BlockSpec(memory_space=pltpu.HBM)]   # v_scale
        operands += [k_scale, v_scale]
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KV, rep, Dl), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    sc_bytes = 2 * B * KV * S * 4 if quant else 0
    cost = pl.CostEstimate(
        flops=2 * 2 * B * KV * rep * S * Dp,
        bytes_accessed=2 * B * KV * S * Dp * k_all.dtype.itemsize + sc_bytes,
        transcendentals=B * KV * rep * S,
    )
    return pl.pallas_call(
        functools.partial(_kernel, blk=blk, scale=scale, dp=Dp, quant=quant,
                          window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, rep, Dl), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit,
                   static_argnames=("blk", "interpret", "scale", "window"))
def flash_decode_stacked_append(q: jax.Array, k_all: jax.Array,
                                v_all: jax.Array, cached_lens: jax.Array,
                                layer: jax.Array, cur_k: jax.Array,
                                cur_v: jax.Array, blk: int = 0,
                                interpret: bool | None = None,
                                scale: float | None = None,
                                k_scale: jax.Array | None = None,
                                v_scale: jax.Array | None = None,
                                window: int = 0) -> jax.Array:
    """flash_decode_stacked where the CURRENT token's k/v ride as operands
    (cur_k/cur_v (B, KV, Dl)) instead of being read back from the cache.

    cached_lens (B,) counts ALREADY-WRITTEN entries (the slot position,
    EXCLUDING the current token).  This decouples attention from the cache
    write, so the model can defer all layers' writes and commit them in
    one batched update per step (models/llama.forward deferred-KV mode)
    instead of 2 dynamic_update_slices per layer.  k_scale/v_scale: int8
    cache per-vector scales (the CURRENT token's cur_k/cur_v stay float,
    so its attention contribution is exact)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, KV, rep, Dl = q.shape
    S = k_all.shape[3]
    Dp = k_all.shape[4]
    if scale is None:
        scale = 1.0 / float(np.sqrt(Dl))
    quant = k_scale is not None
    assert Dl <= Dp, (Dl, Dp)
    assert cur_k.shape == (B, KV, Dl), (cur_k.shape, (B, KV, Dl))
    assert interpret or Dp % 128 == 0, (
        f"cache head_dim {Dp} must be lane-aligned (KVCache.create pads)")
    if not blk:
        blk = _pick_blk(S, KV, Dp, k_all.dtype.itemsize, quant=quant)
    else:
        blk = min(blk, S)
        if S % blk:
            blk = int(np.gcd(blk, S))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # cached_lens (B,)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # li (1,)
        pl.BlockSpec((1, KV, rep, Dl), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # q
        pl.BlockSpec(memory_space=pltpu.HBM),    # k: full ref, stays HBM
        pl.BlockSpec(memory_space=pltpu.HBM),    # v
    ]
    operands = [cached_lens.astype(jnp.int32),
                jnp.asarray(layer, jnp.int32).reshape(1), q, k_all, v_all]
    if quant:
        in_specs += [pl.BlockSpec(memory_space=pltpu.HBM),   # k_scale
                     pl.BlockSpec(memory_space=pltpu.HBM)]   # v_scale
        operands += [k_scale, v_scale]
    in_specs += [
        pl.BlockSpec((1, KV, Dl), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),   # cur_k
        pl.BlockSpec((1, KV, Dl), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),   # cur_v
    ]
    operands += [cur_k, cur_v]
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KV, rep, Dl), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    sc_bytes = 2 * B * KV * S * 4 if quant else 0
    cost = pl.CostEstimate(
        flops=2 * 2 * B * KV * rep * S * Dp,
        bytes_accessed=2 * B * KV * S * Dp * k_all.dtype.itemsize + sc_bytes,
        transcendentals=B * KV * rep * S,
    )
    return pl.pallas_call(
        functools.partial(_kernel, blk=blk, scale=scale, dp=Dp, append=True,
                          quant=quant, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, rep, Dl), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit,
                   static_argnames=("blk", "interpret", "scale", "window"))
def flash_decode_stacked_append_write(
        q: jax.Array, k_all: jax.Array, v_all: jax.Array,
        cached_lens: jax.Array, layer: jax.Array, cur_k: jax.Array,
        cur_v: jax.Array, blk: int = 0, interpret: bool | None = None,
        scale: float | None = None, k_scale: jax.Array | None = None,
        v_scale: jax.Array | None = None, window: int = 0):
    """flash_decode_stacked_append that ALSO commits cur_k/cur_v into the
    cache at row cached_lens[b] inside the kernel (aliased in/out cache
    refs -- `input_output_aliases`), replacing the decode step's XLA
    dynamic_update_slice writes entirely.

    Returns (o, k_all', v_all') -- or (o, k_all', v_all', k_scale',
    v_scale') in int8-cache mode, where the row is quantized in-kernel
    with the per-vector absmax/127 convention (_quantize_kv) and the
    CURRENT step's attention still uses the exact float operands.

    The decode-glue motivation: the per-layer cache writes measured
    228 us/step on bitnet-3b (52 dynamic_update_slices,
    bench_artifacts/r5/decode_breakdown.log ablation); in-kernel the
    commit is one overlapped 16 KB DMA per layer.  The reference's analog
    is the ggml KV write between llama_cpp_init and the attention ops
    (absent fork); there is no reference counterpart to fuse-with-
    attention -- this is TPU-native design per SURVEY.md section 7.3
    ("decode is memory-bound and tiny ... avoiding HBM round-trips").
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, KV, rep, Dl = q.shape
    S = k_all.shape[3]
    Dp = k_all.shape[4]
    if scale is None:
        scale = 1.0 / float(np.sqrt(Dl))
    quant = k_scale is not None
    assert Dl <= Dp, (Dl, Dp)
    assert cur_k.shape == (B, KV, Dl), (cur_k.shape, (B, KV, Dl))
    assert interpret or Dp % 128 == 0, (
        f"cache head_dim {Dp} must be lane-aligned (KVCache.create pads)")
    if not blk:
        blk = _pick_blk(S, KV, Dp, k_all.dtype.itemsize, quant=quant)
    else:
        blk = min(blk, S)
        if S % blk:
            blk = int(np.gcd(blk, S))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # cached_lens (B,)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # li (1,)
        pl.BlockSpec((1, KV, rep, Dl), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # q
        pl.BlockSpec(memory_space=pltpu.HBM),    # k: full ref, stays HBM
        pl.BlockSpec(memory_space=pltpu.HBM),    # v
    ]
    operands = [cached_lens.astype(jnp.int32),
                jnp.asarray(layer, jnp.int32).reshape(1), q, k_all, v_all]
    if quant:
        in_specs += [pl.BlockSpec(memory_space=pltpu.HBM),   # k_scale
                     pl.BlockSpec(memory_space=pltpu.HBM)]   # v_scale
        operands += [k_scale, v_scale]
    in_specs += [
        pl.BlockSpec((1, KV, Dl), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),   # cur_k
        pl.BlockSpec((1, KV, Dl), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),   # cur_v
    ]
    operands += [cur_k, cur_v]
    out_shapes = [jax.ShapeDtypeStruct((B, KV, rep, Dl), q.dtype),
                  jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
                  jax.ShapeDtypeStruct(v_all.shape, v_all.dtype)]
    out_specs = [pl.BlockSpec((1, KV, rep, Dl), lambda b: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec(memory_space=pltpu.HBM),
                 pl.BlockSpec(memory_space=pltpu.HBM)]
    aliases = {3: 1, 4: 2}  # k_all -> k_out, v_all -> v_out
    if quant:
        out_shapes += [jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                       jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)]
        out_specs += [pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)]
        aliases.update({5: 3, 6: 4})
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    sc_bytes = 2 * B * KV * S * 4 if quant else 0
    cost = pl.CostEstimate(
        flops=2 * 2 * B * KV * rep * S * Dp,
        bytes_accessed=2 * B * KV * S * Dp * k_all.dtype.itemsize + sc_bytes,
        transcendentals=B * KV * rep * S,
    )
    return pl.pallas_call(
        functools.partial(_kernel, blk=blk, scale=scale, dp=Dp, append=True,
                          quant=quant, window=window, write=True),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        cost_estimate=cost,
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)


def flash_decode(q: jax.Array, k: jax.Array, v: jax.Array,
                 kv_lens: jax.Array, blk: int = 0,
                 interpret: bool | None = None,
                 scale: float | None = None) -> jax.Array:
    """Single-layer convenience wrapper: k/v (B, KV, S, D).

    Pads the CACHE's D to the 128-lane tile if needed (copies! keep cache
    allocations padded -- KVCache.create -- to stay copy-free); q and the
    output stay at the logical head_dim (handled in-kernel)."""
    B, KV, rep, D = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    Dc = k.shape[-1]
    if not interpret and Dc % 128:
        pad = 128 - Dc % 128
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad)))
    return flash_decode_stacked(q, k[None], v[None], kv_lens,
                                jnp.int32(0), blk=blk, interpret=interpret,
                                scale=scale)
