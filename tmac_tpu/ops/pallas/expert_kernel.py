"""Expert-indexed mpGEMM: decode-shaped matmul against ONE expert of a
stacked MoE weight tensor, selected by a traced index, with ZERO weight
copies.

The problem this solves (models/moe.py 'select' path): XLA can gather the
routed expert's weights out of the (E, ...) stack only by materializing a
copy -- read + write + kernel re-read is ~3 bytes moved per selected-
expert byte.  Scalar-prefetch indexing through the standard BlockSpec
pipeline is also out: a runtime-dynamic prefetch scalar stalls ~15 us per
launch (measured; see attention_kernel.py).  So this kernel follows the
flash-decode pattern instead: the stacked weights stay HBM-resident
(memory_space=HBM), the expert index rides in SMEM, and the kernel body
DMAs (KP, bm) packed blocks of expert e directly -- double-buffered
across M-blocks -- unpacks, and runs the same chunked int8-MXU math as
the production qgemm kernel.  HBM traffic = exactly the selected
expert's bytes, the T-MAC bandwidth contract (reference tbl.cc role)
extended to MoE: a top-2 of 8 experts reads 4x less than the dense
masked form and 3x less than the gather form.

Scope (decode expert FFNs): N small, bits in {1, 2, 4}, float x with
in-kernel activation quantization (+ optional SwiGLU prologue for the
down projection), grouped or per-tensor scales, no k-padding.  The
general-shape / act-variant cases stay on qgemm_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tmac_tpu.ops.pallas.qgemm_kernel import (_unpack_block,
                                              _unpack_block_swar)


def _expert_kernel(e_ref, x_ref, wp_hbm, sc_hbm, sb_hbm, o_ref, *,
                   N: int, K: int, Mp: int, bits: int, gs: int, bm: int,
                   glu: bool, swar: bool, out_dtype):
    """Grid (1,).  e_ref (1,) SMEM; x_ref (N, K[*2]) VMEM; wp/sc/sb are
    FULL HBM-resident stacked refs (E, KP, Mp) / (E, G, Mp); o_ref (N, Mp)
    VMEM."""
    p = 8 // bits
    kb = K // p
    chunk = min(gs, kb)
    nchunks = kb // chunk
    G = K // gs
    KP = K // p
    nblk = Mp // bm
    e = e_ref[0]
    unpack = _unpack_block_swar if swar else _unpack_block

    def body(wp_sc, sc_sc, sb_sc, sem):
        # ---- activation prologue (once): optional SwiGLU, then per-group
        # int8 quantization + dequantized group sums for the zero fold
        # (same math as qgemm_kernel's fused prologue)
        xf = x_ref[:].astype(jnp.float32)
        if glu:
            g_half = xf[:, :K]
            xf = g_half * jax.nn.sigmoid(g_half) * xf[:, K:]
        xg = xf.reshape(N, G, gs)
        amax = jnp.max(jnp.abs(xg), axis=2, keepdims=True)
        sc_g = jnp.maximum(amax, 1e-20) / 127.0
        xq = jnp.clip(jnp.rint(xg / sc_g), -127, 127).reshape(N, K)
        xs = sc_g[..., 0]                                  # (N, G) f32
        xsum = jnp.sum(xq.reshape(N, G, gs), axis=2) * xs  # (N, G) dequant
        x = xq.astype(jnp.int8)

        def start(slot, i):
            @pl.when(i < nblk)
            def _():
                off = pl.multiple_of(i * bm, bm)
                pltpu.make_async_copy(
                    wp_hbm.at[e, :, pl.ds(off, bm)], wp_sc.at[slot],
                    sem.at[slot, 0]).start()
                pltpu.make_async_copy(
                    sc_hbm.at[e, :, pl.ds(off, bm)], sc_sc.at[slot],
                    sem.at[slot, 1]).start()
                pltpu.make_async_copy(
                    sb_hbm.at[e, :, pl.ds(off, bm)], sb_sc.at[slot],
                    sem.at[slot, 2]).start()

        def wait(slot, i):
            off = pl.multiple_of(i * bm, bm)
            pltpu.make_async_copy(
                wp_hbm.at[e, :, pl.ds(off, bm)], wp_sc.at[slot],
                sem.at[slot, 0]).wait()
            pltpu.make_async_copy(
                sc_hbm.at[e, :, pl.ds(off, bm)], sc_sc.at[slot],
                sem.at[slot, 1]).wait()
            pltpu.make_async_copy(
                sb_hbm.at[e, :, pl.ds(off, bm)], sb_sc.at[slot],
                sem.at[slot, 2]).wait()

        start(0, 0)

        def step(i, _):
            slot = i % 2
            start(1 - slot, i + 1)
            wait(slot, i)
            if swar:
                wp32 = pltpu.bitcast(wp_sc[slot], jnp.int32)
            else:
                wp32 = wp_sc[slot].astype(jnp.int32)
            scales = sc_sc[slot].astype(jnp.float32)  # (G, bm)
            sub = sb_sc[slot].astype(jnp.float32)
            if G == 1:
                # per-tensor: exact int32 accumulation, one final scale
                acc = jnp.zeros((N, bm), jnp.int32)
                for j in range(p):
                    v = unpack(wp32, bits, j)
                    acc = acc + jax.lax.dot_general(
                        x[:, j * kb:(j + 1) * kb],
                        v if swar else v.astype(jnp.int8),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                out = (acc.astype(jnp.float32) * scales[0][None, :] * xs
                       - xsum * sub[0][None, :])
            else:
                acc = jnp.zeros((N, bm), jnp.float32)
                for j in range(p):
                    v = unpack(wp32, bits, j)
                    v8 = v if swar else v.astype(jnp.int8)
                    for c in range(nchunks):
                        k0 = j * kb + c * chunk
                        g = k0 // gs
                        part = jax.lax.dot_general(
                            x[:, k0:k0 + chunk],
                            v8[c * chunk:(c + 1) * chunk, :],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        ).astype(jnp.float32)
                        acc = acc + part * (xs[:, g:g + 1]
                                            * scales[g][None, :])
                # zero-offset fold through the dequantized group sums
                out = acc - jax.lax.dot_general(
                    xsum, sub,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            o_ref[:, pl.ds(pl.multiple_of(i * bm, bm), bm)] = \
                out.astype(out_dtype)
            return 0

        jax.lax.fori_loop(0, nblk, step, 0)

    sdt = sc_hbm.dtype
    pl.run_scoped(
        body,
        wp_sc=pltpu.VMEM((2, KP, bm), jnp.uint8),
        sc_sc=pltpu.VMEM((2, G, bm), sdt),
        sb_sc=pltpu.VMEM((2, G, bm), sdt),
        sem=pltpu.SemaphoreType.DMA((2, 3)),
    )


def _pick_bm(Mp: int, KP: int, G: int, sdt_size: int,
             budget: int = 8 << 20) -> int:
    """Largest 128-multiple divisor of Mp whose double-buffered scratch
    (2 x (packed + scales + sub)) fits the VMEM budget AND leaves >= 2
    blocks, so the next block's DMA overlaps the current block's
    unpack+MXU work (a single block serializes DMA then compute -- the
    ~40% decode penalty measured for the main qgemm kernel).  Only
    Mp = 128 has no 2-block divisor and runs as one block."""
    per_lane = 2 * (KP + 2 * G * sdt_size)
    best = 128
    for d in range(1, Mp // 128 + 1):
        bm = 128 * d
        if Mp % bm:
            continue
        if bm * per_lane <= budget and Mp // bm >= 2:
            best = max(best, bm)
    return min(best, Mp)


@functools.partial(jax.jit, static_argnames=(
    "meta", "glu", "out_dtype", "bm", "interpret"))
def _expert_call(x, packed, scales, sub, e, meta, glu, out_dtype, bm,
                 interpret):
    N = x.shape[0]
    bits, gs, K, Mp = meta
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    swar = not interpret
    G = K // gs
    if not bm:
        bm = _pick_bm(Mp, K // (8 // bits), G, scales.dtype.itemsize)
    grid_spec = pl.GridSpec(
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # e (1,)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x (whole)
            pl.BlockSpec(memory_space=pltpu.HBM),    # packed (E, KP, Mp)
            pl.BlockSpec(memory_space=pltpu.HBM),    # scales (E, G, Mp)
            pl.BlockSpec(memory_space=pltpu.HBM),    # sub
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    cost = pl.CostEstimate(
        flops=2 * N * K * Mp,
        bytes_accessed=packed.shape[1] * Mp
        + 2 * G * Mp * scales.dtype.itemsize,
        transcendentals=N * K if glu else 0,
    )
    return pl.pallas_call(
        functools.partial(_expert_kernel, N=N, K=K, Mp=Mp, bits=bits,
                          gs=gs, bm=bm, glu=glu, swar=swar,
                          out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, Mp), out_dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.asarray(e, jnp.int32).reshape(1), x, packed, scales, sub)


def expert_kernel_supported(stacked, act_gs: int = 0) -> bool:
    """Whether a stacked QuantizedTensor fits this kernel's scope."""
    return (stacked.bits in (1, 2, 4)
            and stacked.packed_hi is None
            and stacked.packed.ndim == 3
            and act_gs == 0
            and stacked.k_shards == 1
            and stacked.kdim_padded == stacked.kdim)  # no k-padding


def qgemm_expert_pallas(x: jax.Array, stacked, e, out_dtype=jnp.float32,
                        glu: bool = False, bm: int = 0,
                        interpret: bool | None = None) -> jax.Array:
    """x (N, K[*2 when glu]) float @ expert e of a stacked QuantizedTensor
    (arrays carry a leading E axis; static meta describes one expert).
    Returns (N, mdim) in the LOGICAL column order (fused segments
    reassembled).  e: traced int32 scalar."""
    K, _ = stacked.shape
    Mp = stacked.packed.shape[2]
    gs = stacked.group_size if stacked.group_size < K else K
    meta = (stacked.bits, gs, K, Mp)
    out = _expert_call(x, stacked.packed, stacked.scales, stacked.sub, e,
                       meta, glu, out_dtype, bm, interpret)
    return stacked.slice_m(out)
