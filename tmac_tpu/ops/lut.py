"""Executable specification of the T-MAC LUT-mpGEMM algorithm in pure JAX.

This module is the framework's *spec*: a direct, readable JAX realization of
the reference algorithm --

  1. bit-plane decomposition with signed states s' = 2s - 1 and the s0 = -1
     bias fold (reference python/t_mac/ops/qgemm.py:81-83),
  2. group-of-g=4 lookup tables over activations
     (reference python/t_mac/intrins/lut_ctor.cc:38-119),
  3. int8 LUT quantization with one scale + bias per act_group
     (reference python/t_mac/ops/qgemm.py:353-431),
  4. table lookup + accumulate + alpha recombination
     (reference python/t_mac/intrins/tbl.cc:323-532, ops/qgemm.py:192-206).

The production Pallas kernels (ops/pallas/) compute the *same math* through
bit-field extraction + MXU matmuls; tests assert they agree with this spec,
and this spec agrees with a dequantized-matmul oracle at NMSE <= 5e-4 (the
reference's gate, ops/qgemm.py:278).

Everything here is jit-able and differentiably irrelevant (inference only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tmac_tpu.utils import get_bits_alphas

MAXV = 127  # int8 LUT range (reference qgemm.py:381)


def sign_codes(g: int = 4) -> np.ndarray:
    """(2^g, g) matrix of signed states: row c, col j = 2*((c>>j)&1) - 1."""
    c = np.arange(1 << g)[:, None]
    j = np.arange(g)[None, :]
    return (2 * ((c >> j) & 1) - 1).astype(np.float32)


def build_lut(b: jax.Array, g: int = 4) -> jax.Array:
    """Build full-precision LUTs from activations.

    b: (..., K) activations. Returns (..., K//g, 2^g) where
    lut[..., k, c] = sum_j s_j(c) * b[..., k*g + j].

    Mirror symmetry lut[..., c] == -lut[..., 2^g-1-c] holds by construction
    (the reference exploits it to compute half the entries,
    lut_ctor.cc:50-71; on TPU the full table is one small matmul).
    """
    K = b.shape[-1]
    assert K % g == 0
    m = jnp.asarray(sign_codes(g).T, dtype=b.dtype)  # (g, 2^g)
    bg = b.reshape(*b.shape[:-1], K // g, g)
    return bg @ m


def quantize_lut(lut: jax.Array, act_group_size: int, g: int = 4):
    """Quantize LUTs to int8 with one scale + bias per act_group.

    lut: (..., K//g, 2^g). Returns (qlut int8, lut_scales (..., K//ags),
    lut_biases (..., K//ags)).

    scale  = absmax over all table entries in the act group / 127
             (reference qgemm.py:478-481 golden model; the C++ kernel
              approximates this with the max |group sum|, lut_ctor.cc:232-260
              -- we use the exact absmax, which can only reduce error),
    bias   = sum over the act group of lut[..., 0]
             (entry 0 = all states -1, so bias = -sum(b); this is the
              constant term of the s0=-1 fold, applied once per output with
              weight alphas[0], reference tbl.cc:374-376).
    """
    ng = lut.shape[-2]
    K = ng * g
    assert K % act_group_size == 0
    gpa = act_group_size // g  # tables per act group
    shape = lut.shape[:-2]
    lg = lut.reshape(*shape, K // act_group_size, gpa, lut.shape[-1])
    absmax = jnp.max(jnp.abs(lg), axis=(-1, -2))
    lut_scales = (absmax / MAXV).astype(lut.dtype)
    inv = jnp.where(lut_scales == 0, 0.0, 1.0 / lut_scales)
    qlut = jnp.rint(lg * inv[..., None, None]).astype(jnp.int8)
    qlut = qlut.reshape(*shape, ng, lut.shape[-1])
    lut_biases = jnp.sum(lg[..., 0], axis=-1).astype(lut.dtype)
    return qlut, lut_scales, lut_biases


def lut_ctor(b: jax.Array, act_group_size: int, g: int = 4):
    """Full preprocessor: activations -> (qlut, lut_scales, lut_biases).

    The analog of the reference preprocessor kernel
    (QGeMMLUTBitsPreprocessorCodegen, ops/qgemm.py:353-519).
    """
    return quantize_lut(build_lut(b, g), act_group_size, g)


def lut_gemm_spec(
    qlut: jax.Array,
    lut_scales: jax.Array,
    lut_biases: jax.Array,
    idx: np.ndarray | jax.Array,
    scales: jax.Array,
    sub: jax.Array,
    bits: int,
    group_size: int,
    act_group_size: int,
    g: int = 4,
    out_dtype=jnp.float32,
    fast_aggregation: bool = False,
) -> jax.Array:
    """Reference LUT-GEMM: gather + accumulate + alpha recombination.

    fast_aggregation=True models the reference's -fa mode (README.md:50,
    tbl.cc:86-141,367-376): the int8-domain sum over the ags/g tables of
    each act group is replaced by a rounding-halving-add tree (~sum/ActK
    with a positive rounding bias), compensated by lut_scale *= ActK and
    the closed-form bias shift (fast_aggregation_correction).  Requires
    act_group_size == group_size and a power-of-2 table count per group.

    qlut:       (N, K//g, 2^g) int8       quantized LUTs
    lut_scales: (N, K//ags)                per-act-group LUT scales
    lut_biases: (N, K//ags)                per-act-group bias folds
    idx:        (bits, K//g, M) uint8      per-plane LUT indices
                                           (ops/packing.py group_indices)
    scales:     (K//gs, M)                 weight scales
    sub:        (K//gs, M)                 weight zero offsets; dequant model
                                           Wdq = scales*wq - sub
    returns C:  (N, M) = B @ Wdq reconstructed from tables.

    Derivation: with wq = sum_b 2^b bit_b and mid = 2^(bits-1),
        Wdq[k,m] = s[k,m]*(wq - mid) + (s*mid - sub)[k,m]
        C[n,m]   = sum_b alphas[b] * sum_k s[k,m] * lutval_b(n,k,m)
                   + sum_k (s*mid - sub)[k,m] * b[n,k]
    where lutval_b(n,k,m) = qlut[n,kg,idx_b]*lut_scale and the second term
    uses sum_k b[n,k] over each act group = -lut_bias (entry-0 fold).
    The alphas[0]*lut_bias term inside the first sum is exactly the
    reference's bit-0-row bias add (tbl.cc:374-388).
    """
    N = qlut.shape[0]
    ng = qlut.shape[1]
    K = ng * g
    M = idx.shape[-1]
    alphas = get_bits_alphas(bits)
    idx = jnp.asarray(idx, dtype=jnp.int32)  # (bits, K//g, M)

    # Gather: vals[b, n, kg, m] = qlut[n, kg, idx[b, kg, m]]
    # (one take_along_axis per plane keeps memory modest)
    gpa = act_group_size // g
    nag = K // act_group_size
    gpw = group_size // g  # tables per weight group

    if fast_aggregation:
        assert act_group_size == group_size, \
            "fa spec models aligned act/weight groups"
        assert gpa & (gpa - 1) == 0, "fa needs power-of-2 tables per group"
        fa_scales, fa_biases = fast_aggregation_correction(
            lut_scales, lut_biases, gpa, bits)

    acc = jnp.zeros((N, M), dtype=jnp.float32)
    for b in range(bits):
        # (N, K//g, M)
        vals = jnp.take_along_axis(
            qlut, idx[b][None].repeat(N, axis=0), axis=-1
        ).astype(jnp.float32)
        if fast_aggregation:
            # int8-domain halving-add tree over each act group's tables
            # (the lossy part of -fa), then the ActK-corrected scale
            agg = halving_add_tree(
                vals.reshape(N, nag, gpa, M).astype(jnp.int32), axis=2)
            vs = agg.astype(jnp.float32) \
                * fa_scales[..., None].astype(jnp.float32)        # (N,nag,M)
            vs = vs * scales.astype(jnp.float32)[None, :, :]      # gs == ags
            acc = acc + alphas[b] * jnp.sum(vs, axis=1)
            continue
        # dequantize tables: per act group scale
        vs = vals.reshape(N, nag, gpa, M) * lut_scales[..., None, None].astype(jnp.float32)
        vs = vs.reshape(N, K // g, M)
        # weight scales per k-group
        vs = vs.reshape(N, K // group_size, gpw, M) * scales.astype(jnp.float32)[None, :, None, :]
        acc = acc + alphas[b] * jnp.sum(vs, axis=(1, 2))

    # constant term: wq = sum_i alphas[i]*b_i' + S with S = sum(alphas)
    # = 2^(bits-1) - 1/2  (the -1/2 is the s0=-1 gamma fold that the
    # reference applies as the bit-0-row lut_bias add, tbl.cc:374-376).
    # C += sum_k (s*S - sub) * b[n,k], and
    # sum_{k in act group} b[n,k] = -lut_bias[n, ag].
    S = float((1 << (bits - 1)) - 0.5)
    const = (S * scales - sub).astype(jnp.float32)  # (K//gs, M)
    # expand to act-group granularity (ags <= gs, aligned)
    assert group_size % act_group_size == 0 or act_group_size % group_size == 0
    if group_size >= act_group_size:
        rep = group_size // act_group_size
        const_ag = jnp.repeat(const, rep, axis=0)  # (K//ags, M)
    else:
        # multiple weight groups per act group: need per-k b-sums; fall back
        # to exact expansion via lut entry-0 per table is not available here,
        # so disallow (reference also requires ags to divide group_size).
        raise NotImplementedError("act_group_size must divide group_size")
    acc = acc + jnp.einsum("na,am->nm", -lut_biases.astype(jnp.float32), const_ag)
    if fast_aggregation:
        # the closed-form -fa bias shift lands where lut_bias is applied in
        # the kernel (once per bits-block at alphas[0] weight,
        # intrins/tbl.py:74-75); it is zero for ActK <= 8 (integer
        # log2(ActK)//4 in the reference formula)
        delta = (fa_biases - lut_biases).astype(jnp.float32)  # (N, nag)
        # weight-scaled like every lut_bias application (ags == gs here)
        acc = acc + alphas[0] * jnp.einsum(
            "na,am->nm", delta, scales.astype(jnp.float32))
    return acc.astype(out_dtype)


def halving_add_tree(vals: jax.Array, axis: int) -> jax.Array:
    """Signed rounding-halving-add reduction (NEON vrhaddq_s8 semantics:
    (a + b + 1) >> 1), the reference's "fast aggregation" adder
    (SignedHalvingAdder, tbl.cc:86-141).  Reduces 2^n elements along `axis`
    to ~sum/2^n with a small positive rounding bias.  On TPU this is *not*
    faster than exact int32 accumulation (the MXU accumulates natively) --
    it exists as an executable spec of the reference's -fa mode so its
    accuracy impact can be measured (README.md:50: +10-20% CPU speed for
    nonnegligible error)."""
    n = vals.shape[axis]
    assert n & (n - 1) == 0, f"fast aggregation needs a power-of-2 depth, got {n}"
    v = jnp.moveaxis(vals, axis, -1).astype(jnp.int32)
    while v.shape[-1] > 1:
        a = v[..., 0::2]
        b = v[..., 1::2]
        v = (a + b + 1) >> 1
    return v[..., 0]


def fast_aggregation_correction(lut_scales: jax.Array, lut_biases: jax.Array,
                                act_k: int, bits: int):
    """The closed-form bias/scale correction the reference applies when
    fast aggregation is on (tbl.cc:367-376, citing arXiv:2106.10860):
        lut_scale *= ActK
        lut_bias  -= lut_scale * (log2(ActK) / 4 * get_bias_scale(bits))
    with integer division (mylog2<ActK>::value / 4, both C++ ints) and
    get_bias_scale = 15/7/3/1 for bits 4/3/2/1 (tbl.cc:301-318: the summed
    alpha ratio (1/2+1+2+4)/(1/2) etc., applied on bit-0 rows only).
    Returns (scales', biases')."""
    import math
    bias_scale = {4: 15, 3: 7, 2: 3, 1: 1}[bits]
    s = lut_scales * act_k
    b = lut_biases - s * (int(math.log2(act_k)) // 4 * bias_scale)
    return s, b


def act_group_sums(b: jax.Array, group_size: int) -> jax.Array:
    """Per-group activation sums sum_{k in g} b[..., k] -> (..., K//gs)."""
    K = b.shape[-1]
    assert K % group_size == 0
    return jnp.sum(b.reshape(*b.shape[:-1], K // group_size, group_size), axis=-1)
