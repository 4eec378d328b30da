"""Fused residual-block kernel (wo+norm+gate_up+swiglu+down) vs the
step-by-step oracle and the separate production kernels (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.ops.pallas.block_kernel import wo_mlp_block
from tmac_tpu.ops.qgemm import QuantizedTensor
from tmac_tpu.utils import nmse


def _per_tensor_qt(rng, K, M, s=0.02):
    wq = rng.integers(1, 4, (K, M)).astype(np.uint8)
    sc = np.full((1, M), s, np.float32)
    qt = QuantizedTensor.from_quantized(wq, sc, 2 * sc, bits=2, group_size=K)
    wdq = (wq.astype(np.float32) - 2.0) * s
    return qt, wdq


def _quant(x):
    sc = np.maximum(np.abs(x).max(axis=1, keepdims=True), 1e-20) / 127.0
    q = np.clip(np.rint(x / sc), -127, 127)
    return q, sc


def test_block_kernel_matches_oracle():
    rng = np.random.default_rng(0)
    H, I = 256, 384
    wo, wo_dq = _per_tensor_qt(rng, H, H)
    gu, gu_dq = _per_tensor_qt(rng, H, 2 * I)
    dn, dn_dq = _per_tensor_qt(rng, I, H)
    attn = rng.standard_normal((1, H)).astype(np.float32)
    resid = rng.standard_normal((1, H)).astype(np.float32)
    norm_w = (1.0 + 0.1 * rng.standard_normal(H)).astype(np.float32)
    eps = 1e-6

    got = np.asarray(wo_mlp_block(
        jnp.asarray(attn), jnp.asarray(resid), jnp.asarray(norm_w),
        wo, gu, dn, eps, interpret=True))

    # oracle replicating the kernel's exact quantization steps
    q1, s1 = _quant(attn)
    x2 = s1 * (q1 @ wo_dq) + resid
    var = np.mean(x2 ** 2, axis=1, keepdims=True)
    xn = x2 / np.sqrt(var + eps) * norm_w
    q2, s2 = _quant(xn)
    guo = s2 * (q2 @ gu_dq)
    g, u = guo[:, :I], guo[:, I:]
    prod = g / (1 + np.exp(-g)) * u
    q3, s3 = _quant(prod)
    out = s3 * (q3 @ dn_dq) + x2

    assert nmse(out, got) < 1e-9, nmse(out, got)


def test_block_kernel_matches_separate_kernels():
    """Same block through the separate production qgemm calls (fused
    folds) -- small numeric drift only (different quant rounding points)."""
    from tmac_tpu.ops.pallas.qgemm_kernel import qgemm_pallas
    rng = np.random.default_rng(1)
    H, I = 256, 384
    wo, _ = _per_tensor_qt(rng, H, H)
    gu, _ = _per_tensor_qt(rng, H, 2 * I)
    dn, _ = _per_tensor_qt(rng, I, H)
    attn = rng.standard_normal((1, H)).astype(np.float32)
    resid = rng.standard_normal((1, H)).astype(np.float32)
    norm_w = jnp.asarray(1.0 + 0.1 * rng.standard_normal(H), jnp.bfloat16)
    eps = 1e-6

    got = np.asarray(wo_mlp_block(
        jnp.asarray(attn), jnp.asarray(resid), jnp.asarray(norm_w),
        wo, gu, dn, eps, interpret=True))

    ab = jnp.asarray(attn, jnp.bfloat16)
    x2 = np.asarray(qgemm_pallas(ab, wo, interpret=True, act="fused",
                                 out_dtype=jnp.float32,
                                 residual=jnp.asarray(resid)))
    guo = np.asarray(qgemm_pallas(jnp.asarray(x2, jnp.bfloat16), gu,
                                  interpret=True, act="fused",
                                  out_dtype=jnp.float32,
                                  norm=(norm_w, eps)))
    ref = np.asarray(qgemm_pallas(jnp.asarray(guo, jnp.bfloat16), dn,
                                  interpret=True, act="fused",
                                  out_dtype=jnp.float32, glu=True,
                                  residual=jnp.asarray(x2)))
    assert nmse(ref, got) < 2e-4, nmse(ref, got)


def test_block_kernel_rejects_grouped():
    rng = np.random.default_rng(2)
    H, I = 256, 384
    wo, _ = _per_tensor_qt(rng, H, H)
    gu, _ = _per_tensor_qt(rng, H, 2 * I)
    w = rng.standard_normal((I, H)).astype(np.float32)
    dn_grouped = QuantizedTensor.from_float(w, bits=2, group_size=128)
    with pytest.raises(AssertionError):
        wo_mlp_block(jnp.zeros((1, H)), jnp.zeros((1, H)),
                     jnp.ones((H,)), wo, gu, dn_grouped, 1e-6,
                     interpret=True)
