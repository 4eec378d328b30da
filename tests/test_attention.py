"""Flash-decode kernel vs masked-softmax oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.ops.pallas.attention_kernel import flash_decode


def _oracle(q, k, v, lens):
    B, KV, rep, D = q.shape
    S = k.shape[2]
    s = np.einsum("bhrd,bhsd->bhrs", q.astype(np.float32),
                  k.astype(np.float32)) / np.sqrt(D)
    mask = np.arange(S)[None, None, None, :] < lens[:, None, None, None]
    s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhrs,bhsd->bhrd", p, v.astype(np.float32))


@pytest.mark.parametrize("rep,KV", [(1, 4), (4, 2)])  # MHA and GQA shapes
@pytest.mark.parametrize("S,blk", [(64, 32), (96, 32)])
def test_flash_decode_matches_oracle(rep, KV, S, blk):
    rng = np.random.default_rng(0)
    B, D = 3, 128
    q = rng.standard_normal((B, KV, rep, D)).astype(np.float32)
    k = rng.standard_normal((B, KV, S, D)).astype(np.float32)
    v = rng.standard_normal((B, KV, S, D)).astype(np.float32)
    lens = np.array([1, S // 2 + 1, S])  # per-slot lengths incl. edge cases
    got = np.asarray(flash_decode(
        jnp.asarray(q, jnp.float32), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lens), blk=blk, interpret=True))
    ref = _oracle(q, k, v, lens)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_flash_decode_unpadded_head_dim():
    """head_dim=100 (BitNet) -- not a lane multiple."""
    rng = np.random.default_rng(1)
    B, KV, rep, D, S = 2, 2, 1, 100, 64
    q = rng.standard_normal((B, KV, rep, D)).astype(np.float32)
    k = rng.standard_normal((B, KV, S, D)).astype(np.float32)
    v = rng.standard_normal((B, KV, S, D)).astype(np.float32)
    lens = np.array([5, 64])
    got = np.asarray(flash_decode(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), jnp.asarray(lens),
                                  blk=32, interpret=True))
    np.testing.assert_allclose(got, _oracle(q, k, v, lens), rtol=2e-5, atol=2e-5)


def test_forward_decode_uses_flash_path_equivalence():
    """The model's XLA attention path and the flash kernel agree on a real
    decode configuration (bf16 tolerance)."""
    rng = np.random.default_rng(2)
    B, KV, rep, D, S = 2, 4, 2, 128, 128
    q = (rng.standard_normal((B, KV, rep, D)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((B, KV, S, D)) * 0.5).astype(np.float32)
    v = (rng.standard_normal((B, KV, S, D)) * 0.5).astype(np.float32)
    lens = np.array([37, 128])
    qb = jnp.asarray(q, jnp.bfloat16)
    kb = jnp.asarray(k, jnp.bfloat16)
    vb = jnp.asarray(v, jnp.bfloat16)
    got = np.asarray(flash_decode(qb, kb, vb, jnp.asarray(lens),
                                  blk=64, interpret=True), np.float32)
    ref = _oracle(np.asarray(qb, np.float32), np.asarray(kb, np.float32),
                  np.asarray(vb, np.float32), lens)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
