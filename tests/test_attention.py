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


def test_flash_decode_append_matches_stacked():
    """The append variant (current token's k/v as operands, cache holding
    only the prefix) must equal flash_decode over a cache that already
    contains the current token -- including a fresh slot (cached len 0)."""
    from tmac_tpu.ops.pallas.attention_kernel import (
        flash_decode_stacked, flash_decode_stacked_append)
    rng = np.random.default_rng(4)
    B, KV, rep, D, S, L = 3, 2, 4, 128, 64, 2
    q = jnp.asarray(rng.standard_normal((B, KV, rep, D)), jnp.float32)
    kc = rng.standard_normal((L, B, KV, S, D)).astype(np.float32)
    vc = rng.standard_normal((L, B, KV, S, D)).astype(np.float32)
    cached = np.array([0, 17, S - 1])  # fresh slot, mid, full-minus-one
    ck = rng.standard_normal((B, KV, D)).astype(np.float32)
    cv = rng.standard_normal((B, KV, D)).astype(np.float32)
    li = 1

    # reference: write the current token at position `cached` then run the
    # plain stacked kernel with lens = cached + 1
    kw, vw = kc.copy(), vc.copy()
    for b in range(B):
        kw[li, b, :, cached[b], :] = ck[b]
        vw[li, b, :, cached[b], :] = cv[b]
    want = np.asarray(flash_decode_stacked(
        q, jnp.asarray(kw), jnp.asarray(vw), jnp.asarray(cached + 1),
        jnp.int32(li), blk=32, interpret=True))

    got = np.asarray(flash_decode_stacked_append(
        q, jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(cached),
        jnp.int32(li), jnp.asarray(ck), jnp.asarray(cv), blk=32,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_decode_append_unpadded_head_dim():
    """Append variant with logical head_dim below the padded cache dim."""
    from tmac_tpu.ops.pallas.attention_kernel import (
        flash_decode_stacked, flash_decode_stacked_append)
    rng = np.random.default_rng(5)
    B, KV, rep, Dl, Dp, S = 2, 2, 2, 100, 128, 32
    q = jnp.asarray(rng.standard_normal((B, KV, rep, Dl)), jnp.float32)
    kc = np.zeros((1, B, KV, S, Dp), np.float32)
    vc = np.zeros((1, B, KV, S, Dp), np.float32)
    kc[..., :Dl] = rng.standard_normal((1, B, KV, S, Dl))
    vc[..., :Dl] = rng.standard_normal((1, B, KV, S, Dl))
    cached = np.array([5, 12])
    ck = rng.standard_normal((B, KV, Dl)).astype(np.float32)
    cv = rng.standard_normal((B, KV, Dl)).astype(np.float32)
    kw, vw = kc.copy(), vc.copy()
    for b in range(B):
        kw[0, b, :, cached[b], :Dl] = ck[b]
        vw[0, b, :, cached[b], :Dl] = cv[b]
    want = np.asarray(flash_decode_stacked(
        q, jnp.asarray(kw), jnp.asarray(vw), jnp.asarray(cached + 1),
        jnp.int32(0), blk=32, interpret=True))
    got = np.asarray(flash_decode_stacked_append(
        q, jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(cached),
        jnp.int32(0), jnp.asarray(ck), jnp.asarray(cv), blk=32,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pick_blk_lane_aligned_in_quant_mode():
    """quant mode must pick a 128-multiple block: the scale buffers
    (L, B, KV, S) slice S on the LANE axis.  S=8064 is the ctx-8k shape
    that picked 224 (a valid sublane divisor) and failed Mosaic on the
    scale DMA (bench_artifacts/r5/longctx_ab.log)."""
    from tmac_tpu.ops.pallas.attention_kernel import _pick_blk
    for S in (8064, 2048, 256, 128, 4096 + 128):
        blk = _pick_blk(S, 32, 128, 1, quant=True)
        assert S % blk == 0 and blk % 128 == 0, (S, blk)
    # non-quant keeps the denser sublane-divisor search
    assert _pick_blk(8064, 32, 128, 2) % 8 == 0


def test_flash_decode_append_write_commits_cache():
    """The append-WRITE variant returns the same attention output as the
    append variant AND the cache arrays with exactly one row (per slot)
    committed at the cached-len position, all other rows untouched."""
    from tmac_tpu.ops.pallas.attention_kernel import (
        flash_decode_stacked_append, flash_decode_stacked_append_write)
    rng = np.random.default_rng(6)
    L, B, KV, rep, S, D = 3, 3, 2, 2, 64, 128
    k = jnp.asarray(rng.standard_normal((L, B, KV, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, KV, S, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, KV, rep, D)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
    cached = np.array([0, 17, S - 1])  # fresh slot, mid, last row
    li = 1
    want = np.asarray(flash_decode_stacked_append(
        q, k, v, jnp.asarray(cached), jnp.int32(li), ck, cv, blk=32,
        interpret=True))
    o, k2, v2 = flash_decode_stacked_append_write(
        q, k, v, jnp.asarray(cached), jnp.int32(li), ck, cv, blk=32,
        interpret=True)
    np.testing.assert_allclose(np.asarray(o), want, rtol=2e-5, atol=2e-5)
    ke, ve = np.asarray(k).copy(), np.asarray(v).copy()
    for b in range(B):
        ke[li, b, :, cached[b], :] = np.asarray(ck)[b]
        ve[li, b, :, cached[b], :] = np.asarray(cv)[b]
    np.testing.assert_array_equal(np.asarray(k2), ke)
    np.testing.assert_array_equal(np.asarray(v2), ve)


def test_flash_decode_append_write_quantized_cache():
    """append-write on an int8 cache quantizes the committed row with the
    per-vector absmax/127 convention (models/llama._quantize_kv) and
    leaves every other code/scale untouched."""
    from tmac_tpu.models.llama import _quantize_kv
    from tmac_tpu.ops.pallas.attention_kernel import (
        flash_decode_stacked_append, flash_decode_stacked_append_write)
    rng = np.random.default_rng(7)
    L, B, KV, rep, S, D = 2, 2, 2, 2, 32, 128
    kq = jnp.asarray(rng.integers(-127, 128, (L, B, KV, S, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (L, B, KV, S, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, KV, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, KV, S)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, KV, rep, D)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
    cached = np.array([3, 20])
    li = 0
    want = np.asarray(flash_decode_stacked_append(
        q, kq, vq, jnp.asarray(cached), jnp.int32(li), ck, cv, blk=32,
        k_scale=ks, v_scale=vs, interpret=True))
    o, k2, v2, ks2, vs2 = flash_decode_stacked_append_write(
        q, kq, vq, jnp.asarray(cached), jnp.int32(li), ck, cv, blk=32,
        k_scale=ks, v_scale=vs, interpret=True)
    np.testing.assert_allclose(np.asarray(o), want, rtol=2e-5, atol=2e-5)
    ckq, cksc = _quantize_kv(ck)
    cvq, cvsc = _quantize_kv(cv)
    for b in range(B):
        np.testing.assert_array_equal(
            np.asarray(k2)[li, b, :, cached[b], :], np.asarray(ckq)[b])
        np.testing.assert_array_equal(
            np.asarray(v2)[li, b, :, cached[b], :], np.asarray(cvq)[b])
        np.testing.assert_allclose(
            np.asarray(ks2)[li, b, :, cached[b]], np.asarray(cksc)[b],
            rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vs2)[li, b, :, cached[b]], np.asarray(cvsc)[b],
            rtol=1e-6)
    mask = np.ones((L, B, KV, S), bool)
    for b in range(B):
        mask[li, b, :, cached[b]] = False
    np.testing.assert_array_equal(np.asarray(k2)[mask], np.asarray(kq)[mask])
    np.testing.assert_array_equal(np.asarray(ks2)[mask], np.asarray(ks)[mask])
