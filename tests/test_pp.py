"""Pipeline parallelism (parallel/pp.py) vs single-device forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, init_params
from tmac_tpu.parallel import pp as ppmod
from tmac_tpu.runtime.generate import decode_loop, prefill
from tmac_tpu.runtime.sampling import SamplerConfig


@pytest.mark.parametrize("preset", ["llama-2-7b", "bitnet-3b"])
def test_pp_prefill_matches_single_device(preset):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cfg = get_preset(preset).scaled(8)  # 2 layers -> pp=2, 1 layer/stage
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    B, T = 2, 16
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))

    ref_logits, ref_cache = prefill(params, cfg, toks,
                                    KVCache.create(cfg, B, 32), impl="xla")

    mesh = ppmod.make_pp_mesh(2)
    params_pp, specs = ppmod.stack_params_pp(params, 2)
    sparams = ppmod.shard_params_pp(params_pp, specs, mesh)
    cache = ppmod.shard_cache_pp(KVCache.create(cfg, B, 32), mesh)
    pf = ppmod.make_pp_prefill(cfg, mesh, impl="xla", chunk=4)
    got_logits, got_cache = pf(sparams, toks, cache)

    np.testing.assert_allclose(np.asarray(got_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=3e-2, atol=3e-2)
    assert (np.asarray(got_cache.pos) == T).all()
    np.testing.assert_allclose(
        np.asarray(got_cache.k[:, :, :, :T], np.float32),
        np.asarray(ref_cache.k[:, :, :, :T], np.float32),
        rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("pp,tp", [(2, 4), (2, 2)])
def test_pp_tp_composition(pp, tp):
    """PP x TP 2-D mesh: layer stages with stage-internal Megatron
    sharding must reproduce single-device prefill + a greedy decode
    step -- the capacity x latency composition."""
    if len(jax.devices()) < pp * tp:
        pytest.skip("needs devices")
    cfg = get_preset("llama-2-7b").scaled(4)  # 8 heads, 2 layers
    params = init_params(cfg, seed=2, tp=tp)
    rng = np.random.default_rng(2)
    B, T = 1, 8
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))

    ref_logits, _ = prefill(params, cfg, toks,
                            KVCache.create(cfg, B, 32), impl="xla")

    mesh = ppmod.make_pp_tp_mesh(pp, tp)
    params_pp, specs = ppmod.stack_params_pp(params, pp, tp=tp)
    sparams = ppmod.shard_params_pp(params_pp, specs, mesh)
    cache = ppmod.shard_cache_pp(KVCache.create(cfg, B, 32), mesh)
    pf = ppmod.make_pp_prefill(cfg, mesh, impl="xla", chunk=4, specs=specs)
    dec = ppmod.make_pp_decode_step(cfg, mesh, impl="xla", specs=specs)
    got_logits, cache = pf(sparams, toks, cache)
    np.testing.assert_allclose(np.asarray(got_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=5e-2, atol=0.1)
    nxt = jnp.argmax(got_logits, -1).astype(jnp.int32)
    lg2, cache = dec(sparams, nxt, cache)
    assert np.isfinite(np.asarray(lg2, np.float32)).all()
    assert (np.asarray(cache.pos) == T + 1).all()


def test_pp_prefill_decode_chain():
    """PP prefill -> PP decode for several greedy tokens must follow the
    single-device greedy path (same-math stages; tolerance via argmax on
    near-identical logits)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=1)
    rng = np.random.default_rng(1)
    B, T, steps = 1, 8, 4
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))

    ref_logits, ref_cache = prefill(params, cfg, toks,
                                    KVCache.create(cfg, B, 32), impl="xla")
    first = jnp.argmax(ref_logits, -1).astype(jnp.int32)
    ref_toks, _ = decode_loop(params, cfg, first, ref_cache,
                              jax.random.PRNGKey(0), steps=steps,
                              sampler=SamplerConfig(), impl="xla")
    want = [int(first[0])] + [int(t) for t in np.asarray(ref_toks)[0]]

    mesh = ppmod.make_pp_mesh(2)
    params_pp, specs = ppmod.stack_params_pp(params, 2)
    sparams = ppmod.shard_params_pp(params_pp, specs, mesh)
    cache = ppmod.shard_cache_pp(KVCache.create(cfg, B, 32), mesh)
    pf = ppmod.make_pp_prefill(cfg, mesh, impl="xla", chunk=4)
    dec = ppmod.make_pp_decode_step(cfg, mesh, impl="xla")
    logits, cache = pf(sparams, toks, cache)
    got = [int(jnp.argmax(logits, -1)[0])]
    for _ in range(steps):
        logits, cache = dec(sparams, jnp.asarray(got[-1:], jnp.int32), cache)
        got.append(int(jnp.argmax(logits, -1)[0]))
    assert got == want, (got, want)
