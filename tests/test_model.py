"""Model forward/decode correctness on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, forward, init_params
from tmac_tpu.runtime.generate import generate, prefill, decode_step
from tmac_tpu.runtime.sampling import SamplerConfig, sample


def tiny(name, **kw):
    return get_preset(name, **kw).scaled(8)


@pytest.mark.parametrize("preset,kw", [
    ("llama-2-7b", {}),            # w_fp, zero_point
    ("bitnet-3b", {}),             # w_a8, per-tensor
    ("llama-3-8b", {"bits": 4}),   # GQA + 4-bit
    ("qwen2-7b", {}),              # attention bias
])
def test_forward_shapes(preset, kw):
    cfg = tiny(preset, **kw)
    params = init_params(cfg, seed=0)
    cache = KVCache.create(cfg, batch=2, max_len=16)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 5)))
    logits, cache = forward(params, cfg, tokens, cache, impl="xla")
    assert logits.shape == (2, 5, cfg.vocab_size)
    assert (np.asarray(cache.pos) == 5).all()
    assert np.isfinite(np.asarray(logits, dtype=np.float32)).all()


def test_incremental_decode_matches_prefill():
    """Logits from token-by-token decode must match one-shot prefill."""
    cfg = tiny("llama-2-7b")
    params = init_params(cfg, seed=1)
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)))

    # one-shot
    cache = KVCache.create(cfg, 1, 8)
    full_logits, _ = forward(params, cfg, toks, cache, impl="xla")

    # incremental
    cache = KVCache.create(cfg, 1, 8)
    inc = []
    for t in range(6):
        lg, cache = forward(params, cfg, toks[:, t:t + 1], cache, impl="xla")
        inc.append(np.asarray(lg[:, 0], dtype=np.float32))
    inc = np.stack(inc, axis=1)
    full = np.asarray(full_logits, dtype=np.float32)
    np.testing.assert_allclose(full, inc, rtol=2e-2, atol=2e-2)
    # the argmax (greedy choice) must agree everywhere
    np.testing.assert_array_equal(full.argmax(-1), inc.argmax(-1))


def test_generate_greedy_deterministic():
    cfg = tiny("bitnet-3b")
    params = init_params(cfg, seed=2)
    prompt = np.array([[1, 2, 3]], dtype=np.int32)
    out1 = np.asarray(generate(params, cfg, prompt, max_new_tokens=5, impl="xla"))
    out2 = np.asarray(generate(params, cfg, prompt, max_new_tokens=5, impl="xla"))
    assert out1.shape == (1, 5)
    np.testing.assert_array_equal(out1, out2)
    assert (out1 >= 0).all() and (out1 < cfg.vocab_size).all()


def test_decode_step_jit_and_donation():
    cfg = tiny("llama-2-7b")
    params = init_params(cfg, seed=3)
    cache = KVCache.create(cfg, 1, 8)
    toks = jnp.asarray([[4, 5]], dtype=jnp.int32)
    logits, cache = prefill(params, cfg, toks, cache, impl="xla")
    key = jax.random.PRNGKey(0)
    last = sample(logits, key, SamplerConfig())
    nxt, cache = decode_step(params, cfg, last, cache, key, impl="xla")
    assert nxt.shape == (1,)
    assert (np.asarray(cache.pos) == 3).all()


def test_samplers():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([[1.0, 5.0, 2.0, 0.1]])
    assert int(sample(logits, key, SamplerConfig())[0]) == 1
    t = sample(logits, key, SamplerConfig(temperature=0.8, top_k=2))
    assert int(t[0]) in (1, 2)
    t = sample(logits, key, SamplerConfig(temperature=0.8, top_p=0.5))
    assert int(t[0]) == 1  # top-1 prob already > 0.5


def test_sample_state_matches_static():
    """The per-slot vectorized sampler agrees with the static sampler
    slot-wise -- same key, same params, identical draws -- and mixed
    per-slot settings behave independently."""
    from tmac_tpu.runtime.sampling import SamplerState, sample_state
    key = jax.random.PRNGKey(7)
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    for cfg in (SamplerConfig(),
                SamplerConfig(temperature=0.8),
                SamplerConfig(temperature=0.8, top_k=5),
                SamplerConfig(temperature=1.2, top_p=0.7),
                SamplerConfig(temperature=0.6, top_k=9, top_p=0.9)):
        st = SamplerState.broadcast(cfg, 4)
        # MANY keys: a single fixed key can agree by luck even when the
        # filtered distributions differ (caught in round-3 review: the
        # top-k+top-p combination diverged on 66/200 keys)
        for i in range(40):
            k = jax.random.fold_in(key, i)
            np.testing.assert_array_equal(
                np.asarray(sample_state(logits, k, st)),
                np.asarray(sample(logits, k, cfg)),
                err_msg=f"cfg={cfg} key {i}")
    # mixed: slot 0 greedy, slot 1 heavily filtered top-k=1 (== greedy),
    # slots 2-3 sampled within the top-k set
    st = SamplerState.make([0.0, 0.9, 0.9, 1.5], [0, 1, 3, 3],
                           [1.0, 1.0, 1.0, 0.95])
    toks = np.asarray(sample_state(logits, key, st))
    greedy = np.asarray(jnp.argmax(logits, -1))
    assert toks[0] == greedy[0] and toks[1] == greedy[1]
    for b in (2, 3):
        top3 = np.argsort(np.asarray(logits)[b])[-3:]
        assert toks[b] in top3


def test_prefill_chunking_matches_oneshot():
    """Chunked prefill (long prompts) must produce the same logits/cache
    as a single-chunk prefill."""
    cfg = tiny("llama-2-7b")
    params = init_params(cfg, seed=4)
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
    l1, c1 = prefill(params, cfg, toks, KVCache.create(cfg, 2, 16),
                     impl="xla", chunk=256)
    l2, c2 = prefill(params, cfg, toks, KVCache.create(cfg, 2, 16),
                     impl="xla", chunk=4)
    np.testing.assert_allclose(np.asarray(l1, np.float32),
                               np.asarray(l2, np.float32), rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(l1.argmax(-1)), np.asarray(l2.argmax(-1)))
    assert (np.asarray(c1.pos) == 12).all() and (np.asarray(c2.pos) == 12).all()


def test_block_kernel_decode_matches_xla(monkeypatch):
    """The single-program residual-block decode path (B=1, per-tensor
    BitNet; opt-in via TMAC_BLOCK_KERNEL) must match the XLA step within
    quantization-order noise."""
    monkeypatch.setenv("TMAC_BLOCK_KERNEL", "1")
    cfg = get_preset("bitnet-3b").scaled(12)
    params = init_params(cfg, seed=3)
    cache_a = KVCache.create(cfg, 1, 32)
    cache_b = KVCache.create(cfg, 1, 32)
    toks = jnp.asarray([[3, 1, 4]])
    la, cache_a = forward(params, cfg, toks, cache_a, impl="xla")
    lb, cache_b = forward(params, cfg, toks, cache_b, impl="pallas")
    step = jnp.asarray([[9]])
    la2, _ = forward(params, cfg, step, cache_a, impl="xla")
    lb2, _ = forward(params, cfg, step, cache_b, impl="pallas")  # block path
    from tmac_tpu.utils import nmse
    assert nmse(np.asarray(la2, np.float32), np.asarray(lb2, np.float32)) < 2e-3


def test_deferred_kv_decode_matches_default():
    """The deferred-KV decode mode (flash append attention + one batched
    cache commit) must match the default per-layer-write step: same
    logits (to float tolerance) and a bit-identical committed cache."""
    from tmac_tpu.utils import nmse
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=4)
    B = 2
    cache_a = KVCache.create(cfg, B, 64)
    cache_b = KVCache.create(cfg, B, 64)
    toks = jnp.asarray([[1, 2, 3], [7, 5, 2]])
    _, cache_a = forward(params, cfg, toks, cache_a, impl="xla")
    _, cache_b = forward(params, cfg, toks, cache_b, impl="xla")

    step = jnp.asarray([[9], [11]])
    la, cache_a = forward(params, cfg, step, cache_a, impl="xla",
                          deferred_kv=False)
    lb, cache_b = forward(params, cfg, step, cache_b, impl="xla",
                          deferred_kv=True)  # interpret-mode flash append
    assert nmse(np.asarray(la, np.float32), np.asarray(lb, np.float32)) < 1e-4
    np.testing.assert_array_equal(np.asarray(cache_a.k), np.asarray(cache_b.k))
    np.testing.assert_array_equal(np.asarray(cache_a.v), np.asarray(cache_b.v))
    np.testing.assert_array_equal(np.asarray(cache_a.pos),
                                  np.asarray(cache_b.pos))

    # a further default step from each cache stays consistent
    la2, _ = forward(params, cfg, jnp.asarray([[4], [6]]), cache_a,
                     impl="xla")
    lb2, _ = forward(params, cfg, jnp.asarray([[4], [6]]), cache_b,
                     impl="xla")
    np.testing.assert_array_equal(np.asarray(la2), np.asarray(lb2))
