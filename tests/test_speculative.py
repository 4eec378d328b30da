"""Lookup speculative decoding (runtime/speculative.py): losslessness vs
plain greedy decode, proposal correctness, forward-count accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, init_params
from tmac_tpu.runtime import speculative
from tmac_tpu.runtime.generate import decode_loop, prefill
from tmac_tpu.runtime.sampling import SamplerConfig


def test_propose_ngram():
    buf = jnp.zeros((64,), jnp.int32)
    seq = jnp.asarray([7, 8, 9, 1, 2, 3, 4, 5, 6, 1, 2, 3], jnp.int32)
    buf = buf.at[: seq.shape[0]].set(seq)
    # trailing 3-gram [1,2,3] occurred at pos 3; draft = following tokens
    draft, found = speculative._propose_ngram(buf, jnp.int32(12), 3, 4)
    assert bool(found)
    np.testing.assert_array_equal(np.asarray(draft), [4, 5, 6, 1])

    # no earlier occurrence -> not found
    draft, found = speculative._propose_ngram(buf, jnp.int32(6), 3, 4)
    assert not bool(found)


@pytest.mark.parametrize("prompt_kind", ["repetitive", "random"])
def test_speculative_greedy_lossless(prompt_kind):
    """The emitted stream must equal plain greedy decode token-for-token
    for ANY draft quality -- the spec-decode correctness invariant."""
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    T, steps = 24, 24
    if prompt_kind == "repetitive":
        base = rng.integers(0, cfg.vocab_size, 6)
        prompt = np.tile(base, T // 6 + 1)[:T][None, :]
    else:
        prompt = rng.integers(0, cfg.vocab_size, (1, T))
    toks = jnp.asarray(prompt, jnp.int32)
    S = 128

    cache = KVCache.create(cfg, 1, S)
    logits, cache = prefill(params, cfg, toks, cache, impl="xla")
    first = jnp.argmax(logits.astype(jnp.float32), -1).astype(jnp.int32)
    ref, _ = decode_loop(params, cfg, first, cache, jax.random.PRNGKey(0),
                         steps=steps - 1, sampler=SamplerConfig(), impl="xla")
    want = [int(first[0])] + [int(t) for t in np.asarray(ref)[0]]

    cache2 = KVCache.create(cfg, 1, S)
    logits2, cache2 = prefill(params, cfg, toks, cache2, impl="xla")
    first2 = jnp.argmax(logits2.astype(jnp.float32), -1).astype(jnp.int32)
    out, nf, _ = speculative.decode_loop_speculative(
        params, cfg, first2, cache2, toks, steps=steps, ngram=3, k=4,
        impl="xla")
    got = [int(t) for t in np.asarray(out)[0]]
    assert got == want, (got, want)
    # accounting: every forward emits >= 1 token; first token was free
    assert 1 <= int(nf) <= steps - 1


def test_speculative_accepts_on_repetitive_stream():
    """Acceptance accounting on a model whose greedy output is provably
    periodic: 0 transformer layers + tied embeddings make
    argmax(norm(embed[t]) @ embed.T) == t (self-similarity of random
    gaussian rows), so the stream repeats its last token and lookup
    drafts must hit: far fewer forwards than tokens."""
    import dataclasses

    cfg = dataclasses.replace(get_preset("llama-2-7b").scaled(8),
                              num_layers=0, tie_word_embeddings=True)
    params = init_params(cfg, seed=2)
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, cfg.vocab_size, (1, 8))
    steps, k = 24, 4
    out, nf = speculative.generate_speculative(
        params, cfg, jnp.asarray(prompt, jnp.int32), steps, k=k, impl="xla")
    toks = np.asarray(out)[0]
    # the degenerate model repeats the last prompt token forever
    assert (toks == toks[0]).all(), toks
    # after the n-gram warms up (~ngram steps of 1 token/forward), every
    # forward accepts the full draft: nf ~ ngram + (steps-ngram)/(k+1)
    assert int(nf) <= 3 + (steps + k) // (k + 1), nf


def test_engine_speculative_mode_matches_plain():
    """InferenceEngine(speculative=True) greedy output must equal the
    plain engine's token-for-token (lossless), and near the budget /
    cache end it must still terminate correctly."""
    from tmac_tpu.runtime.engine import InferenceEngine

    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=3)
    rng = np.random.default_rng(3)
    base = rng.integers(0, cfg.vocab_size, 5)
    prompt = np.tile(base, 4).tolist()  # repetitive -> drafts hit

    plain = InferenceEngine(cfg, params, max_batch=1, max_len=128,
                            impl="xla", decode_chunk=8)
    u1 = plain.submit(prompt, max_new_tokens=24)
    want = plain.run()[u1]

    spec = InferenceEngine(cfg, params, max_batch=1, max_len=128,
                           impl="xla", decode_chunk=8, speculative=True)
    u2 = spec.submit(prompt, max_new_tokens=24)
    got = spec.run()[u2]
    assert got == want, (got, want)
    assert spec.stats.get("spec_forwards", 0) > 0

    # a sampled request falls back to the normal path and still works
    u3 = spec.submit(prompt, max_new_tokens=8, temperature=0.9)
    out3 = spec.run()[u3]
    assert len(out3) == 8 and all(0 <= t < cfg.vocab_size for t in out3)


@pytest.mark.parametrize("draft_kind", ["weak", "self"])
def test_draft_speculative_greedy_lossless(draft_kind):
    """Two-model (draft) speculation: emitted tokens equal plain greedy
    decode for any draft; a self-draft accepts (nearly) everything so the
    target forward count collapses to ~steps/k."""
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=0)
    if draft_kind == "self":
        cfg_d, params_d = cfg, params
    else:  # different weights = a weak draft (vocab shared by scaling)
        cfg_d = get_preset("llama-2-7b").scaled(16)
        import dataclasses
        cfg_d = dataclasses.replace(cfg_d, vocab_size=cfg.vocab_size)
        params_d = init_params(cfg_d, seed=7)
    rng = np.random.default_rng(1)
    T, steps, k = 16, 20, 4
    prompt = rng.integers(0, cfg.vocab_size, (1, T))
    toks = jnp.asarray(prompt, jnp.int32)
    S = 128

    cache = KVCache.create(cfg, 1, S)
    logits, cache = prefill(params, cfg, toks, cache, impl="xla")
    first = jnp.argmax(logits.astype(jnp.float32), -1).astype(jnp.int32)
    ref, _ = decode_loop(params, cfg, first, cache, jax.random.PRNGKey(0),
                         steps=steps - 1, sampler=SamplerConfig(), impl="xla")
    want = [int(first[0])] + [int(t) for t in np.asarray(ref)[0]]

    out, nft, nfd = speculative.generate_draft_speculative(
        params, cfg, params_d, cfg_d, toks, max_new_tokens=steps,
        max_len=S, k=k, impl="xla")
    got = [int(t) for t in np.asarray(out)[0]]
    assert got == want, (got, want)
    assert nfd == k * nft  # k draft forwards per verification round
    if draft_kind == "self":
        # every round accepts k tokens (the draft IS the target)
        import math
        assert nft <= math.ceil((steps - 1) / k) + 1, nft
