"""Lookup (prompt n-gram) speculative decoding, fully on-device.

The role of llama.cpp's lookup decoding (examples/lookup; the reference's
host loop is llama.cpp per tools/run_pipeline.py:222-277), re-designed
TPU-native: the n-gram proposal, the k-token verification forward, the
acceptance scan, and the cache-position rewind all run inside ONE jitted
`lax.while_loop` -- zero host round-trips for a whole generation, where
llama.cpp re-enters C++ scheduling code every step.

Why this is nearly free on TPU: single-stream decode is HBM-bound on
weight bytes, so a T=k+1 verification forward costs about the same as a
T=1 step (same weight traffic; activations are noise).  Every accepted
draft token is a token we never paid a forward for: tokens/s multiplies
by the mean accepted length.  On self-repetitive text (code, chat
transcripts, retrieval contexts) acceptance is high; on incompressible
text the cost floor is one forward per emitted token -- the same as
plain decode (plus the small T=k+1 vs T=1 overhead).

Losslessness: with greedy sampling the emitted stream is IDENTICAL
token-for-token to plain greedy decode for ANY draft (verification
recomputes the model's own argmax at every position and only keeps
matching prefixes) -- tested against decode_loop in
tests/test_speculative.py.  With temperature > 0 the loop switches to
speculative REJECTION SAMPLING (_sampled_accept): the emitted stream is
a different random draw, but its DISTRIBUTION is exactly the plain
sampler's -- the standard lossless-sampling guarantee
(arXiv:2211.17192), verified empirically in tests/test_spec_sampling.py.

Cache correctness: a verification forward writes K/V for all k+1 fed
tokens; rejected positions hold stale entries, but pos is rewound to
just-past-the-accepted-prefix, attention masks s <= q_position, and the
next verification overwrites exactly that stale span before reading it
(its k+1 writes start where the rewind left pos).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tmac_tpu.models.config import ModelConfig
from tmac_tpu.models.llama import KVCache, forward
from tmac_tpu.runtime.sampling import SamplerConfig, filtered_logits


def _propose_ngram(buf: jax.Array, length: jax.Array, n: int, k: int):
    """Most-recent-match n-gram proposal from the token buffer.

    buf (S,) int32 holds the sequence so far in [0, length); the draft is
    the k tokens that followed the most recent earlier occurrence of the
    trailing n-gram.  Returns (draft (k,) int32, found bool).
    """
    S = buf.shape[0]
    ngram = jax.lax.dynamic_slice(buf, (jnp.maximum(length - n, 0),), (n,))
    idx = jnp.arange(S - n + 1)[:, None] + jnp.arange(n)[None, :]
    windows = buf[idx]                                  # (S-n+1, n)
    match = jnp.all(windows == ngram[None, :], axis=1)  # (S-n+1,)
    # candidate start i: any occurrence strictly before the trailing one
    # (i < length - n; overlapping occurrences allowed -- they encode
    # short periods, e.g. a constant stream)
    pos = jnp.arange(S - n + 1)
    ok = match & (pos < length - n)
    j = jnp.max(jnp.where(ok, pos, -1))
    found = j >= 0
    # continue the matched pattern CYCLICALLY with period p = distance
    # between the match and the trailing n-gram: predicted token at
    # stream position length+i is buf[length - p + (i mod p)].  A raw
    # slice buf[j+n : j+n+k] runs past the known tokens whenever the
    # match is recent (the common, high-value case) and would draft
    # zeros; the cyclic form always drafts real history and is exact for
    # genuinely periodic streams.
    p = jnp.maximum((length - n) - j, 1)
    src = length - p + jnp.mod(jnp.arange(k), p)
    draft = buf[jnp.clip(src, 0, S - 1)]
    return jnp.where(found, draft, -1), found


def _sampled_accept(logits, draft, key, cfg: SamplerConfig, q_probs=None):
    """Speculative REJECTION SAMPLING targeting the exact serving
    distribution p_i = softmax(filtered_logits(logits_i)) (Leviathan et
    al. 2023, arXiv:2211.17192; llama.cpp common_sampler speculative
    role).

    logits (k+1, V); draft (k,) int32 (-1 = no proposal, auto-reject);
    q_probs (k, V): the draft model's PROPOSAL distribution (what the
    draft tokens were sampled from), or None for a DETERMINISTIC draft
    (q = point mass at draft[i]: accept with prob p_i(d_i), residual =
    p_i with d_i removed).

    Returns (tokens (k+1,), a): tokens[:a] are accepted draft tokens and
    tokens[a] the correction (a < k: sampled from norm(max(p - q, 0)))
    or bonus (a == k: sampled from p_k) token.  Emitting tokens[:a+1]
    (or any prefix) preserves the target distribution EXACTLY -- the
    acceptance test and residual construction make the marginal at every
    position identical to sequentially sampling from p.
    """
    k = draft.shape[0]
    V = logits.shape[-1]
    p = jax.nn.softmax(filtered_logits(logits, cfg), axis=-1)  # (k+1, V)
    ku, kc = jax.random.split(key)
    d_ix = jnp.maximum(draft, 0)
    p_d = jnp.take_along_axis(p[:k], d_ix[:, None], 1)[:, 0]
    if q_probs is None:
        ratio = p_d                      # q(d_i) = 1
    else:
        q_d = jnp.take_along_axis(q_probs, d_ix[:, None], 1)[:, 0]
        ratio = p_d / jnp.maximum(q_d, 1e-20)
    u = jax.random.uniform(ku, (k,))
    accept = (u < ratio) & (draft >= 0)
    a = jnp.argmin(jnp.concatenate([accept, jnp.array([False])])
                   .astype(jnp.int32))   # first rejected position
    p_a = jax.lax.dynamic_index_in_dim(p, a, 0, keepdims=False)  # (V,)
    a_c = jnp.minimum(a, k - 1)
    if q_probs is None:
        # remove the rejected proposal -- but ONLY if one existed: a
        # no-proposal round (draft[a] == -1) was never "rejected by the
        # coin flip", so the correction is a plain sample from p_a
        # (zeroing index 0 there would bias token id 0 out forever)
        had = (draft[a_c] >= 0).astype(p.dtype)
        res = p_a * (1.0 - had * jax.nn.one_hot(d_ix[a_c], V, dtype=p.dtype))
    else:
        q_a = jax.lax.dynamic_index_in_dim(q_probs, a_c, 0, keepdims=False)
        res = jnp.maximum(p_a - q_a, 0.0)
    res = jnp.where(a == k, p_a, res)    # all accepted -> bonus from p_k
    tot = jnp.sum(res)
    # degenerate residual (p <= q everywhere, float underflow): fall back
    # to p_a -- still a valid sample of the target at position a
    res = jnp.where(tot > 1e-20, res / jnp.maximum(tot, 1e-20), p_a)
    corr = jax.random.categorical(
        kc, jnp.log(jnp.maximum(res, 1e-30))).astype(jnp.int32)
    idx = jnp.arange(k + 1)
    dpad = jnp.concatenate([d_ix, jnp.zeros((1,), jnp.int32)])
    tokens = jnp.where(idx < a, dpad, 0)
    tokens = jnp.where(idx == a, corr, tokens)
    return tokens, a


@functools.partial(jax.jit, static_argnames=("cfg", "steps", "ngram", "k",
                                             "impl", "sampler"),
                   donate_argnames=("cache",))
def decode_chunk_speculative(params, cfg: ModelConfig, history: jax.Array,
                             history_len, cache: KVCache, steps: int,
                             ngram: int = 3, k: int = 8, impl: str = "auto",
                             sampler: SamplerConfig = SamplerConfig(),
                             key: Optional[jax.Array] = None):
    """Decode `steps` tokens with on-device lookup speculation.

    sampler.temperature <= 0 (default): greedy -- token-for-token
    identical to plain greedy decode.  temperature > 0: speculative
    REJECTION SAMPLING via _sampled_accept (requires `key`) -- the
    output DISTRIBUTION is exactly the plain sampler's, though individual
    streams differ (a different number of uniforms is consumed).

    history (1, Sh) int32, zero-padded: all tokens so far (prompt + any
    generated), the LAST of which (history[0, history_len-1]) is counted
    as already emitted and returned in out[0].  history_len is TRACED, so
    repeated calls with growing histories (the engine's chunked use, or
    generate over arbitrary prompt lengths) share ONE compilation per
    (Sh, steps).  The cache must hold K/V for history[:history_len-1]
    with cache.pos == history_len - 1.

    Returns (tokens (1, steps) int32 incl. the seed token, n_emitted
    (<= steps; short only when the cache is nearly full), n_forwards
    int32, cache).  Single-stream (B=1): per-slot variable acceptance
    does not batch; B>1 serving keeps the chunked engine path.
    """
    B, Sh = history.shape
    assert B == 1, "speculative decode is single-stream"
    S = cache.max_len
    buf = jnp.zeros((max(S, Sh),), jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, history[0].astype(jnp.int32),
                                       (0,))
    length = jnp.asarray(history_len, jnp.int32)  # tokens known so far
    emitted = jnp.int32(1)             # the seed token counts as emitted
    seed = jax.lax.dynamic_slice(buf, (length - 1,), (1,))
    out = jnp.zeros((steps + k + 1,), jnp.int32)
    out = out.at[0].set(seed[0])

    def cond(c):
        emitted, length, buf, out, cache, nf = c
        return (emitted < steps) & (length + k + 1 <= S)

    def body(c):
        emitted, length, buf, out, cache, nf = c
        draft, _ = _propose_ngram(buf, length, ngram, k)
        last = jax.lax.dynamic_slice(buf, (length - 1,), (1,))
        feed = jnp.concatenate([last, jnp.maximum(draft, 0)])[None, :]  # (1, k+1)
        pos0 = cache.pos
        logits, cache = forward(params, cfg, feed, cache, impl=impl)
        if sampler.temperature > 0.0:
            emit_src, a = _sampled_accept(
                logits[0], draft, jax.random.fold_in(key, nf), sampler)
        else:
            targets = jnp.argmax(logits[0].astype(jnp.float32), axis=-1
                                 ).astype(jnp.int32)    # (k+1,) y_0..y_k
            # accept the longest draft prefix that matches the model's own
            # greedy choices: a = #matching leading positions
            good = draft == targets[:k]
            a = jnp.argmin(jnp.concatenate([good, jnp.array([False])])
                           .astype(jnp.int32))          # first False index
            emit_src = targets
        ntok = a + 1                                    # accepted + correction
        # budget clamp: never emit past `steps`
        ntok = jnp.minimum(ntok, steps - emitted)
        ntok = jnp.maximum(ntok, 1)
        # emit y_0..y_{ntok-1}
        emit = jnp.where(jnp.arange(k + 1) < ntok, emit_src, 0)
        out = jax.lax.dynamic_update_slice(out, emit, (emitted,))
        buf = jax.lax.dynamic_update_slice(buf, emit, (length,))
        # rewind: forward advanced pos by k+1; only ntok inputs were real
        # -- the NEXT real input is y_{ntok-1} at position pos0 + ntok
        cache = dataclasses.replace(cache, pos=pos0 + ntok)
        return emitted + ntok, length + ntok, buf, out, cache, nf + 1

    emitted, length, buf, out, cache, nf = jax.lax.while_loop(
        cond, body, (emitted, length, buf, out, cache, jnp.int32(0)))
    return out[None, :steps], emitted, nf, cache


def decode_loop_speculative(params, cfg: ModelConfig, first_token,
                            cache: KVCache, prompt: jax.Array, steps: int,
                            ngram: int = 3, k: int = 8, impl: str = "auto"):
    """One-shot convenience form: prompt (1, T) + first generated token
    (from prefill argmax) -> `steps` tokens.  Pads the history to the
    cache length so generate calls of any prompt length share one
    compilation (history_len is traced in decode_chunk_speculative)."""
    B, T = prompt.shape
    assert B == 1
    S = cache.max_len
    hist = jnp.zeros((1, S), jnp.int32)
    hist = jax.lax.dynamic_update_slice(
        hist, prompt.astype(jnp.int32), (0, 0))
    hist = jax.lax.dynamic_update_slice(
        hist, first_token.astype(jnp.int32)[None, :], (0, T))
    out, _, nf, cache = decode_chunk_speculative(
        params, cfg, hist, T + 1, cache, steps=steps, ngram=ngram, k=k,
        impl=impl)
    return out, nf, cache


@functools.partial(jax.jit, static_argnames=("cfg_t", "cfg_d", "steps", "k",
                                             "impl", "sampler"),
                   donate_argnames=("cache_t", "cache_d"))
def decode_chunk_draft_speculative(params_t, cfg_t: ModelConfig, params_d,
                                   cfg_d: ModelConfig, history: jax.Array,
                                   history_len, cache_t: KVCache,
                                   cache_d: KVCache, steps: int, k: int = 4,
                                   impl: str = "auto",
                                   sampler: SamplerConfig = SamplerConfig(),
                                   key: Optional[jax.Array] = None):
    """Greedy decode with a DRAFT MODEL proposing k tokens per round
    (classic two-model speculative decoding), fully on-device like the
    lookup variant above: draft loop, verification forward, acceptance
    scan and both cache rewinds inside one `lax.while_loop`.

    Unlike the n-gram proposal, a small same-family draft accepts well on
    arbitrary text, at the cost of k draft forwards per round -- worth it
    when draft weight bytes << target weight bytes (e.g. a W2 700M
    drafting for a W4 7B: k=4 drafts cost ~0.2 target forwards of HBM
    traffic).  Lossless: emitted tokens are the target's own greedy
    choices (verification recomputes argmax at every position).

    Cache invariants on entry (both caches, same max_len): K/V written
    for history[:history_len-1], pos == history_len - 1.  The acceptance
    count per round is clamped to k (not k+1): the "bonus" token's draft
    K/V entry was never computed, so emitting it would leave a hole in
    the draft cache; capping at k keeps both caches exactly one rewind
    formula (pos0 + ntok) -- see the lookup variant's docstring for why
    stale rejected entries are safe.

    Returns (tokens (1, steps) incl. the seed, n_emitted, n_target_fwd,
    n_draft_fwd, cache_t, cache_d).
    """
    B, Sh = history.shape
    assert B == 1, "speculative decode is single-stream"
    assert cfg_t.vocab_size == cfg_d.vocab_size, "draft must share the vocab"
    S = cache_t.max_len
    buf = jnp.zeros((max(S, Sh),), jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, history[0].astype(jnp.int32),
                                       (0,))
    length = jnp.asarray(history_len, jnp.int32)
    emitted = jnp.int32(1)
    seed = jax.lax.dynamic_slice(buf, (length - 1,), (1,))
    out = jnp.zeros((steps + k + 1,), jnp.int32)
    out = out.at[0].set(seed[0])

    def cond(c):
        emitted, length, buf, out, cache_t, cache_d, nft, nfd = c
        return (emitted < steps) & (length + k + 1 <= S)

    def body(c):
        emitted, length, buf, out, cache_t, cache_d, nft, nfd = c
        last = jax.lax.dynamic_slice(buf, (length - 1,), (1,))

        sampled = sampler.temperature > 0.0
        V = cfg_d.vocab_size
        if sampled:  # disjoint streams: drafting vs acceptance
            key_d, key_a = jax.random.split(key)

        def dstep(j, dc):
            draft, qrows, cache_d, tok = dc
            lg, cache_d = forward(params_d, cfg_d, tok[None, :], cache_d,
                                  impl=impl)
            if sampled:
                # the draft must SAMPLE from its own (filtered)
                # distribution q and report q to the acceptance test --
                # that pairing is what makes rejection sampling lossless
                fl = filtered_logits(lg[0, -1], sampler)
                nxt = jax.random.categorical(
                    jax.random.fold_in(key_d, nfd + j),
                    fl).astype(jnp.int32)
                qrows = jax.lax.dynamic_update_slice(
                    qrows, jax.nn.softmax(fl)[None, :], (j, 0))
            else:
                nxt = jnp.argmax(
                    lg[0, -1].astype(jnp.float32)).astype(jnp.int32)
            draft = jax.lax.dynamic_update_slice(draft, nxt[None], (j,))
            return draft, qrows, cache_d, nxt[None]

        pos0_d = cache_d.pos
        qrows0 = jnp.zeros((k, V) if sampled else (k, 1), jnp.float32)
        draft, qrows, cache_d, _ = jax.lax.fori_loop(
            0, k, dstep, (jnp.zeros((k,), jnp.int32), qrows0, cache_d, last))
        feed = jnp.concatenate([last, draft])[None, :]     # (1, k+1)
        pos0_t = cache_t.pos
        logits, cache_t = forward(params_t, cfg_t, feed, cache_t, impl=impl)
        if sampled:
            emit_src, a = _sampled_accept(
                logits[0], draft, jax.random.fold_in(key_a, nft),
                sampler, q_probs=qrows)
        else:
            targets = jnp.argmax(logits[0].astype(jnp.float32), axis=-1
                                 ).astype(jnp.int32)       # (k+1,)
            good = draft == targets[:k]
            a = jnp.argmin(jnp.concatenate([good, jnp.array([False])])
                           .astype(jnp.int32))
            emit_src = targets
        ntok = jnp.minimum(a + 1, k)       # cap: keep the draft cache whole
        ntok = jnp.minimum(ntok, steps - emitted)
        ntok = jnp.maximum(ntok, 1)
        emit = jnp.where(jnp.arange(k + 1) < ntok, emit_src, 0)
        out = jax.lax.dynamic_update_slice(out, emit, (emitted,))
        buf = jax.lax.dynamic_update_slice(buf, emit, (length,))
        cache_t = dataclasses.replace(cache_t, pos=pos0_t + ntok)
        cache_d = dataclasses.replace(cache_d, pos=pos0_d + ntok)
        return (emitted + ntok, length + ntok, buf, out, cache_t, cache_d,
                nft + 1, nfd + k)

    emitted, length, buf, out, cache_t, cache_d, nft, nfd = jax.lax.while_loop(
        cond, body,
        (emitted, length, buf, out, cache_t, cache_d, jnp.int32(0),
         jnp.int32(0)))
    return out[None, :steps], emitted, nft, nfd, cache_t, cache_d


def generate_draft_speculative(params_t, cfg_t: ModelConfig, params_d,
                               cfg_d: ModelConfig, prompt_tokens,
                               max_new_tokens: int,
                               max_len: Optional[int] = None, k: int = 4,
                               impl: str = "auto",
                               sampler: SamplerConfig = SamplerConfig(),
                               seed: int = 0):
    """Convenience wrapper: prefill both models, then draft-speculative
    decode (greedy, or lossless speculative sampling when
    sampler.temperature > 0).  Returns (tokens (1, max_new_tokens),
    n_target_fwd, n_draft_fwd)."""
    import numpy as np

    from tmac_tpu.runtime.generate import prefill
    from tmac_tpu.runtime.sampling import sample

    toks = jnp.asarray(np.asarray(prompt_tokens), jnp.int32)
    if toks.ndim == 1:
        toks = toks[None, :]
    B, T = toks.shape
    assert B == 1
    S = max_len or (T + max_new_tokens + k + 1)
    cache_t = KVCache.create(cfg_t, 1, S)
    cache_d = KVCache.create(cfg_d, 1, S)
    logits, cache_t = prefill(params_t, cfg_t, toks, cache_t, impl=impl)
    _, cache_d = prefill(params_d, cfg_d, toks, cache_d, impl=impl)
    key = None
    if sampler.temperature > 0.0:
        key, kf = jax.random.split(jax.random.PRNGKey(seed))
        first = sample(logits, kf, sampler)
    else:
        first = jnp.argmax(logits.astype(jnp.float32), -1).astype(jnp.int32)
    hist = jnp.zeros((1, S), jnp.int32)
    hist = jax.lax.dynamic_update_slice(hist, toks, (0, 0))
    hist = jax.lax.dynamic_update_slice(hist, first[None, :], (0, T))
    out, _, nft, nfd, _, _ = decode_chunk_draft_speculative(
        params_t, cfg_t, params_d, cfg_d, hist, T + 1, cache_t, cache_d,
        steps=max_new_tokens, k=k, impl=impl, sampler=sampler, key=key)
    return out, int(nft), int(nfd)


def generate_speculative(params, cfg: ModelConfig, prompt_tokens,
                         max_new_tokens: int, max_len: Optional[int] = None,
                         ngram: int = 3, k: int = 8, impl: str = "auto",
                         sampler: SamplerConfig = SamplerConfig(),
                         seed: int = 0):
    """Convenience wrapper: prefill + speculative decode (greedy, or
    lossless speculative sampling when sampler.temperature > 0).
    Returns (tokens (1, max_new_tokens), n_forwards)."""
    import numpy as np

    from tmac_tpu.runtime.generate import prefill
    from tmac_tpu.runtime.sampling import sample

    toks = jnp.asarray(np.asarray(prompt_tokens), jnp.int32)
    if toks.ndim == 1:
        toks = toks[None, :]
    B, T = toks.shape
    assert B == 1
    S = max_len or (T + max_new_tokens + k + 1)
    cache = KVCache.create(cfg, 1, S)
    logits, cache = prefill(params, cfg, toks, cache, impl=impl)
    key = None
    if sampler.temperature > 0.0:
        key, kf = jax.random.split(jax.random.PRNGKey(seed))
        first = sample(logits, kf, sampler)
    else:
        first = jnp.argmax(logits.astype(jnp.float32), -1).astype(jnp.int32)
    hist = jnp.zeros((1, S), jnp.int32)
    hist = jax.lax.dynamic_update_slice(hist, toks, (0, 0))
    hist = jax.lax.dynamic_update_slice(hist, first.astype(jnp.int32)[None, :]
                                        if first.ndim == 1 else first, (0, T))
    out, _, nf, _ = decode_chunk_speculative(
        params, cfg, hist, T + 1, cache, steps=max_new_tokens, ngram=ngram,
        k=k, impl=impl, sampler=sampler, key=key)
    return out, int(nf)
