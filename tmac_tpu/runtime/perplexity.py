"""Perplexity evaluation -- the role of `llama-perplexity` in the reference
pipeline (built at tools/run_pipeline.py:218, used for quality parity).

Scores a token stream in fixed-length windows with a jitted forward pass
and returns mean negative log-likelihood / perplexity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tmac_tpu.models.config import ModelConfig
from tmac_tpu.models.llama import KVCache, forward


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def _window_nll(params, cfg: ModelConfig, tokens, impl: str = "auto"):
    """tokens (1, T): returns (sum_nll over T-1 predictions, count)."""
    cache = KVCache.create(cfg, tokens.shape[0], tokens.shape[1])
    logits, _ = forward(params, cfg, tokens, cache, impl=impl)
    logp = jax.nn.log_softmax(logits[:, :-1, :].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll), nll.size


def perplexity(params, cfg: ModelConfig, token_stream: np.ndarray,
               window: int = 512, stride: int | None = None,
               impl: str = "auto") -> dict:
    """Sliding-window perplexity over a 1-D token stream."""
    stride = stride or window
    token_stream = np.asarray(token_stream)
    if token_stream.max(initial=0) >= cfg.vocab_size or token_stream.min(initial=0) < 0:
        raise ValueError(
            f"token ids out of range [0, {cfg.vocab_size}) -- would produce "
            f"silent NaN from out-of-bounds embedding gathers on TPU")
    total, count = 0.0, 0
    T = len(token_stream)
    for start in range(0, max(T - window, 0) + 1, stride):
        chunk = token_stream[start:start + window]
        if len(chunk) < window:
            break
        s, c = _window_nll(params, cfg, jnp.asarray(chunk[None]), impl=impl)
        total += float(s)
        count += int(c)
    if count == 0:
        raise ValueError(f"token stream too short ({T} < window {window})")
    nll = total / count
    return {"nll": nll, "ppl": float(np.exp(nll)), "tokens": count}


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def _seq_logprobs(params, cfg: ModelConfig, tokens, valid, impl: str = "auto"):
    """tokens (B, T) right-padded; valid (B, T) marks CONTINUATION
    positions (targets to score).  Returns (sum log p per row (B,),
    greedy-match flags (B,) -- True iff every scored position is also the
    model's argmax)."""
    cache = KVCache.create(cfg, tokens.shape[0], tokens.shape[1])
    logits, _ = forward(params, cfg, tokens, cache, impl=impl)
    logp = jax.nn.log_softmax(logits[:, :-1, :].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    v = valid[:, 1:]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    greedy = jnp.argmax(logp, axis=-1) == tgt
    return (jnp.sum(jnp.where(v, tok_lp, 0.0), axis=-1),
            jnp.all(greedy | ~v, axis=-1))


def score_continuations(params, cfg: ModelConfig, context, continuations,
                        impl: str = "auto") -> list:
    """Teacher-forced log-likelihood of each continuation given a shared
    context -- the lm-eval-harness loglikelihood primitive (the reference
    reaches the same numbers only through llama-perplexity's far blunter
    windowed NLL, tools/run_pipeline.py:218).

    context: list[int]; continuations: list[list[int]].  Returns a list of
    {"logprob": float, "greedy": bool} -- `greedy` is True iff the
    continuation is exactly the model's argmax decoding (what lm-eval's
    acc metric uses for multiple choice).

    All continuations batch into ONE padded forward (multiple-choice
    questions cost a single prefill-sized pass).
    """
    import numpy as np

    context = [int(t) for t in context]
    conts = [[int(t) for t in c] for c in continuations]
    assert context and all(conts), "context and continuations must be non-empty"
    B = len(conts)
    T = len(context) + max(len(c) for c in conts)
    T = -(-T // 8) * 8  # sublane-align the one-shot cache
    toks = np.zeros((B, T), np.int32)
    valid = np.zeros((B, T), bool)
    for i, c in enumerate(conts):
        row = context + c
        toks[i, :len(row)] = row
        valid[i, len(context):len(row)] = True
    lp, greedy = _seq_logprobs(params, cfg, jnp.asarray(toks),
                               jnp.asarray(valid), impl=impl)
    return [{"logprob": float(lp[i]), "greedy": bool(greedy[i])}
            for i in range(B)]
