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
