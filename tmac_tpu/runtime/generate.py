"""Prefill + decode loops.

The host-loop role of the reference's llama.cpp integration
(`llama-cli -n 128 ...`, tools/run_pipeline.py:222-277), re-done the JAX
way: one jitted prefill over the prompt, one jitted single-token step, and
a jitted multi-step decode (lax.scan) for benchmark/serving use so the
host never round-trips per token.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tmac_tpu.models.config import ModelConfig
from tmac_tpu.models.llama import KVCache, forward
from tmac_tpu.runtime.sampling import (SamplerConfig, apply_penalties,
                                       bump_counts, sample)


@functools.partial(jax.jit, static_argnames=("cfg", "impl", "chunk"),
                   donate_argnames=("cache",))
def prefill(params, cfg: ModelConfig, tokens, cache: KVCache,
            impl: str = "auto", chunk: int = 256):
    """Run the prompt; returns (last-position logits (B, V), cache).

    The cache is donated: without it XLA copies the full (L, ...) stack at
    every layer's in-place KV write (L^2 bytes moved -- measured as the
    dominant prefill cost on 26-layer models).

    Long prompts run in `chunk`-token pieces inside one jit: the fused
    qgemm kernel keeps its activations + quantized scratch + output block
    in VMEM, which overflows the ~16 MB core VMEM beyond a few hundred
    rows, and attention-score memory grows with T^2."""
    B, T = tokens.shape
    logits = None
    for off in range(0, T, chunk):  # static unroll at trace time
        logits, cache = forward(params, cfg, tokens[:, off:off + chunk],
                                cache, impl=impl)
    return logits[:, -1, :], cache


@functools.partial(jax.jit, static_argnames=("cfg", "sampler", "impl"),
                   donate_argnames=("cache",))
def decode_step(params, cfg: ModelConfig, last_tokens, cache: KVCache,
                key, sampler: SamplerConfig = SamplerConfig(), impl: str = "auto"):
    """One token for every sequence: (B,) -> (B,). Cache is donated."""
    logits, cache = forward(params, cfg, last_tokens[:, None], cache, impl=impl)
    next_tokens = sample(logits[:, -1, :], key, sampler)
    return next_tokens, cache


@functools.partial(jax.jit, static_argnames=("cfg", "steps", "sampler", "impl"),
                   donate_argnames=("cache",))
def decode_loop(params, cfg: ModelConfig, first_tokens, cache: KVCache, key,
                steps: int, sampler: SamplerConfig = SamplerConfig(),
                impl: str = "auto"):
    """Generate `steps` tokens with an on-device lax.scan.

    Returns (tokens (B, steps), cache). No host round-trips between tokens
    -- this is what the tokens/s benchmark measures.
    """

    penal = sampler.has_penalties  # static: neutral params cost nothing
    B = first_tokens.shape[0]
    counts0 = (bump_counts(jnp.zeros((B, cfg.vocab_size), jnp.int32),
                           first_tokens) if penal else None)

    def body(carry, k):
        tok, cache, counts = carry
        logits, cache = forward(params, cfg, tok[:, None], cache, impl=impl)
        lg = logits[:, -1, :]
        if penal:
            lg = apply_penalties(lg, counts, sampler.repeat_penalty,
                                 sampler.presence_penalty,
                                 sampler.frequency_penalty)
        nxt = sample(lg, k, sampler)
        if penal:
            counts = bump_counts(counts, nxt)
        return (nxt, cache, counts), nxt

    keys = jax.random.split(key, steps)
    (last, cache, _), toks = jax.lax.scan(
        body, (first_tokens, cache, counts0), keys)
    return jnp.moveaxis(toks, 0, 1), cache


def generate(params, cfg: ModelConfig, prompt_tokens, max_new_tokens: int,
             max_len: Optional[int] = None, sampler: SamplerConfig = SamplerConfig(),
             seed: int = 0, impl: str = "auto", batch: Optional[int] = None,
             kv_quant: bool = False):
    """Convenience end-to-end generation (prefill + decode_loop).
    kv_quant: int8 KV cache (KVCache quant mode -- half the KV bytes)."""
    import numpy as np
    pt = np.asarray(prompt_tokens)
    if pt.max(initial=0) >= cfg.vocab_size or pt.min(initial=0) < 0:
        raise ValueError(f"prompt token ids out of range [0, {cfg.vocab_size})")
    B, T = prompt_tokens.shape
    # round the cache length to a sublane multiple: the flash-decode
    # kernel's pos-bounded DMA blocks must be 8-aligned (Mosaic tiling)
    max_len = -(-(max_len or (T + max_new_tokens)) // 64) * 64
    cache = KVCache.create(cfg, B, max_len, quant=kv_quant)
    logits, cache = prefill(params, cfg, jnp.asarray(prompt_tokens), cache, impl)
    key = jax.random.PRNGKey(seed)
    first = sample(logits, key, sampler)
    toks, cache = decode_loop(params, cfg, first, cache, key,
                              steps=max_new_tokens - 1, sampler=sampler, impl=impl)
    return jnp.concatenate([first[:, None], toks], axis=1)
