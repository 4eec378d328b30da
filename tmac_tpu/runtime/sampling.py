"""Token samplers: greedy, temperature, top-k, top-p.

Replaces the llama.cpp sampling loop the reference relies on
(tools/run_pipeline.py:222-277 drives `llama-cli`).  Pure functions of
(logits, rng key) so they live inside the jitted decode step.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    temperature: float = 0.0   # 0 => greedy
    top_k: int = 0             # 0 => disabled
    top_p: float = 1.0         # 1 => disabled


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["temperature", "top_k", "top_p"],
    meta_fields=[],
)
@dataclasses.dataclass
class SamplerState:
    """Per-slot sampling parameters as TRACED (B,) vectors.

    The continuous-batching engine serves concurrent requests with
    different sampling settings from ONE jitted decode step: the params
    ride along as data, so admission of a request with new settings never
    recompiles (shapes are static, values are traced).
    """

    temperature: jax.Array  # (B,) f32; <= 0 => greedy for that slot
    top_k: jax.Array        # (B,) int32; 0 => disabled
    top_p: jax.Array        # (B,) f32; 1.0 => disabled

    @classmethod
    def make(cls, temperature, top_k, top_p) -> "SamplerState":
        return cls(
            temperature=jnp.asarray(temperature, jnp.float32),
            top_k=jnp.asarray(top_k, jnp.int32),
            top_p=jnp.asarray(top_p, jnp.float32),
        )

    @classmethod
    def broadcast(cls, cfg: SamplerConfig, batch: int) -> "SamplerState":
        return cls.make([cfg.temperature] * batch, [cfg.top_k] * batch,
                        [cfg.top_p] * batch)


def filtered_logits(logits: jax.Array, cfg: SamplerConfig) -> jax.Array:
    """The temperature/top-k/top-p-masked logits `sample` draws from
    (..., V) -> (..., V) with filtered entries at -inf.  Exposed so
    speculative rejection sampling can target the EXACT serving
    distribution (runtime/speculative._sampled_accept)."""
    assert cfg.temperature > 0.0
    logits = logits.astype(jnp.float32) / cfg.temperature
    if cfg.top_k > 0:
        kth = jax.lax.top_k(logits, cfg.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1;
        # clamp guards the float edge case cum[-1] < top_p)
        cutoff_idx = jnp.sum(cum < cfg.top_p, axis=-1, keepdims=True)
        cutoff_idx = jnp.minimum(cutoff_idx, logits.shape[-1] - 1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def sample(logits: jax.Array, key: jax.Array, cfg: SamplerConfig) -> jax.Array:
    """logits (B, V) -> token ids (B,). Static config => traced once."""
    if cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, filtered_logits(logits, cfg),
                                  axis=-1).astype(jnp.int32)


def sample_state(logits: jax.Array, key: jax.Array,
                 st: SamplerState) -> jax.Array:
    """logits (B, V) -> token ids (B,) with PER-SLOT traced params.

    Matches sample()'s semantics slot-wise: temperature <= 0 is greedy;
    top-k masks below the k-th largest; top-p masks below the nucleus
    cutoff.  One descending sort serves both filters.
    """
    V = logits.shape[-1]
    lf = logits.astype(jnp.float32)
    greedy = jnp.argmax(lf, axis=-1).astype(jnp.int32)
    scaled = lf / jnp.maximum(st.temperature, 1e-6)[:, None]
    sorted_desc = jnp.sort(scaled, axis=-1)[..., ::-1]
    # top-k: value must be >= the k-th largest (k <= 0 -> keep all)
    k_eff = jnp.clip(jnp.where(st.top_k > 0, st.top_k, V), 1, V)
    kth = jnp.take_along_axis(sorted_desc, (k_eff - 1)[:, None], axis=-1)
    masked = jnp.where(scaled < kth, -jnp.inf, scaled)
    # top-p nucleus cutoff on the TOP-K-FILTERED distribution (matching
    # sample() and llama.cpp: top-k first, then top-p renormalized over
    # the survivors).  In sorted space the top-k mask is positional --
    # keep the first k_eff entries -- so no second sort is needed.
    sorted_masked = jnp.where(jnp.arange(V)[None, :] < k_eff[:, None],
                              sorted_desc, -jnp.inf)
    probs = jax.nn.softmax(sorted_masked, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < st.top_p[:, None], axis=-1, keepdims=True)
    cutoff_idx = jnp.minimum(cutoff_idx, V - 1)
    cutoff = jnp.take_along_axis(sorted_masked, cutoff_idx, axis=-1)
    masked = jnp.where(scaled < cutoff, -jnp.inf, masked)
    sampled = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.where(st.temperature <= 0.0, greedy, sampled)
