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
    min_p: float = 0.0         # 0 => disabled (llama.cpp default 0.05)
    # repetition penalties over the GENERATED tokens of the request
    # (OpenAI-style scope; llama.cpp additionally windows over the prompt
    # tail).  repeat_penalty: llama.cpp classic (logit/p if >0 else *p for
    # seen tokens; 1 = off).  presence/frequency: OpenAI additive forms.
    repeat_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0

    @property
    def has_penalties(self) -> bool:
        return (self.repeat_penalty != 1.0 or self.presence_penalty != 0.0
                or self.frequency_penalty != 0.0)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["temperature", "top_k", "top_p", "min_p", "repeat_penalty",
                 "presence_penalty", "frequency_penalty"],
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
    min_p: jax.Array        # (B,) f32; 0.0 => disabled
    repeat_penalty: jax.Array     # (B,) f32; 1.0 => off
    presence_penalty: jax.Array   # (B,) f32; 0.0 => off
    frequency_penalty: jax.Array  # (B,) f32; 0.0 => off

    @classmethod
    def make(cls, temperature, top_k, top_p, repeat_penalty=None,
             presence_penalty=None, frequency_penalty=None,
             min_p=None) -> "SamplerState":
        n = len(temperature)
        return cls(
            temperature=jnp.asarray(temperature, jnp.float32),
            top_k=jnp.asarray(top_k, jnp.int32),
            top_p=jnp.asarray(top_p, jnp.float32),
            min_p=jnp.asarray(min_p if min_p is not None else [0.0] * n,
                              jnp.float32),
            repeat_penalty=jnp.asarray(
                repeat_penalty if repeat_penalty is not None else [1.0] * n,
                jnp.float32),
            presence_penalty=jnp.asarray(
                presence_penalty if presence_penalty is not None
                else [0.0] * n, jnp.float32),
            frequency_penalty=jnp.asarray(
                frequency_penalty if frequency_penalty is not None
                else [0.0] * n, jnp.float32),
        )

    @classmethod
    def broadcast(cls, cfg: SamplerConfig, batch: int) -> "SamplerState":
        return cls.make([cfg.temperature] * batch, [cfg.top_k] * batch,
                        [cfg.top_p] * batch,
                        [cfg.repeat_penalty] * batch,
                        [cfg.presence_penalty] * batch,
                        [cfg.frequency_penalty] * batch,
                        [cfg.min_p] * batch)


def apply_penalties(logits: jax.Array, counts: jax.Array,
                    repeat_penalty, presence_penalty,
                    frequency_penalty) -> jax.Array:
    """Repetition penalties over per-request token counts.

    logits (B, V); counts (B, V) int32 occurrences in the request's
    GENERATED tokens; penalty params are scalars or (B,) vectors.
    repeat_penalty follows llama.cpp (divide positive logits, multiply
    negative ones, for seen tokens); presence/frequency are the OpenAI
    additive forms.  Neutral params (1, 0, 0) return logits unchanged
    (exact identity -- safe to apply unconditionally on a gated path)."""
    lf = logits.astype(jnp.float32)
    rp = jnp.broadcast_to(jnp.asarray(repeat_penalty, jnp.float32),
                          lf.shape[:1])[:, None]
    pp = jnp.broadcast_to(jnp.asarray(presence_penalty, jnp.float32),
                          lf.shape[:1])[:, None]
    fp = jnp.broadcast_to(jnp.asarray(frequency_penalty, jnp.float32),
                          lf.shape[:1])[:, None]
    seen = counts > 0
    pen = jnp.where(lf > 0, lf / rp, lf * rp)
    lf = jnp.where(seen, pen, lf)
    return (lf - pp * seen.astype(jnp.float32)
            - fp * counts.astype(jnp.float32))


def bump_counts(counts: jax.Array, tokens: jax.Array,
                active=None) -> jax.Array:
    """counts (B, V) += one_hot(tokens (B,)), only for active slots."""
    B = counts.shape[0]
    inc = (jnp.ones((B,), counts.dtype) if active is None
           else active.astype(counts.dtype))
    return counts.at[jnp.arange(B), tokens].add(inc)


def filtered_logits(logits: jax.Array, cfg: SamplerConfig) -> jax.Array:
    """The temperature/top-k/top-p-masked logits `sample` draws from
    (..., V) -> (..., V) with filtered entries at -inf.  Exposed so
    speculative rejection sampling can target the EXACT serving
    distribution (runtime/speculative._sampled_accept)."""
    assert cfg.temperature > 0.0
    base = logits.astype(jnp.float32)  # pre-temperature, for min_p
    logits = base / cfg.temperature
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
    if cfg.min_p > 0.0:
        # llama.cpp min-p: drop tokens whose probability is below
        # min_p * max_prob -- computed on the PRE-temperature distribution
        # (llama.cpp's chain applies min_p before temperature scaling;
        # testing scaled probs would square/root the ratios)
        probs = jax.nn.softmax(
            jnp.where(jnp.isfinite(logits), base, -jnp.inf), axis=-1)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        logits = jnp.where(probs < cfg.min_p * pmax, -jnp.inf, logits)
    return logits


def _categorical(key: jax.Array, logits: jax.Array) -> jax.Array:
    """jax.random.categorical that also accepts PER-ROW keys: key (2,)
    draws the whole (B, V) batch from one stream (the engine's default);
    key (B, 2) gives every row its own stream (per-request seeds -- a
    request's noise then depends only on its own key chain, not on batch
    composition)."""
    if key.ndim == 2:
        return jax.vmap(
            lambda k, l: jax.random.categorical(k, l))(key, logits)
    return jax.random.categorical(key, logits, axis=-1)


def sample(logits: jax.Array, key: jax.Array, cfg: SamplerConfig) -> jax.Array:
    """logits (B, V) -> token ids (B,). Static config => traced once.
    key: (2,) batch-wide or (B, 2) per-row (see _categorical)."""
    if cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return _categorical(key, filtered_logits(logits, cfg)).astype(jnp.int32)


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
    # min-p over the PRE-temperature probabilities on the filtered
    # support (matching filtered_logits / llama.cpp; 0 disables per slot)
    probs_m = jax.nn.softmax(
        jnp.where(jnp.isfinite(masked), lf, -jnp.inf), axis=-1)
    pmax = jnp.max(probs_m, axis=-1, keepdims=True)
    masked = jnp.where(probs_m < st.min_p[:, None] * pmax, -jnp.inf, masked)
    sampled = _categorical(key, masked).astype(jnp.int32)
    return jnp.where(st.temperature <= 0.0, greedy, sampled)
