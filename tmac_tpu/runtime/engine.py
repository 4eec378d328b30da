"""Continuous-batching inference engine.

The serving layer the reference delegates to llama.cpp's single-stream host
loop (tools/run_pipeline.py:222-277 drives `llama-cli` one request at a
time).  This is net-new surface (SURVEY.md section 2.2): a slot-based
continuous batcher designed for the TPU execution model --

  * a fixed batch of B slots shares one jitted decode step, so admission or
    completion of a request never triggers recompilation (the active mask
    and per-slot positions are traced values, shapes are static),
  * decode runs in on-device chunks of `decode_chunk` tokens (lax.scan) so
    the host round-trip (expensive through the TPU tunnel) is amortized
    over many tokens; finish conditions (eos / max tokens) are checked at
    chunk granularity and overshoot is trimmed host-side,
  * prefill goes through length buckets (pad to the next power-of-two-ish
    size) so the number of compiled prefill programs is bounded,
  * each slot owns a contiguous region of the (L, B, S, KV, D) KV cache
    with its own write position (models/llama.py KVCache.pos is (B,)).

Single-chip by construction here; the same step functions run under a mesh
via tmac_tpu/parallel/tp.py (batch dim = dp axis).
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import time
from collections import OrderedDict, deque
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tmac_tpu.models.config import ModelConfig
from tmac_tpu.models.llama import KVCache, forward
from tmac_tpu.runtime.sampling import (SamplerConfig, SamplerState,
                                       apply_penalties, bump_counts, sample,
                                       sample_state)


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    max_new_tokens: int = 128
    eos_id: Optional[int] = None
    # per-request sampling overrides (None -> the engine's SamplerConfig);
    # traced per-slot vectors on device, so no recompile per setting
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    min_p: Optional[float] = None
    repeat_penalty: Optional[float] = None
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    # stop sequences over GENERATED token ids: when the output ends with
    # any of these, the request finishes and the matched sequence is
    # REMOVED from the output (llama.cpp's antiprompt/stop semantics --
    # the stop text is not part of the completion).  Token-level matching
    # happens at chunk granularity host-side; text-level stop strings
    # (which can straddle token boundaries) live in runtime/server.py's
    # StopMatcher on the decoded stream.
    stop_tokens: Optional[List[List[int]]] = None
    # per-request RNG seed: when set, the request's sampling noise is a
    # pure function of (seed, token index) -- the same request reproduces
    # the same output regardless of batch composition, slot, or what else
    # the server is doing (the OpenAI / llama.cpp `seed` param)
    seed: Optional[int] = None
    # number of top-alternative logprobs to record per generated token
    # (0 = off; capped at the engine's static logprobs_k).  Logprobs are
    # log-softmax of the RAW model logits (the model distribution, before
    # temperature/penalty shaping -- the OpenAI convention).
    logprobs: int = 0
    # filled by the engine:
    output: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    # per generated token, when logprobs > 0:
    # {"logprob": float, "top": [(token_id, logprob), ...]}
    logprobs_out: List[dict] = dataclasses.field(default_factory=list)
    # why the request finished: "eos" | "stop" (stop_tokens match) |
    # "length" (max_new_tokens or cache capacity) | "" (still running)
    finish_reason: str = ""
    prompt_len: int = 0
    # incremental-prefill state (requests occupy a slot while prefilling;
    # decode of other slots proceeds between their chunks)
    prefill_off: int = 0
    last_logits: object = None
    prefill_t0: float = 0.0

    def __post_init__(self):
        self.prompt_len = len(self.prompt)

    @property
    def prefilling(self) -> bool:
        return self.prefill_off < self.prompt_len


def _prefill_slot_body(forward_fn, tokens, true_len, cache: KVCache, slot,
                       start_pos=None):
    """Prefill one chunk of a request into cache slot `slot` (shared core).

    forward_fn(tokens, cache, active=None) -> (logits, cache).
    tokens: (1, bucket) right-padded chunk. true_len: valid tokens in THIS
    chunk; start_pos: the slot position the chunk begins at (None = 0, a
    fresh request).  Long prompts run as several chunks (engine
    prefill_chunk) so attention-score memory stays bounded.
    Returns (last-real-position logits (V,), cache); pos advances to
    start_pos + true_len.
    """
    if start_pos is None:
        start_pos = jnp.zeros((), jnp.int32)
    sl1 = lambda a: (jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1)
                     if a is not None else None)
    sub = KVCache(
        k=sl1(cache.k), v=sl1(cache.v),
        pos=start_pos[None].astype(jnp.int32),
        k_scale=sl1(cache.k_scale), v_scale=sl1(cache.v_scale),
    )
    # right-padding mask: padded rows must not steal MoE dispatch capacity
    valid = (jnp.arange(tokens.shape[1]) < true_len)[None, :]
    logits, sub = forward_fn(tokens, sub, valid=valid)
    up1 = lambda a, u: (jax.lax.dynamic_update_slice_in_dim(a, u, slot, axis=1)
                        if a is not None else None)
    pos = jax.lax.dynamic_update_slice(
        cache.pos, (start_pos + true_len)[None].astype(jnp.int32), (slot,))
    last = jax.lax.dynamic_slice(logits[0], (true_len - 1, 0),
                                 (1, logits.shape[-1]))[0]
    return last, KVCache(k=up1(cache.k, sub.k), v=up1(cache.v, sub.v),
                         pos=pos, k_scale=up1(cache.k_scale, sub.k_scale),
                         v_scale=up1(cache.v_scale, sub.v_scale))


def _decode_chunk_body(forward_fn, sampler: SamplerConfig, last_tokens,
                       cache: KVCache, keys, active, eos_ids=None,
                       remaining=None, state: Optional[SamplerState] = None,
                       counts=None, logprobs_k: int = 0,
                       slot_keys=None, key_offsets=None):
    """Up to `steps` tokens for every active slot in one on-device loop
    (shared core).  Inactive slots are frozen: their pos does not advance
    and their token is carried through unchanged.  Slots whose pos would
    run off the cache end self-deactivate.

    eos_ids (B,) int32 (-1 = none) and remaining (B,) int32 move the
    finish conditions ON DEVICE: a slot that hits eos or exhausts its
    token budget freezes mid-chunk (no KV writes, no pos advance past
    eos), and the loop EXITS EARLY once every slot is finished -- the
    reference-free analog of llama.cpp's per-token stop check, without
    giving up chunked host round-trips.  state: optional per-slot
    SamplerState overriding the static sampler config.

    logprobs_k (STATIC): when > 0, also return per-step logprob records
    computed from the RAW logits (log-softmax of the model distribution,
    before penalties/temperature -- the OpenAI logprobs convention):
    chosen (B, steps) f32, top ids (B, steps, k) int32, top values
    (B, steps, k) f32.  Entries at steps a slot did not execute are
    zeros; the host consumes only as many as it appends.

    slot_keys (B, 2) uint32 + key_offsets (B,) int32 (optional, together):
    per-slot PRNG chains for reproducible per-request sampling -- step i
    samples slot b with fold_in(slot_keys[b], key_offsets[b] + i), so a
    request's noise depends only on its own key chain and token index,
    never on batch composition (the `keys` argument then only supplies
    the step count).
    """
    S = cache.max_len
    steps, B = keys.shape[0], last_tokens.shape[0]
    if eos_ids is None:
        eos_ids = jnp.full((B,), -1, jnp.int32)
    if remaining is None:
        remaining = jnp.full((B,), steps, jnp.int32)
    out0 = jnp.broadcast_to(last_tokens[None], (steps, B))

    penal = counts is not None  # static: python-level branch at trace
    cnt0 = counts if penal else jnp.zeros((B, 1), jnp.int32)
    per_slot_keys = slot_keys is not None  # static
    if key_offsets is None:
        key_offsets = jnp.zeros((B,), jnp.int32)
    lpk = int(logprobs_k)  # static
    lp0 = jnp.zeros((steps, B), jnp.float32)
    lpi0 = jnp.zeros((steps, B, max(lpk, 1)), jnp.int32)
    lpv0 = jnp.zeros((steps, B, max(lpk, 1)), jnp.float32)

    def cond(c):
        i, tok, cache, rem, alive, out, cnt, lp, lpi, lpv = c
        return (i < steps) & jnp.any(alive & active & (cache.pos < S)
                                     & (rem > 0))

    def body(c):
        i, tok, cache, rem, alive, out, cnt, lp, lpi, lpv = c
        act = alive & active & (cache.pos < S) & (rem > 0)
        logits, cache = forward_fn(tok[:, None], cache, active=act)
        if per_slot_keys:
            k = jax.vmap(jax.random.fold_in)(slot_keys, key_offsets + i)
        else:
            k = keys[i]
        lg = logits[:, -1, :]
        if lpk:
            logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        if penal:
            lg = (apply_penalties(lg, cnt, state.repeat_penalty,
                                  state.presence_penalty,
                                  state.frequency_penalty)
                  if state is not None else
                  apply_penalties(lg, cnt, sampler.repeat_penalty,
                                  sampler.presence_penalty,
                                  sampler.frequency_penalty))
        nxt = (sample_state(lg, k, state) if state is not None
               else sample(lg, k, sampler))
        nxt = jnp.where(act, nxt, tok)
        if lpk:
            chosen = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
            tv, ti = jax.lax.top_k(logp, lpk)
            lp = jax.lax.dynamic_update_slice(lp, chosen[None], (i, 0))
            lpi = jax.lax.dynamic_update_slice(lpi, ti[None], (i, 0, 0))
            lpv = jax.lax.dynamic_update_slice(lpv, tv[None], (i, 0, 0))
        if penal:
            cnt = bump_counts(cnt, nxt, active=act)
        alive = alive & ~(act & (nxt == eos_ids))
        rem = rem - act.astype(jnp.int32)
        out = jax.lax.dynamic_update_slice(out, nxt[None], (i, 0))
        return (i + 1, nxt, cache, rem, alive, out, cnt, lp, lpi, lpv)

    alive0 = jnp.ones((B,), bool)
    _, _, cache, _, _, toks, cnt, lp, lpi, lpv = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), last_tokens, cache, remaining, alive0, out0, cnt0,
         lp0, lpi0, lpv0))
    toks = jnp.moveaxis(toks, 0, 1)  # (B, steps)
    res = (toks, cache)
    if penal:
        res += (cnt,)
    if lpk:
        res += ((jnp.moveaxis(lp, 0, 1), jnp.moveaxis(lpi, 0, 1),
                 jnp.moveaxis(lpv, 0, 1)),)
    return res


@functools.partial(jax.jit, static_argnames=("n",))
def _extract_prefix(k, v, slot, n: int, ks=None, vs=None):
    """Copy the first `n` cache positions of `slot` out as a prefix block.

    k/v: (L, B, KV, S, D); ks/vs: optional (L, B, KV, S) int8-cache scales.
    Returns ((L, 1, KV, n, D) k, v, (L, 1, KV, n) ks, vs or None).  `n` is
    static (padded to a 128 multiple by the caller) so compile count stays
    bounded.
    """
    L, _, KV, _, D = k.shape
    z = jnp.int32(0)
    idx = (z, slot.astype(jnp.int32), z, z, z)
    sc = lambda a: (jax.lax.dynamic_slice(a, idx[:4], (L, 1, KV, n))
                    if a is not None else None)
    return (jax.lax.dynamic_slice(k, idx, (L, 1, KV, n, D)),
            jax.lax.dynamic_slice(v, idx, (L, 1, KV, n, D)),
            sc(ks), sc(vs))


@functools.partial(jax.jit, donate_argnames=("k", "v", "ks", "vs"))
def _insert_prefix(k, v, pk, pv, slot, ks=None, vs=None, pks=None, pvs=None):
    """Write a stored prefix block into `slot`'s cache region (donating the
    cache so XLA updates in place).  Positions beyond the matched prefix
    length hold stale K/V from the donor prompt, but every attention reader
    is pos-bounded and the remainder prefill overwrites from the match
    point onward, so they are never observed."""
    z = jnp.int32(0)
    idx = (z, slot.astype(jnp.int32), z, z, z)
    up = lambda a, p: (jax.lax.dynamic_update_slice(a, p, idx[:a.ndim])
                       if a is not None else None)
    return up(k, pk), up(v, pv), up(ks, pks), up(vs, pvs)


@dataclasses.dataclass
class _PrefixEntry:
    tokens: tuple          # the prefix token ids (true length = len(tokens))
    k: jax.Array           # (L, 1, KV, Pb, D), Pb = padded store length
    v: jax.Array
    ks: object = None      # (L, 1, KV, Pb) scales when the cache is int8
    vs: object = None


@functools.partial(jax.jit, static_argnames=("cfg", "impl", "bucket"),
                   donate_argnames=("cache",))
def _prefill_slot(params, cfg: ModelConfig, tokens, true_len, cache: KVCache,
                  slot, start_pos, impl: str = "auto", bucket: int = 0):
    """Single-chip prefill-into-slot. One compile per bucket."""
    del bucket
    return _prefill_slot_body(
        lambda t, c, active=None, valid=None: forward(
            params, cfg, t, c, impl=impl, active=active, valid=valid),
        tokens, true_len, cache, slot, start_pos)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "steps", "sampler", "impl", "logprobs_k"),
    donate_argnames=("cache",),
)
def _decode_chunk(params, cfg: ModelConfig, last_tokens, cache: KVCache,
                  keys, active, steps: int,
                  sampler: SamplerConfig = SamplerConfig(),
                  impl: str = "auto", eos_ids=None, remaining=None,
                  state: Optional[SamplerState] = None, counts=None,
                  logprobs_k: int = 0, slot_keys=None, key_offsets=None):
    """Single-chip decode chunk: `steps` tokens for every active slot.
    counts (B, V) int32 (optional): per-slot generated-token counts for
    the repetition penalties; when given, the return gains the updated
    counts.  logprobs_k (static, optional): when > 0 the return gains a
    (chosen, top_ids, top_vals) logprob triple (see _decode_chunk_body).
    slot_keys/key_offsets (optional): per-slot PRNG chains for
    reproducible per-request seeds (see _decode_chunk_body)."""
    del steps
    return _decode_chunk_body(
        lambda t, c, active=None, valid=None: forward(
            params, cfg, t, c, impl=impl, active=active, valid=valid),
        sampler, last_tokens, cache, keys, active, eos_ids=eos_ids,
        remaining=remaining, state=state, counts=counts,
        logprobs_k=logprobs_k, slot_keys=slot_keys,
        key_offsets=key_offsets)


@functools.partial(jax.jit, static_argnames=("k",))
def _logprobs_of(logits, token, k: int):
    """One-off logprob record for a single (V,) logits row (the prefill
    first token): (chosen logprob, top-k ids, top-k logprobs)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    tv, ti = jax.lax.top_k(logp, k)
    return logp[token], ti, tv


def _lp_rec(chosen, ids, vals, n: int) -> dict:
    """Host-side logprob record: chosen-token logprob + the top-n
    alternatives as (token_id, logprob) pairs."""
    return {"logprob": float(chosen),
            "top": [(int(i), float(v))
                    for i, v in zip(ids[:n], vals[:n])]}


class InferenceEngine:
    """Slot-based continuous batching over a fixed-shape KV cache.

    Usage:
        eng = InferenceEngine(cfg, params, max_batch=8, max_len=2048)
        uid = eng.submit([1, 2, 3], max_new_tokens=64)
        results = eng.run()          # drain everything
        results[uid]                 # -> list of generated token ids
    or incrementally: eng.step() until eng.pending() == 0.
    """

    def __init__(self, cfg: ModelConfig, params, max_batch: int = 8,
                 max_len: int = 2048, sampler: SamplerConfig = SamplerConfig(),
                 impl: str = "auto", decode_chunk: int = 16,
                 max_decode_chunk: int = 0,
                 prefill_buckets: Optional[List[int]] = None, seed: int = 0,
                 stream_cb: Optional[Callable[[int, List[int]], None]] = None,
                 step_fns=None, cache: Optional[KVCache] = None,
                 prefill_chunk: int = 256, prefill_budget: int = 1,
                 speculative: bool = False, spec_k: int = 8,
                 spec_ngram: int = 3, prefix_cache_size: int = 0,
                 prefix_cache_max_len: int = 256,
                 prefix_cache_min_reuse: int = 16, kv_quant: bool = False,
                 logprobs_k: int = 8):
        """step_fns: optional (prefill_fn, decode_fn) pair replacing the
        single-chip jitted steps -- e.g. parallel/tp.make_engine_fns for a
        tensor-parallel mesh (pass pre-sharded params and a sharded cache):
          prefill_fn(params, tokens (1,Tb), true_len, cache, slot, start_pos)
              -> (last logits (V,), cache)
          decode_fn(params, last (B,), cache, keys (steps,...), active (B,),
                    eos_ids (B,), remaining (B,), state SamplerState|None,
                    counts (B, V) int32|None)
              -> (tokens (B, steps), cache) or, when counts is given,
                 (tokens, cache, counts) -- counts carries the
                 repetition-penalty token tallies across chunks
        prefill_chunk: long prompts prefill in chunks of at most this many
        tokens, bounding attention-score memory (a 2048-token one-shot
        prefill would materialize ~0.5 GB of f32 scores per layer).
        stream_cb(uid, tokens_so_far, done): invoked after every decode
        chunk that produced tokens for the request (incremental streaming)
        and once more with done=True on completion.
        speculative: opt-in single-stream latency mode (max_batch must be
        1, single-chip): greedy decode chunks run through the on-device
        lookup-speculation loop (runtime/speculative.py) -- lossless, and
        several tokens per forward on self-repetitive contexts.  Requests
        with non-greedy sampling fall back to the normal chunked path.
        prefix_cache_size: keep the KV blocks of the last N distinct
        prompt prefixes (LRU) and, when a new prompt shares a prefix with
        one, skip prefilling the shared part -- the role of llama.cpp's
        --prompt-cache (reference context: tools/run_pipeline.py:222-277
        drives llama-cli, whose repeated system prompts re-prefill every
        run).  KV at position i depends only on tokens[0:i+1], so any
        common prefix of a stored entry is reusable, not just exact hits.
        0 disables.  Single-chip engines only (a mesh cache is sharded;
        step_fns engines ignore it).  prefix_cache_max_len bounds stored
        bytes per entry; prefix_cache_min_reuse is the shortest match
        worth the block copy.
        logprobs_k: static top-k width of the logprob records produced
        when a request asks for them (submit(..., logprobs=n), n capped
        at this).  The decode chunk gains a log-softmax + top-k per step
        only while a logprobs request is live (two jit cache entries,
        like the dynamic-sampling path).  Single-chip engines only (the
        step_fns decode signature doesn't carry the extra outputs).
        """
        self.cfg = cfg
        self.params = params
        self._step_fns = step_fns
        self.prefill_chunk = prefill_chunk
        self.prefill_budget = prefill_budget
        self._pf_rr = 0
        self.B = max_batch
        self.S = max_len
        self.sampler = sampler
        self.impl = impl
        self.chunk = decode_chunk
        # Adaptive chunk growth: when the scheduler has nothing competing
        # (no waiting queue, no prefilling slot, no stop-sequence request)
        # the decode chunk doubles up to max_decode_chunk, bounded by the
        # smallest active remaining-token budget.  Each host round trip
        # costs ~0.9 ms/token at chunk 32 over a remote tunnel (BENCH.md
        # long-context section); growing the chunk amortizes it without
        # hurting admission latency (growth only happens when the queue is
        # empty) or completion latency (bounded by min remaining).  Chunk
        # sizes are power-of-two multiples of decode_chunk, so at most
        # log2(max/chunk) extra jit cache entries.  0 disables.
        self.max_chunk = max(max_decode_chunk, decode_chunk) \
            if max_decode_chunk else decode_chunk
        self.stream_cb = stream_cb
        self.speculative = speculative
        self.spec_k = spec_k
        self.spec_ngram = spec_ngram
        if speculative:
            assert max_batch == 1 and step_fns is None, (
                "speculative engine mode is single-stream, single-chip")
        if prefill_buckets is None:
            prefill_buckets = []
            b = 16
            while b < min(max_len, prefill_chunk):
                prefill_buckets.append(b)
                b *= 4
            prefill_buckets.append(min(max_len, prefill_chunk))
        self.buckets = sorted(set(prefill_buckets))
        # kv_quant: int8 KV cache -- half the KV HBM traffic per decode
        # step and half the cache memory (2x slots/context per chip)
        self.cache = cache if cache is not None else KVCache.create(
            cfg, max_batch, max_len, quant=kv_quant)
        self.key = jax.random.PRNGKey(seed)
        # Decode-step keys are derived by fold_in from a fixed base and a
        # monotone step counter, NOT by splitting self.key per chunk: the
        # per-step key stream is then invariant to how steps are grouped
        # into chunks (decode_chunk, adaptive growth, queue state), so a
        # seeded engine reproduces tokens regardless of max_decode_chunk.
        # (Per-request reproducibility across different co-tenancy still
        # needs per-request seeds -- the slot_keys path.)
        self._decode_base_key = jax.random.fold_in(self.key, 0x5eed)
        self._decode_step_no = 0
        self._uid = itertools.count()
        self.waiting: deque[Request] = deque()
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.last_tokens = np.zeros((max_batch,), np.int32)
        # per-slot sampling params: traced vectors while any LIVE request
        # overrides the engine default (counted, so an all-greedy batch
        # returns to the cheap argmax path once override requests drain --
        # at most 2 jit cache entries either way)
        self._n_dynamic = 0
        self.logprobs_k = max(int(logprobs_k), 1)
        self._n_logprobs = 0  # live requests wanting logprob records
        # per-slot PRNG base keys (uint32 key data).  Always filled at
        # admission; the per-slot-key decode variant engages only while a
        # seeded request is live (_n_seeded > 0), so the default path's
        # jit cache and sampling streams are untouched otherwise.
        self._n_seeded = 0
        self._slot_key = np.zeros((max_batch, 2), np.uint32)
        self._slot_temp = np.full((max_batch,), sampler.temperature, np.float32)
        self._slot_topk = np.full((max_batch,), sampler.top_k, np.int32)
        self._slot_topp = np.full((max_batch,), sampler.top_p, np.float32)
        self._slot_minp = np.full((max_batch,), sampler.min_p, np.float32)
        self._slot_rp = np.full((max_batch,), sampler.repeat_penalty,
                                np.float32)
        self._slot_pp = np.full((max_batch,), sampler.presence_penalty,
                                np.float32)
        self._slot_fp = np.full((max_batch,), sampler.frequency_penalty,
                                np.float32)
        # per-slot generated-token counts for the repetition penalties;
        # allocated lazily on the first penalized request (the (B, V)
        # buffer + scatter-add cost nothing unless used)
        self._counts = None
        self.finished: Dict[int, Request] = {}
        # prompt-prefix KV cache (LRU over _PrefixEntry); see __init__ doc
        self.prefix_cache_size = (prefix_cache_size if step_fns is None else 0)
        self.prefix_cache_max_len = prefix_cache_max_len
        self.prefix_cache_min_reuse = max(prefix_cache_min_reuse, 1)
        self._prefixes: "OrderedDict[tuple, _PrefixEntry]" = OrderedDict()
        # counters (observability; served by runtime/server.py /v1/stats)
        self.stats = {"prefill_tokens": 0, "decode_tokens": 0,
                      "chunks": 0, "prefills": 0,
                      "decode_s": 0.0, "prefill_s": 0.0,
                      "requests_finished": 0,
                      "prefix_hits": 0, "prefix_tokens_reused": 0}

    # ------------------------------------------------------------------ API
    def submit(self, prompt, max_new_tokens: int = 128,
               eos_id: Optional[int] = None,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None,
               min_p: Optional[float] = None,
               repeat_penalty: Optional[float] = None,
               presence_penalty: Optional[float] = None,
               frequency_penalty: Optional[float] = None,
               stop_tokens: Optional[List[List[int]]] = None,
               logprobs: int = 0, seed: Optional[int] = None) -> int:
        prompt = [int(t) for t in np.asarray(prompt).reshape(-1)]
        assert len(prompt) >= 1, "empty prompt"
        assert len(prompt) + max_new_tokens <= self.S, (
            f"prompt {len(prompt)} + max_new {max_new_tokens} exceeds "
            f"engine max_len {self.S}")
        if logprobs:
            assert self._step_fns is None, (
                "logprobs are single-chip only (mesh step_fns)")
            logprobs = min(int(logprobs), self.logprobs_k)
        if seed is not None:
            assert self._step_fns is None, (
                "per-request seeds are single-chip only (mesh step_fns)")
        if stop_tokens:
            stop_tokens = [[int(t) for t in s] for s in stop_tokens]
            assert all(len(s) >= 1 for s in stop_tokens), (
                "empty stop sequence")
        uid = next(self._uid)
        ov = (temperature, top_k, top_p, min_p, repeat_penalty,
              presence_penalty, frequency_penalty)
        if any(v is not None for v in ov):
            self._n_dynamic += 1
        if logprobs:
            self._n_logprobs += 1
        if seed is not None:
            self._n_seeded += 1
        self.waiting.append(Request(uid, prompt, max_new_tokens, eos_id,
                                    temperature=temperature, top_k=top_k,
                                    top_p=top_p, min_p=min_p,
                                    repeat_penalty=repeat_penalty,
                                    presence_penalty=presence_penalty,
                                    frequency_penalty=frequency_penalty,
                                    stop_tokens=stop_tokens,
                                    logprobs=logprobs, seed=seed))
        return uid

    def pending(self) -> int:
        return len(self.waiting) + sum(r is not None for r in self.slots)

    def warmup(self):
        """Pre-compile every serving program so no request pays jit cost.

        Through the remote-TPU tunnel a full-model compile is tens of
        seconds; with the prompt-prefix cache on, the FIRST hit used to
        trigger three of them at admission time (_insert_prefix, the
        shorter remainder-prefill bucket, _extract_prefix at store time),
        which is exactly the measured 17 s TTFT regression of round 4
        (bench_artifacts: serve_cache vs serve_nocache).  Warm outputs are
        discarded; the cache is reset (pos=0 masks any scratch writes) and
        the seeded-decode step counter is not advanced, so a warmed engine
        produces the same token streams as a cold one.
        """
        if self._step_fns is not None:
            # mesh engines: step_fns are compiled by their builders
            return
        from tmac_tpu.utils import round_up
        # 1) every prefill bucket (covers remainder prefills after a
        #    prefix-cache hit, which start mid-prompt in a short bucket)
        for b in self.buckets:
            toks = jnp.zeros((1, b), jnp.int32)
            _, self.cache = _prefill_slot(
                self.params, self.cfg, toks, jnp.int32(1), self.cache,
                jnp.int32(0), jnp.int32(0), impl=self.impl, bucket=b)
        # 2) the decode chunk (base size; growth recompiles are opt-in)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            self._decode_base_key, jnp.arange(self.chunk))
        r = _decode_chunk(
            self.params, self.cfg, jnp.asarray(self.last_tokens),
            self.cache, keys, jnp.zeros((self.B,), bool), steps=self.chunk,
            sampler=self.sampler, impl=self.impl,
            eos_ids=jnp.full((self.B,), -1, jnp.int32),
            remaining=jnp.zeros((self.B,), jnp.int32))
        self.cache = r[1]
        # 3) first-token sampling after prefill
        sample(jnp.zeros((1, self.cfg.vocab_size), jnp.float32),
               jax.random.PRNGKey(0), self.sampler)
        # 4) prefix-cache extract/insert at every 128-aligned store size
        if self.prefix_cache_size:
            ml = self.cache.max_len
            cap = min(self.prefix_cache_max_len, ml)
            pbs = sorted({min(round_up(n, 128), ml)
                          for n in range(128, cap + 1, 128)}
                         | {min(128, ml)})
            c = self.cache
            for pb in pbs:
                pk, pv, pks, pvs = _extract_prefix(
                    c.k, c.v, jnp.int32(0), pb, ks=c.k_scale, vs=c.v_scale)
                k, v, ks, vs = _insert_prefix(
                    c.k, c.v, pk, pv, jnp.int32(0), ks=c.k_scale,
                    vs=c.v_scale, pks=pks, pvs=pvs)
                c = KVCache(k=k, v=v, pos=c.pos, k_scale=ks, v_scale=vs)
            self.cache = c
        # discard warm state: zero pos masks every scratch write above
        jax.block_until_ready(self.cache.k)
        self.cache = KVCache(k=self.cache.k, v=self.cache.v,
                             pos=jnp.zeros((self.B,), jnp.int32),
                             k_scale=self.cache.k_scale,
                             v_scale=self.cache.v_scale)

    def run(self) -> Dict[int, List[int]]:
        """Drain all submitted requests; returns {uid: generated tokens}."""
        while self.pending():
            self.step()
        out = {uid: r.output for uid, r in self.finished.items()}
        return out

    # ------------------------------------------------------------ internals
    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds max bucket {self.buckets[-1]}")

    def _admit(self):
        """Assign waiting requests to free slots (no prefill work here --
        prefill advances chunk-by-chunk in step(), interleaved with decode,
        so a long admission cannot stall running slots)."""
        for slot in range(self.B):
            if not self.waiting:
                return
            if self.slots[slot] is not None:
                continue
            req = self.waiting.popleft()
            req.prefill_t0 = time.perf_counter()
            self.slots[slot] = req
            s = self.sampler
            self._slot_temp[slot] = (s.temperature if req.temperature is None
                                     else req.temperature)
            self._slot_topk[slot] = s.top_k if req.top_k is None else req.top_k
            self._slot_topp[slot] = s.top_p if req.top_p is None else req.top_p
            self._slot_minp[slot] = (s.min_p if req.min_p is None
                                     else req.min_p)
            self._slot_rp[slot] = (s.repeat_penalty if req.repeat_penalty
                                   is None else req.repeat_penalty)
            self._slot_pp[slot] = (s.presence_penalty if req.presence_penalty
                                   is None else req.presence_penalty)
            self._slot_fp[slot] = (s.frequency_penalty
                                   if req.frequency_penalty is None
                                   else req.frequency_penalty)
            # per-slot PRNG base: a seeded request's chain is a pure
            # function of its seed; unseeded slots draw a fresh base from
            # the engine key (used only while a seeded request is live)
            self._slot_key[slot] = np.asarray(
                jax.random.PRNGKey(req.seed) if req.seed is not None
                else self._next_key())
            if (self._slot_rp[slot] != 1.0 or self._slot_pp[slot] != 0.0
                    or self._slot_fp[slot] != 0.0) and self._counts is None:
                self._counts = jnp.zeros((self.B, self.cfg.vocab_size),
                                         jnp.int32)
            if self._counts is not None:  # fresh request: clear its row
                self._counts = self._counts.at[slot].set(0)
            if self.prefix_cache_size:
                self._apply_prefix(slot, req)

    # --------------------------------------------------- prompt-prefix cache
    def _apply_prefix(self, slot: int, req: Request):
        """Longest-common-prefix lookup at admission: copy the best stored
        KV block into the slot and start prefill at the match point.  At
        least one prompt token always remains to prefill (the last-token
        logits seed the first sample)."""
        best_key, best_m = None, 0
        for key, entry in self._prefixes.items():
            m = 0
            for a, b in zip(entry.tokens, req.prompt):
                if a != b:
                    break
                m += 1
            m = min(m, req.prompt_len - 1)
            if m > best_m:
                best_key, best_m = key, m
        if best_key is None or best_m < self.prefix_cache_min_reuse:
            return
        self._prefixes.move_to_end(best_key)
        entry = self._prefixes[best_key]
        c = self.cache
        k, v, ks, vs = _insert_prefix(c.k, c.v, entry.k, entry.v,
                                      jnp.int32(slot), ks=c.k_scale,
                                      vs=c.v_scale, pks=entry.ks,
                                      pvs=entry.vs)
        self.cache = KVCache(k=k, v=v, pos=c.pos, k_scale=ks, v_scale=vs)
        req.prefill_off = best_m
        self.stats["prefix_hits"] += 1
        self.stats["prefix_tokens_reused"] += best_m

    def _store_prefix(self, slot: int, req: Request):
        """Snapshot the freshly prefilled prompt's KV (capped at
        prefix_cache_max_len positions) into the LRU."""
        n = min(req.prompt_len, self.prefix_cache_max_len, self.S)
        if n <= self.prefix_cache_min_reuse:
            return
        key = tuple(req.prompt[:n])
        if key in self._prefixes:
            self._prefixes.move_to_end(key)
            return
        from tmac_tpu.utils import round_up
        pb = min(round_up(n, 128), self.cache.max_len)
        k, v, ks, vs = _extract_prefix(self.cache.k, self.cache.v,
                                       jnp.int32(slot), pb,
                                       ks=self.cache.k_scale,
                                       vs=self.cache.v_scale)
        self._prefixes[key] = _PrefixEntry(tokens=key, k=k, v=v, ks=ks, vs=vs)
        while len(self._prefixes) > self.prefix_cache_size:
            self._prefixes.popitem(last=False)

    def _prefill_one_chunk(self, slot: int, req: Request):
        """Advance one prefill chunk for the request in `slot`."""
        off = req.prefill_off
        n = min(self.prefill_chunk, req.prompt_len - off)
        bucket = self._bucket(n)
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = req.prompt[off:off + n]
        if self._step_fns is not None:
            last, self.cache = self._step_fns[0](
                self.params, jnp.asarray(toks), jnp.int32(n),
                self.cache, jnp.int32(slot), jnp.int32(off))
        else:
            last, self.cache = _prefill_slot(
                self.params, self.cfg, jnp.asarray(toks),
                jnp.int32(n), self.cache, jnp.int32(slot),
                jnp.int32(off), impl=self.impl, bucket=bucket)
        req.prefill_off = off + n
        req.last_logits = last
        if not req.prefilling:  # prompt fully ingested -> first token
            if self.prefix_cache_size:
                self._store_prefix(slot, req)
            # seeded mode: the first token is sample index 0 of the slot's
            # key chain (decode chunks continue at index len(output))
            k = (jax.random.fold_in(jnp.asarray(self._slot_key[slot]), 0)
                 if self._n_seeded else self._next_key())
            if self._dynamic_sampling:
                st = SamplerState.make(self._slot_temp[slot:slot + 1],
                                       self._slot_topk[slot:slot + 1],
                                       self._slot_topp[slot:slot + 1],
                                       self._slot_rp[slot:slot + 1],
                                       self._slot_pp[slot:slot + 1],
                                       self._slot_fp[slot:slot + 1],
                                       self._slot_minp[slot:slot + 1])
                first = int(sample_state(last[None], k, st)[0])
            else:
                first = int(sample(last[None], k, self.sampler)[0])
            if req.logprobs:
                lp, ti, tv = _logprobs_of(last, jnp.int32(first),
                                          self.logprobs_k)
                req.logprobs_out.append(
                    _lp_rec(lp, np.asarray(ti), np.asarray(tv),
                            req.logprobs))
            req.last_logits = None
            req.output.append(first)
            if self._counts is not None:
                self._counts = self._counts.at[slot, first].add(1)
            self.stats["prefills"] += 1
            self.stats["prefill_tokens"] += req.prompt_len
            self.stats["prefill_s"] += time.perf_counter() - req.prefill_t0
            if self._finished_after_append(req):
                self._finish(slot=slot, req=req)
                return
            self.last_tokens[slot] = first
            if self.stream_cb:
                self.stream_cb(req.uid, list(req.output), False)

    def _spec_fits(self) -> bool:
        req = self.slots[0]
        hist_len = req.prompt_len + len(req.output)
        return hist_len + self.chunk + self.spec_k + 1 <= self.S

    def _decode_chunk_speculative(self):
        """Single-slot greedy decode chunk via on-device lookup
        speculation (see runtime/speculative.py).  Invariant on entry:
        cache.pos == history_len - 1 (the last emitted token's K/V is
        written by the next forward), which is exactly the engine's
        decode-phase state."""
        import jax.numpy as jnp

        from tmac_tpu.runtime.speculative import decode_chunk_speculative

        req = self.slots[0]
        hist_len = req.prompt_len + len(req.output)
        hist = np.zeros((1, self.S), np.int32)
        hist[0, :hist_len] = req.prompt + req.output
        t0 = time.perf_counter()
        toks, emitted, nf, self.cache = decode_chunk_speculative(
            self.params, self.cfg, jnp.asarray(hist), hist_len, self.cache,
            steps=self.chunk + 1, ngram=self.spec_ngram, k=self.spec_k,
            impl=self.impl)
        n_new = int(emitted) - 1
        new = np.asarray(toks)[0, 1:1 + n_new]
        self.stats["chunks"] += 1
        self.stats["spec_forwards"] = self.stats.get("spec_forwards", 0) + int(nf)
        self.stats["decode_s"] += time.perf_counter() - t0
        for t in new:
            req.output.append(int(t))
            self.stats["decode_tokens"] += 1
            if self._finished_after_append(req):
                break
        if req.output:  # stop truncation can empty a 1-token output
            self.last_tokens[0] = req.output[-1]
        if self._finished_after_append(req):
            self._finish(0, req)
        elif self.stream_cb:
            self.stream_cb(req.uid, list(req.output), False)

    def _finished_after_append(self, req: Request) -> bool:
        """Host-side finish check after each appended token.  Records WHY in
        req.finish_reason and, on a stop_tokens match, TRUNCATES the matched
        sequence off the output (llama.cpp stop semantics).  Idempotent: a
        request that already finished stays finished (callers re-check after
        their append loop; the truncation must not run twice)."""
        if req.finish_reason:
            return True
        if req.eos_id is not None and req.output and req.output[-1] == req.eos_id:
            req.finish_reason = "eos"
            return True
        for s in req.stop_tokens or ():
            if len(req.output) >= len(s) and req.output[-len(s):] == s:
                del req.output[-len(s):]
                req.finish_reason = "stop"
                return True
        if len(req.output) >= req.max_new_tokens:
            req.finish_reason = "length"
            return True
        if req.prompt_len + len(req.output) >= self.S:
            req.finish_reason = "length"
            return True
        return False

    @property
    def _dynamic_sampling(self) -> bool:
        return self._n_dynamic > 0

    def _req_has_overrides(self, req: Request) -> bool:
        return any(v is not None for v in (
            req.temperature, req.top_k, req.top_p, req.min_p,
            req.repeat_penalty, req.presence_penalty,
            req.frequency_penalty))

    def _drop_dynamic(self, req: Request):
        if self._req_has_overrides(req):
            self._n_dynamic -= 1
        if req.logprobs:
            self._n_logprobs -= 1
            req.logprobs = 0  # idempotent (cancel after finish, etc.)
        if req.seed is not None:
            self._n_seeded -= 1
            req.seed = None

    def _finish(self, slot: Optional[int], req: Request):
        req.done = True
        # a stop_tokens truncation shortens output after its logprob
        # records were appended -- keep the two aligned
        if req.logprobs_out:
            del req.logprobs_out[len(req.output):]
        self._drop_dynamic(req)
        self.finished[req.uid] = req
        self.stats["requests_finished"] += 1
        if self.stream_cb:
            self.stream_cb(req.uid, req.output, True)
        if slot is not None:
            self._release_slot(slot)

    def _release_slot(self, slot: int):
        """Free a slot (shared by _finish and cancel): neutralize its
        penalty params and release the counts buffer once no occupied
        slot is penalized, so the speculative fast path and the
        penalty-free decode chunk come back after penalized requests
        drain."""
        self.slots[slot] = None
        if self._counts is not None:
            self._slot_rp[slot] = self.sampler.repeat_penalty
            self._slot_pp[slot] = self.sampler.presence_penalty
            self._slot_fp[slot] = self.sampler.frequency_penalty
            if not self.sampler.has_penalties and not any(
                    r is not None and (
                        self._slot_rp[i] != 1.0
                        or self._slot_pp[i] != 0.0
                        or self._slot_fp[i] != 0.0)
                    for i, r in enumerate(self.slots)):
                self._counts = None

    def request(self, uid: int) -> Optional[Request]:
        """Look up a request by uid wherever it lives (waiting queue,
        active slot, or finished map); None if unknown.  Used by serving
        layers that need live per-request state (e.g. logprob records
        before cancelling a streamed request)."""
        for r in self.waiting:
            if r.uid == uid:
                return r
        for r in self.slots:
            if r is not None and r.uid == uid:
                return r
        return self.finished.get(uid)

    def cancel(self, uid: int) -> bool:
        """Abort a request: drop it from the wait queue or free its slot.
        Already-finished requests are discarded from `finished`.  Returns
        True if the uid was found.  No stream_cb is invoked."""
        for i, r in enumerate(self.waiting):
            if r.uid == uid:
                del self.waiting[i]
                self._drop_dynamic(r)
                return True
        for slot, r in enumerate(self.slots):
            if r is not None and r.uid == uid:
                self._release_slot(slot)  # shared with _finish: penalty
                self._drop_dynamic(r)     # params + counts cleanup too
                return True
        return self.finished.pop(uid, None) is not None

    def _pick_chunk(self, active_np, rem_np) -> int:
        """Decode-chunk size for this tick (see max_decode_chunk in
        __init__).  Growth conditions: nothing waiting to be admitted, no
        slot mid-prefill, and no active request with token-level stop
        sequences (those match host-side at chunk granularity, so a big
        chunk would overrun the stop point)."""
        c = self.chunk
        if self.max_chunk <= c or self.waiting:
            return c
        for i, r in enumerate(self.slots):
            if r is None:
                continue
            if r.prefilling or (active_np[i] and r.stop_tokens):
                return c
        lo = int(rem_np[active_np].min())
        while c * 2 <= self.max_chunk and c * 2 <= lo:
            c *= 2
        return c

    def step(self):
        """One scheduling tick: admit waiting requests to slots, advance at
        most `prefill_budget` prefill chunks, then decode a chunk for every
        slot in the decode phase.  Interleaving prefill with decode bounds
        the stall a long admission imposes on running slots to one prefill
        chunk per decode chunk (the reference has no scheduler at all --
        llama.cpp runs one request start-to-finish)."""
        self._admit()
        # advance prefills, round-robin across prefilling slots
        budget = self.prefill_budget
        order = [(self._pf_rr + i) % self.B for i in range(self.B)]
        for slot in order:
            if budget == 0:
                break
            req = self.slots[slot]
            if req is not None and req.prefilling:
                self._prefill_one_chunk(slot, req)
                self._pf_rr = (slot + 1) % self.B
                budget -= 1
        active_np = np.array([
            r is not None and not r.prefilling and len(r.output) > 0
            for r in self.slots], dtype=bool)
        if not active_np.any():
            return
        # device-side finish conditions: per-slot eos ids (-1 = none) and
        # remaining token budget -- slots freeze mid-chunk and the on-device
        # loop exits early when everyone is done (see _decode_chunk_body)
        eos_np = np.array([
            r.eos_id if (r is not None and r.eos_id is not None) else -1
            for r in self.slots], dtype=np.int32)
        rem_np = np.array([
            max(r.max_new_tokens - len(r.output), 0)
            if (r is not None and active_np[i]) else 0
            for i, r in enumerate(self.slots)], dtype=np.int32)
        state = None
        if self._dynamic_sampling:
            state = SamplerState.make(self._slot_temp, self._slot_topk,
                                      self._slot_topp, self._slot_rp,
                                      self._slot_pp, self._slot_fp,
                                      self._slot_minp)
        if (self.speculative and self._slot_temp[0] <= 0.0
                and self._counts is None and self._n_logprobs == 0
                and self._spec_fits()):
            return self._decode_chunk_speculative()
        t0 = time.perf_counter()
        chunk = self._pick_chunk(active_np, rem_np)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            self._decode_base_key,
            jnp.arange(self._decode_step_no, self._decode_step_no + chunk))
        self._decode_step_no += chunk
        lpk = self.logprobs_k if self._n_logprobs else 0
        lps = None
        sk = ko = None
        if self._n_seeded and self._step_fns is None:
            sk = jnp.asarray(self._slot_key)
            ko = jnp.asarray(np.array(
                [len(r.output) if r is not None else 0
                 for r in self.slots], np.int32))
        if self._step_fns is not None:
            r = self._step_fns[1](
                self.params, jnp.asarray(self.last_tokens), self.cache,
                keys, jnp.asarray(active_np), jnp.asarray(eos_np),
                jnp.asarray(rem_np), state, self._counts)
            if self._counts is not None:
                toks, self.cache, self._counts = r
            else:
                toks, self.cache = r
        else:
            r = _decode_chunk(
                self.params, self.cfg, jnp.asarray(self.last_tokens), self.cache,
                keys, jnp.asarray(active_np), steps=chunk,
                sampler=self.sampler, impl=self.impl,
                eos_ids=jnp.asarray(eos_np), remaining=jnp.asarray(rem_np),
                state=state, counts=self._counts, logprobs_k=lpk,
                slot_keys=sk, key_offsets=ko)
            r = list(r)
            if lpk:
                lps = tuple(np.asarray(a) for a in r.pop())
            if self._counts is not None:
                toks, self.cache, self._counts = r
            else:
                toks, self.cache = r
        toks = np.asarray(toks)  # (B, chunk) -- the one host sync per chunk
        self.stats["chunks"] += 1
        self.stats["decode_s"] += time.perf_counter() - t0
        for slot, req in enumerate(self.slots):
            if req is None or not active_np[slot]:
                continue  # empty, still prefilling, or no first token yet
            for j, t in enumerate(toks[slot]):
                req.output.append(int(t))
                if lps is not None and req.logprobs:
                    req.logprobs_out.append(
                        _lp_rec(lps[0][slot, j], lps[1][slot, j],
                                lps[2][slot, j], req.logprobs))
                self.stats["decode_tokens"] += 1
                if self._finished_after_append(req):
                    break
            if req.output:  # stop truncation can empty a 1-token output
                self.last_tokens[slot] = req.output[-1]
            if req.done or self._finished_after_append(req):
                self._finish(slot, req)
            elif self.stream_cb:
                self.stream_cb(req.uid, list(req.output), False)
