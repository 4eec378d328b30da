"""Tensor/data parallelism over a jax.sharding.Mesh.

The reference parallelizes one way: M-tiles of each GEMM are split across
CPU threads (tmac_gemm_wrapper.h:197-228, n_tile_num in kcfg).  Here the
same split becomes Megatron-style tensor parallelism across TPU chips:

  * column-parallel (shard M over 'tp'):  wq, wk, wv, gate, up
    -- heads and MLP intermediate live entirely on one chip
  * row-parallel (shard K over 'tp'):     wo, down
    -- packed with k_shards=tp so each device's packed-row slice IS the
       local packing of its K-chunk (ops/packing.py shard locality)
  * psum over ICI after wo and down (2 collectives per layer)
  * KV cache sharded over kv-heads; batch sharded over 'dp'

Everything runs inside one shard_map so the Pallas kernels see local
shards; XLA overlaps the psums with the next layer's compute.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmac_tpu.models.config import ModelConfig
from tmac_tpu.models.llama import KVCache, forward
from tmac_tpu.ops.qgemm import QuantizedTensor
from tmac_tpu.runtime.sampling import SamplerConfig, sample

try:  # jax >= 0.7 exports shard_map at top level
    from jax import shard_map as _shard_map_mod  # type: ignore  # noqa

    def shard_map(f, mesh, in_specs, out_specs):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
except (ImportError, AttributeError):  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm

    def shard_map(f, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


COL = P(None, "tp")   # shard M (output features)
ROW = P("tp", None)   # shard K (packed rows / scale groups)
REP = P()


def make_mesh(tp: int, dp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, (len(devices), dp, tp)
    return jax.make_mesh((dp, tp), ("dp", "tp"), devices=devices[: dp * tp])


def check_cfg(cfg: ModelConfig, tp: int):
    assert cfg.num_heads % tp == 0, "tp must divide num_heads"
    assert cfg.num_kv_heads % tp == 0, "tp must divide num_kv_heads"
    assert cfg.q_dim % tp == 0 and cfg.kv_dim % tp == 0
    assert cfg.hidden_size % tp == 0
    gs = cfg.quant.group_size
    if gs != -1:
        # row-parallel wo: scale groups must not straddle shard boundaries
        assert (cfg.q_dim // tp) % gs == 0, (
            f"q_dim/tp ({cfg.q_dim}/{tp}) must be a multiple of group_size {gs}")
        if cfg.num_experts > 0 and tp > 1:
            # row-parallel experts_down: same rule for the expert FFN width
            assert (cfg.moe_intermediate_size // tp) % gs == 0, (
                f"moe_intermediate/tp ({cfg.moe_intermediate_size}/{tp}) "
                f"must be a multiple of group_size {gs}")


def local_cfg(cfg: ModelConfig, tp: int) -> ModelConfig:
    """The per-device model config under tp-way tensor parallelism."""
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
        moe_intermediate_size=cfg.moe_intermediate_size // tp,
        moe_shared_intermediate_size=cfg.moe_shared_intermediate_size // tp,
    )


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree (prefix form) matching an init_params pytree."""
    def layer_spec(layer):
        s = {"attn_norm": REP, "mlp_norm": REP, "wqkv": COL, "wo": ROW}
        if "experts_gate_up" in layer:
            # MoE: stacked expert weights carry a leading E axis.  Under a
            # tp-only mesh the experts replicate along E and tp-shard
            # internally exactly like the dense MLP (parallel/ep.py adds
            # the 'ep' leading-axis sharding on its own mesh).
            s["moe_router"] = REP
            s["experts_gate_up"] = P(None, None, "tp")
            s["experts_down"] = P(None, "tp", None)
            if "shared_gate_up" in layer:
                s["shared_gate_up"] = COL
                s["shared_down"] = ROW
            if "shared_gate" in layer:
                s["shared_gate"] = REP
        else:
            s["gate_up"] = COL
            s["down"] = ROW
        for b in ("bq", "bk", "bv"):
            if b in layer:
                s[b] = P("tp")
        return s

    specs = {
        "embed": REP,
        "layers": [layer_spec(l) for l in params["layers"]],
        "final_norm": REP,
    }
    if "lm_head" in params:
        specs["lm_head"] = REP
    return specs


def cache_specs(kv_quant: bool = False) -> KVCache:
    # cache layout (L, B, KV, S, D): kv-heads on 'tp', batch on 'dp';
    # int8-cache scales (L, B, KV, S) shard identically minus head_dim
    kv = P(None, "dp", "tp", None, None)
    sc = P(None, "dp", "tp", None) if kv_quant else None
    return KVCache(k=kv, v=kv, pos=P("dp"), k_scale=sc, v_scale=sc)


def _localize_params(params, tp: int):
    """Fix up QuantizedTensor static meta for the local view (arrays inside
    shard_map are already the local slices)."""
    if tp == 1:
        return params

    def fix_layer(layer):
        out = dict(layer)
        for name in ("wqkv", "gate_up", "experts_gate_up", "shared_gate_up"):
            if name in layer:
                out[name] = layer[name].localized(tp, axis=1)
        for name in ("wo", "down", "experts_down", "shared_down"):
            if name in layer:
                out[name] = layer[name].localized(tp, axis=0)
        return out

    return {**params, "layers": [fix_layer(l) for l in params["layers"]]}


def shard_params(params, mesh: Mesh, specs=None):
    """device_put the param pytree according to param_specs (or an explicit
    spec pytree, e.g. parallel/ep.py's expert-sharded one)."""
    if specs is None:
        specs = param_specs(params)

    def put(tree, spec):
        if isinstance(tree, QuantizedTensor):
            return jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(mesh, spec)), tree)
        if isinstance(tree, dict):
            return {k: put(v, spec[k] if isinstance(spec, dict) else spec)
                    for k, v in tree.items()}
        if isinstance(tree, list):
            return [put(v, s) for v, s in zip(tree, spec)]
        return jax.device_put(tree, NamedSharding(mesh, spec))

    return put(params, specs)


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    cs = cache_specs(kv_quant=cache.quantized)
    put = lambda a, sp: (jax.device_put(a, NamedSharding(mesh, sp))
                         if a is not None else None)
    return KVCache(
        k=put(cache.k, cs.k), v=put(cache.v, cs.v),
        pos=put(cache.pos, cs.pos),
        k_scale=put(cache.k_scale, cs.k_scale),
        v_scale=put(cache.v_scale, cs.v_scale),
    )


def make_engine_fns(cfg: ModelConfig, mesh: Mesh,
                    sampler: SamplerConfig = SamplerConfig(),
                    impl: str = "auto", kv_quant: bool = False):
    """(prefill_fn, decode_fn) for runtime/engine.InferenceEngine over a
    dp x tp mesh.

    tp shards every layer Megatron-style; dp > 1 shards the BATCH SLOTS:
    each dp group owns max_batch/dp contiguous slots of the KV cache and
    decodes them locally (no cross-group traffic in decode).  Slot prefill
    is addressed globally -- every group runs the (cheap, off-critical-
    path) prefill but only the owning group commits the cache update; the
    resulting logits are broadcast with one psum over 'dp'.

    Usage:
        mesh = make_mesh(tp=2, dp=2)
        sparams = shard_params(params, mesh)
        cache = shard_cache(KVCache.create(cfg, B, S), mesh)  # B % dp == 0
        eng = InferenceEngine(cfg, sparams, max_batch=B, max_len=S,
                              step_fns=make_engine_fns(cfg, mesh),
                              cache=cache)
    """
    from tmac_tpu.runtime.engine import _decode_chunk_body, _prefill_slot_body

    tp = mesh.shape["tp"]
    dp = mesh.shape.get("dp", 1)
    check_cfg(cfg, tp)
    lcfg = local_cfg(cfg, tp)
    cspecs = cache_specs(kv_quant=kv_quant)

    def _fwd(params):
        return lambda t, c, active=None, valid=None: forward(
            params, lcfg, t, c, impl=impl,
            tp_axis="tp" if tp > 1 else None, active=active, valid=valid)

    def _prefill(params, tokens, true_len, cache, slot, start_pos):
        params = _localize_params(params, tp)
        if dp == 1:
            return _prefill_slot_body(_fwd(params), tokens, true_len, cache,
                                      slot, start_pos)
        bl = cache.k.shape[1]  # local slots per dp group
        grp = jax.lax.axis_index("dp")
        ls = slot - grp * bl
        owner = (ls >= 0) & (ls < bl)

        # lax.cond, not jnp.where-over-the-cache: non-owner groups skip
        # the prefill compute AND the whole-cache select/copy (the where
        # form materialized a full local-cache rewrite in HBM per chunk).
        # Safe under collectives: owner is a function of the dp index
        # only, so every device in a dp group takes the same branch and
        # the in-branch 'tp' psums stay consistent; the 'dp' psum below
        # is outside the cond.
        def _run(c):
            return _prefill_slot_body(_fwd(params), tokens, true_len, c,
                                      jnp.clip(ls, 0, bl - 1), start_pos)

        def _skip(c):
            return jnp.zeros((cfg.vocab_size,), jnp.float32), c

        last, cache = jax.lax.cond(owner, _run, _skip, cache)
        # broadcast the owner's last-token logits to every group
        last = jax.lax.psum(last, "dp")
        return last, cache

    def _decode(params, last, cache, keys, active, eos_ids, remaining,
                state=None, counts=None):
        params = _localize_params(params, tp)
        if dp > 1:
            # decorrelate sampling across dp groups: keys arrive replicated
            # while the batch is dp-sharded, so without this slot i of every
            # group would draw identical gumbel noise each step
            grp = jax.lax.axis_index("dp")
            keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, grp)
        r = _decode_chunk_body(_fwd(params), sampler, last, cache, keys,
                               active, eos_ids=eos_ids,
                               remaining=remaining, state=state,
                               counts=counts)
        if dp > 1:
            # replicate the (tiny, int32) token output across dp groups:
            # the engine host loop reads it every chunk, and under
            # multi-PROCESS dp a dp-sharded array is not fully addressable
            # from any one process (each host owns only its groups' slots)
            r = (jax.lax.all_gather(r[0], "dp", axis=0, tiled=True),) + r[1:]
        return r

    return _lazy_engine_wrappers(
        mesh, param_specs, cspecs, _prefill, _decode,
        b_spec=P("dp") if dp > 1 else REP)


def _lazy_engine_wrappers(mesh, specs_fn, cspecs, _prefill, _decode,
                          b_spec=REP):
    """Shared (prefill_fn, decode_fn) plumbing for mesh engine fns
    (make_engine_fns here, parallel/ep.make_moe_engine_fns): shard_maps
    built lazily on first call (the param-spec pytree needs the params),
    decode keyed by whether a per-slot SamplerState rides along, with
    eos/remaining defaults filled.  b_spec: how per-slot (B,) vectors
    shard (P('dp') when the batch is dp-sharded, replicated otherwise)."""
    _prefill_sm = None
    _decode_sms = {}

    def prefill_fn(params, tokens, true_len, cache, slot, start_pos):
        nonlocal _prefill_sm
        if _prefill_sm is None:
            pspecs = specs_fn(params)
            _prefill_sm = jax.jit(shard_map(
                _prefill, mesh,
                in_specs=(pspecs, REP, REP, cspecs, REP, REP),
                out_specs=(REP, cspecs)))
        return _prefill_sm(params, tokens, true_len, cache, slot, start_pos)

    def decode_fn(params, last, cache, keys, active, eos_ids=None,
                  remaining=None, state=None, counts=None):
        B = int(last.shape[0])
        if eos_ids is None:
            eos_ids = jnp.full((B,), -1, jnp.int32)
        if remaining is None:
            remaining = jnp.full((B,), keys.shape[0], jnp.int32)
        key_sm = (state is not None, counts is not None)
        if key_sm not in _decode_sms:
            pspecs = specs_fn(params)
            st_spec = jax.tree.map(lambda _: b_spec, state) \
                if key_sm[0] else None
            # counts (B, V): batch rows shard with the batch
            cnt_spec = (P(*(b_spec + (None,))) if b_spec != REP else REP) \
                if key_sm[1] else None
            in_specs = (pspecs, b_spec, cspecs, REP, b_spec, b_spec,
                        b_spec, st_spec)
            out_specs = (REP, cspecs)
            if key_sm[1]:
                in_specs = in_specs + (cnt_spec,)
                out_specs = out_specs + (cnt_spec,)
            _decode_sms[key_sm] = jax.jit(shard_map(
                _decode, mesh, in_specs=in_specs, out_specs=out_specs),
                donate_argnums=(2,))
        args = (params, last, cache, keys, active, eos_ids, remaining,
                state)
        if key_sm[1]:
            args = args + (counts,)
        return _decode_sms[key_sm](*args)

    return prefill_fn, decode_fn


def make_tp_step(cfg: ModelConfig, mesh: Mesh, params,
                 sampler: SamplerConfig = SamplerConfig(), impl: str = "auto",
                 kv_quant: bool = False):
    """Build (prefill_fn, decode_fn) jitted over the mesh.

    prefill_fn(params, tokens (B,T), cache) -> (last logits (B,V), cache)
    decode_fn(params, last (B,), cache, key, steps) -> (tokens (B,steps), cache)
    """
    tp = mesh.shape["tp"]
    check_cfg(cfg, tp)
    lcfg = local_cfg(cfg, tp)
    pspecs = param_specs(params)
    cspecs = cache_specs(kv_quant=kv_quant)

    def _prefill(params, tokens, cache):
        params = _localize_params(params, tp)
        logits, cache = forward(params, lcfg, tokens, cache, impl=impl,
                                tp_axis="tp" if tp > 1 else None)
        return logits[:, -1, :], cache

    def _decode(params, last, cache, keys):
        params = _localize_params(params, tp)

        def body(carry, k):
            tok, cache = carry
            logits, cache = forward(params, lcfg, tok[:, None], cache,
                                    impl=impl, tp_axis="tp" if tp > 1 else None)
            nxt = sample(logits[:, -1, :], k, sampler)
            return (nxt, cache), nxt

        (last, cache), toks = jax.lax.scan(body, (last, cache), keys)
        return jnp.moveaxis(toks, 0, 1), cache

    prefill_sm = shard_map(
        _prefill, mesh,
        in_specs=(pspecs, P("dp", None), cspecs),
        out_specs=(P("dp", None), cspecs),
    )
    decode_sm = shard_map(
        _decode, mesh,
        in_specs=(pspecs, P("dp"), cspecs, REP),
        out_specs=(P("dp", None), cspecs),
    )

    prefill_jit = jax.jit(prefill_sm, donate_argnums=(2,))
    decode_jit = jax.jit(decode_sm, donate_argnums=(2,))

    def decode_fn(params, last, cache, key, steps: int):
        keys = jax.random.split(key, steps)
        return decode_jit(params, last, cache, keys)

    return prefill_jit, decode_fn
