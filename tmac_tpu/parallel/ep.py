"""Expert parallelism: MoE expert stacks sharded over an 'ep' mesh axis.

The reference has no MoE (and therefore no EP); this is the natural TPU
extension of its M-tile work splitting to the expert dimension.  Design
(see models/moe.py for the routing math):

  * expert weights are STACKED QuantizedTensors with a leading E axis
    (models/moe.stack_experts), so EP is a plain PartitionSpec
    P('ep', ...) -- each device holds E/ep experts;
  * tokens and attention replicate over 'ep' (the MoE MLP dominates the
    weight bytes and FLOPs: Mixtral-8x7B is ~87% expert weights), and
    each device runs only its local experts on the token block;
  * ONE psum over ('ep',) -- or ('ep','tp') when experts also tp-shard
    internally -- merges the weighted expert partials per MoE layer.
    Linearity of the top-k combine makes this exact; there is no
    all-to-all and no cross-device capacity coupling;
  * composes with tensor parallelism on a 2-D ('ep','tp') mesh: attention
    shards Megatron-style over 'tp' (parallel/tp.py) while each expert's
    gate_up/down also shard over 'tp' inside its 'ep' group.

Memory: weights scale 1/ep per device (the capacity axis for Mixtral-size
MoE); the KV cache replicates over 'ep' (shard it over 'tp' kv-heads or
stage layers over 'pp' when the cache is the binding constraint).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tmac_tpu.models.config import ModelConfig
from tmac_tpu.models.llama import KVCache, forward
from tmac_tpu.parallel.tp import (REP, _localize_params, check_cfg,
                                  local_cfg, shard_map, shard_params)
from tmac_tpu.runtime.sampling import SamplerConfig, sample


def make_moe_mesh(ep: int, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= ep * tp, (len(devices), ep, tp)
    return jax.make_mesh((ep, tp), ("ep", "tp"), devices=devices[: ep * tp])


def check_moe_cfg(cfg: ModelConfig, ep: int, tp: int = 1):
    assert cfg.num_experts > 0, "ep sharding needs an MoE model"
    assert cfg.num_experts % ep == 0, (cfg.num_experts, ep)
    check_cfg(cfg, tp)  # includes the MoE FFN-width group-size rule


def param_specs_moe(params) -> dict:
    """PartitionSpec pytree over the ('ep', 'tp') mesh: expert stacks shard
    their leading E axis over 'ep' AND tp-shard internally; attention
    shards over 'tp' exactly like parallel/tp.py; everything else
    replicates."""
    COL, ROW = P(None, "tp"), P("tp", None)

    def layer_spec(layer):
        s = {
            "attn_norm": REP, "mlp_norm": REP,
            "wqkv": COL, "wo": ROW,
            "moe_router": REP,
            "experts_gate_up": P("ep", None, "tp"),
            "experts_down": P("ep", "tp", None),
        }
        if "shared_gate_up" in layer:
            # shared expert: tp-sharded, replicated over ep (every device
            # computes it; moe_mlp pre-divides by the ep size so the joint
            # psum stays correct)
            s["shared_gate_up"] = COL
            s["shared_down"] = ROW
        if "shared_gate" in layer:
            s["shared_gate"] = REP
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


def cache_specs_moe() -> KVCache:
    # (L, B, KV, S, D): kv-heads over 'tp', replicated over 'ep'
    return KVCache(k=P(None, None, "tp", None, None),
                   v=P(None, None, "tp", None, None), pos=REP)


def shard_params_moe(params, mesh: Mesh):
    return shard_params(params, mesh, specs=param_specs_moe(params))


def shard_cache_moe(cache: KVCache, mesh: Mesh) -> KVCache:
    assert not cache.quantized, "int8 KV cache: supported on the tp/dp mesh path only (parallel/tp.py)"
    from jax.sharding import NamedSharding
    cs = cache_specs_moe()
    return KVCache(
        k=jax.device_put(cache.k, NamedSharding(mesh, cs.k)),
        v=jax.device_put(cache.v, NamedSharding(mesh, cs.v)),
        pos=jax.device_put(cache.pos, NamedSharding(mesh, cs.pos)),
    )


def make_moe_engine_fns(cfg: ModelConfig, mesh: Mesh,
                        sampler: SamplerConfig = SamplerConfig(),
                        impl: str = "auto"):
    """(prefill_fn, decode_fn) for runtime/engine.InferenceEngine over an
    ep x tp mesh -- continuous-batching MoE serving (the EP analog of
    parallel/tp.make_engine_fns; batch slots replicate over both axes,
    expert stacks shard over 'ep', attention Megatron-shards over 'tp').

    Usage:
        mesh = make_moe_mesh(ep=4, tp=2)
        sparams = shard_params_moe(params, mesh)
        cache = shard_cache_moe(KVCache.create(cfg, B, S), mesh)
        eng = InferenceEngine(cfg, sparams, max_batch=B, max_len=S,
                              step_fns=make_moe_engine_fns(cfg, mesh),
                              cache=cache)
    """
    from tmac_tpu.runtime.engine import _decode_chunk_body, _prefill_slot_body

    ep, tp = mesh.shape["ep"], mesh.shape.get("tp", 1)
    check_moe_cfg(cfg, ep, tp)
    lcfg = local_cfg(cfg, tp)
    cspecs = cache_specs_moe()
    tp_axis = "tp" if tp > 1 else None
    ep_axis = "ep" if ep > 1 else None

    def _fwd(params):
        return lambda t, c, active=None, valid=None: forward(
            params, lcfg, t, c, impl=impl, tp_axis=tp_axis, ep_axis=ep_axis,
            active=active, valid=valid)

    def _prefill(params, tokens, true_len, cache, slot, start_pos):
        params = _localize_params(params, tp)
        return _prefill_slot_body(_fwd(params), tokens, true_len, cache,
                                  slot, start_pos)

    def _decode(params, last, cache, keys, active, eos_ids, remaining,
                state=None, counts=None):
        params = _localize_params(params, tp)
        return _decode_chunk_body(_fwd(params), sampler, last, cache, keys,
                                  active, eos_ids=eos_ids,
                                  remaining=remaining, state=state,
                                  counts=counts)

    from tmac_tpu.parallel.tp import _lazy_engine_wrappers
    return _lazy_engine_wrappers(mesh, param_specs_moe, cspecs,
                                 _prefill, _decode)


def make_ep_step(cfg: ModelConfig, mesh: Mesh, params,
                 sampler: SamplerConfig = SamplerConfig(),
                 impl: str = "auto"):
    """(prefill_fn, decode_fn) jitted over the ('ep', 'tp') mesh --
    the MoE analog of parallel/tp.make_tp_step.

    prefill_fn(params, tokens (B,T), cache) -> (last logits (B,V), cache)
    decode_fn(params, last (B,), cache, key, steps) -> (tokens (B,steps), cache)
    """
    ep, tp = mesh.shape["ep"], mesh.shape.get("tp", 1)
    check_moe_cfg(cfg, ep, tp)
    lcfg = local_cfg(cfg, tp)
    pspecs = param_specs_moe(params)
    cspecs = cache_specs_moe()
    tp_axis = "tp" if tp > 1 else None
    ep_axis = "ep" if ep > 1 else None

    def _fwd(params, tokens, cache):
        params = _localize_params(params, tp)
        return forward(params, lcfg, tokens, cache, impl=impl,
                       tp_axis=tp_axis, ep_axis=ep_axis)

    def _prefill(params, tokens, cache):
        logits, cache = _fwd(params, tokens, cache)
        return logits[:, -1, :], cache

    def _decode(params, last, cache, keys):
        def body(carry, k):
            tok, cache = carry
            logits, cache = _fwd(params, tok[:, None], cache)
            nxt = sample(logits[:, -1, :], k, sampler)
            return (nxt, cache), nxt

        (last, cache), toks = jax.lax.scan(body, (last, cache), keys)
        return jnp.moveaxis(toks, 0, 1), cache

    prefill_jit = jax.jit(shard_map(
        _prefill, mesh,
        in_specs=(pspecs, REP, cspecs),
        out_specs=(REP, cspecs)), donate_argnums=(2,))
    decode_jit = jax.jit(shard_map(
        _decode, mesh,
        in_specs=(pspecs, REP, cspecs, REP),
        out_specs=(REP, cspecs)), donate_argnums=(2,))

    def decode_fn(params, last, cache, key, steps: int):
        keys = jax.random.split(key, steps)
        return decode_jit(params, last, cache, keys)

    return prefill_jit, decode_fn
