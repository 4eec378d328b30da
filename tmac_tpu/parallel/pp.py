"""Pipeline parallelism: shard LAYERS over chips.

Net-new beyond the reference (SURVEY.md section 2.4: the reference has no
PP of any kind).  The inference-PP value proposition on TPU is memory
capacity and topology reach: a model whose packed weights + KV cache
exceed one chip's HBM runs with layers split into `pp` stages, each chip
holding 1/pp of the layers AND 1/pp of the KV cache (the cache's layer
axis shards for free).  Composes conceptually with TP (stage-internal
sharding); this module implements the pure-PP axis.

Design (TPU-native, all inside one shard_map jit):

* **Sequence-chunk pipelined prefill** -- the prompt is cut into M
  chunks; chunk c flows stage 0 -> pp-1 while stage s-1 already works on
  chunk c+1 (the classic causal-transformer pipeline: earlier chunks'
  K/V are already in each stage's local cache when later chunks arrive).
  The steady-state keeps every stage busy; bubble = pp-1 steps of M+pp-1.
* **Boundary activations ride lax.ppermute** (one (B, Tc, H) tensor per
  step) -- XLA overlaps the permute with the next chunk's compute.
* **Every stage runs the same SPMD program** on (possibly not-yet-valid)
  data, masked by the chunk-validity predicate; no host control flow.
* **Decode** runs the single token through the stage chain (pp ppermute
  hops per token).  PP decode is a capacity feature, not a latency
  feature -- decode latency is ~unchanged (same total layer work, plus
  pp-1 tiny hops); use TP for latency, PP for fitting the model.

Stage-local params: `stack_params_pp` stacks each layer-param leaf along
a new leading stage axis, sharded P('pp'); inside shard_map each stage
slices its Lp = L/pp layers statically.  The KV cache keeps the stacked
(L, ...) layout and shards axis 0 over 'pp'.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmac_tpu.models.config import ModelConfig
from tmac_tpu.models.llama import (KVCache, QuantizedTensor, rms_norm,
                                   rope_tables)
from tmac_tpu.parallel.sp import (_chunked_causal_attention, layer_out_mlp,
                                  layer_qkv_rope)
from tmac_tpu.parallel.tp import REP, check_cfg, local_cfg, shard_map


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= pp
    return jax.make_mesh((pp,), ("pp",), devices=devices[:pp])


def make_pp_tp_mesh(pp: int, tp: int, devices=None) -> Mesh:
    """2-D ('pp', 'tp') mesh: tp minor so each stage's Megatron psums ride
    adjacent-device ICI; pp hops (1 activation tensor per chunk) cross the
    slower axis."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= pp * tp, (len(devices), pp, tp)
    return jax.make_mesh((pp, tp), ("pp", "tp"), devices=devices[: pp * tp])


def stack_params_pp(params: Dict[str, Any], pp: int, tp: int = 1):
    """init_params pytree -> (pp-stacked stage params, specs).

    Layer leaves become (pp, Lp, ...) arrays (stage-sharded on axis 0);
    embed/final_norm/lm_head stay replicated (embed is needed by stage 0,
    the head by the last stage; replication costs little vs layer
    weights and keeps the structure simple).
    """
    L = len(params["layers"])
    assert L % pp == 0, f"num_layers {L} must divide pp={pp}"
    assert "experts_gate_up" not in params["layers"][0], \
        "MoE models are not supported under pp (stack/shard experts " \
        "over 'ep' instead -- parallel/ep.py)"
    Lp = L // pp
    names = params["layers"][0].keys()
    stages = {}
    for n in names:
        leaves = [params["layers"][i][n] for i in range(L)]
        # stack (L, ...) then group (pp, Lp, ...)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs).reshape(
            (pp, Lp) + xs[0].shape), *leaves)
        stages[n] = stacked
    out = {k: v for k, v in params.items() if k != "layers"}
    out["stages"] = stages
    specs = {k: REP for k in out}
    if tp == 1:
        # prefix spec: every array leaf of a stage entry shards on axis 0
        specs["stages"] = {n: P("pp") for n in stages}
    else:
        # PP x TP: stage axis 0 on 'pp' plus Megatron sharding of the
        # weight axes.  Stacked QuantizedTensor leaves are all rank 4
        # (pp, Lp, rows, cols): column-parallel (wqkv/gate_up) shard the
        # last axis, row-parallel (wo/down) the packed-row/scale-group
        # axis -- the same per-leaf geometry as tp.param_specs shifted by
        # the two leading stage axes.  Pass tp-packed params
        # (init_params(..., tp=tp)) so k/m shard padding is aligned.
        COL4 = P("pp", None, None, "tp")
        ROW4 = P("pp", None, "tp", None)
        sp_map = {"attn_norm": P("pp"), "mlp_norm": P("pp"),
                  "wqkv": COL4, "gate_up": COL4, "wo": ROW4, "down": ROW4,
                  "bq": P("pp", None, "tp"), "bk": P("pp", None, "tp"),
                  "bv": P("pp", None, "tp")}
        specs["stages"] = {n: sp_map[n] for n in stages}
    return out, specs


def shard_params_pp(params_pp, specs, mesh: Mesh):
    def put(tree, spec):
        if isinstance(tree, dict):
            return {k: put(v, spec[k] if isinstance(spec, dict) else spec)
                    for k, v in tree.items()}
        return jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, spec)), tree)
    return put(params_pp, specs)


def shard_cache_pp(cache: KVCache, mesh: Mesh) -> KVCache:
    """Layer axis over 'pp' (each stage holds only its layers' cache);
    kv-heads additionally over 'tp' when the mesh composes with TP."""
    assert not cache.quantized, "int8 KV cache: supported on the tp/dp mesh path only (parallel/tp.py)"
    tp = mesh.shape.get("tp", 1)
    kv = NamedSharding(mesh, P("pp", None, "tp", None, None) if tp > 1
                       else P("pp"))
    return KVCache(k=jax.device_put(cache.k, kv),
                   v=jax.device_put(cache.v, kv),
                   pos=jax.device_put(cache.pos, NamedSharding(mesh, P())))


def _stage_layers(stages, Lp: int, tp: int = 1):
    """Slice the local (1, Lp, ...) stage stack into Lp per-layer dicts,
    fixing QuantizedTensor static meta for the local tp shard."""
    out = []
    for i in range(Lp):
        layer = {}
        for n, tree in stages.items():
            lt = jax.tree.map(lambda a: a[0, i], tree)
            if tp > 1 and isinstance(lt, QuantizedTensor):
                lt = lt.localized(tp, axis=0 if n in ("wo", "down") else 1)
            layer[n] = lt
        out.append(layer)
    return out


def _run_stage(layers, cfg: ModelConfig, x, k_loc, v_loc, q_positions,
               kv_len, impl: str, attn_chunk: int, tp_axis=None):
    """Run this stage's layers on x (B, Tc, H); k_loc/v_loc (Lp, B, KV,
    S, Dp) stage-local cache buffers.  Returns (x, k_loc, v_loc).

    tp_axis: stage-internal Megatron TP (cfg must then be the LOCAL
    per-tp-device config, layers the localized shards); wo/down psum over
    tp_axis before the residual add, K/V carry the local kv-head shard --
    same fold rule as models/llama.forward and parallel/sp.py."""
    B, Tc, _ = x.shape
    H, D, KV = cfg.num_heads, cfg.head_dim, cfg.num_kv_heads
    rep = H // KV
    Dp = k_loc.shape[-1]
    rope_cs = rope_tables(q_positions, D, cfg.rope_theta,
                          cfg.rope_scaling)
    start = q_positions[:, 0]  # (B,) -- per-row cache write positions

    for li, layer in enumerate(layers):
        q, k, v = layer_qkv_rope(layer, cfg, x, rope_cs, impl)

        kw = jnp.swapaxes(k, 1, 2)  # (B, KV, Tc, D)
        vw = jnp.swapaxes(v, 1, 2)
        if Dp != D:
            kw = jnp.pad(kw, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
            vw = jnp.pad(vw, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        # per-row writes: decode slots may sit at different positions
        for b in range(B):
            k_loc = jax.lax.dynamic_update_slice(
                k_loc, kw[b].astype(k_loc.dtype)[None, None],
                (li, b, 0, start[b], 0))
            v_loc = jax.lax.dynamic_update_slice(
                v_loc, vw[b].astype(v_loc.dtype)[None, None],
                (li, b, 0, start[b], 0))

        qr = q.reshape(B, Tc, KV, rep, D)
        attn = _chunked_causal_attention(
            qr, k_loc[li], v_loc[li], q_positions, kv_len=kv_len, D=D,
            chunk=attn_chunk, window=cfg.sliding_window).astype(x.dtype)
        x = layer_out_mlp(layer, cfg, x, attn, impl, tp_axis=tp_axis)
    return x, k_loc, v_loc


def make_pp_prefill(cfg: ModelConfig, mesh: Mesh, impl: str = "auto",
                    chunk: int = 0, attn_chunk: int = 512, specs=None):
    """Build prefill_fn(params_pp, tokens (B, T), cache) -> (last logits
    (B, V) f32, cache) with sequence-chunk pipelining over mesh axis
    'pp' (and stage-internal Megatron TP when the mesh has a 'tp' axis >
    1 -- pass the specs from stack_params_pp(..., tp=tp) and tp-packed
    params).  chunk: microbatch token length (default T/pp, min 1
    chunk).  T % chunk == 0.  Fresh prefill (cache.pos == 0)."""
    pp = mesh.shape["pp"]
    tp = mesh.shape.get("tp", 1)
    tp_axis = "tp" if tp > 1 else None
    if tp > 1:
        check_cfg(cfg, tp)
        assert specs is not None, "pass specs from stack_params_pp(tp=...)"
    lcfg = local_cfg(cfg, tp) if tp > 1 else cfg
    L = cfg.num_layers
    assert L % pp == 0
    Lp = L // pp
    kvspec = P("pp", None, "tp", None, None) if tp > 1 else P("pp")
    cspec = KVCache(k=kvspec, v=kvspec, pos=REP)
    state = {}

    def _pf(params, tokens, cache, *, M: int, Tc: int):
        s = jax.lax.axis_index("pp")
        B, T = tokens.shape
        layers = _stage_layers(params["stages"], Lp, tp)
        k_loc, v_loc = cache.k, cache.v
        H = cfg.hidden_size
        x_buf = jnp.zeros((B, Tc, H), params["embed"].dtype)
        last_x = jnp.zeros((B, H), params["embed"].dtype)

        for t in range(M + pp - 1):
            c = t - s  # chunk index this stage works on at step t
            valid = (c >= 0) & (c < M)
            cc = jnp.clip(c, 0, M - 1)
            # stage 0 sources its x from the embedding of chunk t (== c)
            chunk_toks = jax.lax.dynamic_slice(
                tokens, (0, cc * Tc), (B, Tc))
            x_emb = params["embed"][chunk_toks]
            x = jnp.where(s == 0, x_emb, x_buf)

            q_positions = (cc * Tc + jnp.arange(Tc, dtype=jnp.int32))[None, :]
            q_positions = jnp.broadcast_to(q_positions, (B, Tc))
            xo, k_new, v_new = _run_stage(
                layers, lcfg, x, k_loc, v_loc, q_positions,
                kv_len=cc * Tc + Tc, impl=impl, attn_chunk=attn_chunk,
                tp_axis=tp_axis)
            # commit cache only for valid steps (invalid steps computed on
            # garbage); where-select on the (Lp,...) buffers
            k_loc = jnp.where(valid, k_new, k_loc)
            v_loc = jnp.where(valid, v_new, v_loc)

            # carry the final chunk's last hidden row; the (large, vocab-
            # sized) head matmul runs ONCE after the loop, not per step
            is_last_out = valid & (s == pp - 1) & (c == M - 1)
            last_x = jnp.where(is_last_out, xo[:, -1, :], last_x)

            # pass boundary activations to the next stage (ring; the
            # wrap-around to stage 0 is ignored -- stage 0 embeds)
            x_buf = jax.lax.ppermute(
                xo, "pp", [(i, (i + 1) % pp) for i in range(pp)])

        xn = rms_norm(last_x, params["final_norm"], cfg.rms_norm_eps)
        head = params.get("lm_head")
        if head is None:
            logits_out = jnp.einsum("bh,vh->bv", xn, params["embed"],
                                    preferred_element_type=jnp.float32)
        elif isinstance(head, QuantizedTensor):
            from tmac_tpu.ops.qgemm import qgemm
            logits_out = qgemm(xn, head, impl="xla", out_dtype=jnp.float32)
        else:
            logits_out = jnp.einsum("bh,hv->bv", xn, head,
                                    preferred_element_type=jnp.float32)
        logits_out = jnp.where(s == pp - 1, logits_out.astype(jnp.float32),
                               0.0)
        logits_out = jax.lax.psum(logits_out, "pp")  # only last stage's
        pos = jnp.full((B,), T, jnp.int32)
        return logits_out, KVCache(k=k_loc, v=v_loc, pos=pos)

    def prefill_fn(params_pp, tokens, cache):
        B, T = tokens.shape
        Tc = chunk or max(T // pp, 1)
        assert T % Tc == 0, (T, Tc)
        M = T // Tc
        key = (M, Tc)
        if key not in state:
            pspec = specs if specs is not None else {
                **{k: REP for k in params_pp if k != "stages"},
                "stages": {n: P("pp") for n in params_pp["stages"]}}
            state[key] = jax.jit(shard_map(
                functools.partial(_pf, M=M, Tc=Tc), mesh,
                in_specs=(pspec, REP, cspec),
                out_specs=(REP, cspec)), donate_argnums=(2,))
        return state[key](params_pp, tokens, cache)

    return prefill_fn


def make_pp_decode_step(cfg: ModelConfig, mesh: Mesh, impl: str = "auto",
                        attn_chunk: int = 512, specs=None):
    """Build decode_fn(params_pp, last_tokens (B,), cache) -> (logits
    (B, V) f32, cache): one token through the stage chain (pp ppermute
    hops).  Capacity-oriented: latency ~ sum of stages, like a single
    chip, but each chip holds only L/pp layers + cache.  Composes with
    stage-internal TP like make_pp_prefill."""
    pp = mesh.shape["pp"]
    tp = mesh.shape.get("tp", 1)
    tp_axis = "tp" if tp > 1 else None
    if tp > 1:
        check_cfg(cfg, tp)
        assert specs is not None, "pass specs from stack_params_pp(tp=...)"
    lcfg = local_cfg(cfg, tp) if tp > 1 else cfg
    L = cfg.num_layers
    Lp = L // pp
    kvspec = P("pp", None, "tp", None, None) if tp > 1 else P("pp")
    cspec = KVCache(k=kvspec, v=kvspec, pos=REP)
    state = {}

    def _dec(params, last, cache):
        s = jax.lax.axis_index("pp")
        B = last.shape[0]
        layers = _stage_layers(params["stages"], Lp, tp)
        k_loc, v_loc = cache.k, cache.v
        H = cfg.hidden_size
        pos0 = cache.pos  # (B,)
        q_positions = pos0[:, None]  # (B, 1)

        x = params["embed"][last[:, None]]  # (B, 1, H) -- used by stage 0
        for t in range(pp):
            active = s == t
            xo, k_new, v_new = _run_stage(
                layers, lcfg, x, k_loc, v_loc, q_positions,
                kv_len=jnp.max(pos0) + 1, impl=impl, attn_chunk=attn_chunk,
                tp_axis=tp_axis)
            k_loc = jnp.where(active, k_new, k_loc)
            v_loc = jnp.where(active, v_new, v_loc)
            x = jax.lax.ppermute(
                jnp.where(active, xo, x), "pp",
                [(i, (i + 1) % pp) for i in range(pp)])
        # after pp hops, the fully-processed activation arrived at stage 0;
        # every stage ran the head on its x -- select stage 0's result
        xn = rms_norm(x[:, -1, :], params["final_norm"], cfg.rms_norm_eps)
        head = params.get("lm_head")
        if head is None:
            lg = jnp.einsum("bh,vh->bv", xn, params["embed"],
                            preferred_element_type=jnp.float32)
        elif isinstance(head, QuantizedTensor):
            from tmac_tpu.ops.qgemm import qgemm
            lg = qgemm(xn, head, impl="xla", out_dtype=jnp.float32)
        else:
            lg = jnp.einsum("bh,hv->bv", xn, head,
                            preferred_element_type=jnp.float32)
        lg = jnp.where(s == 0, lg.astype(jnp.float32), 0.0)
        lg = jax.lax.psum(lg, "pp")
        return lg, KVCache(k=k_loc, v=v_loc, pos=pos0 + 1)

    def decode_fn(params_pp, last, cache):
        if "f" not in state:
            pspec = specs if specs is not None else {
                **{k: REP for k in params_pp if k != "stages"},
                "stages": {n: P("pp") for n in params_pp["stages"]}}
            state["f"] = jax.jit(shard_map(
                _dec, mesh, in_specs=(pspec, REP, cspec),
                out_specs=(REP, cspec)), donate_argnums=(2,))
        return state["f"](params_pp, last, cache)

    return decode_fn
