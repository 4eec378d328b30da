"""Sequence-parallel prefill: shard the PROMPT over chips.

The reference has no sequence/context parallelism of any kind (SURVEY.md
section 2.4); its context handling is a llama.cpp flag.  This is the
optional stretch the survey's north star names: long-prompt prefill
parallelized over a mesh axis 'sp' -- each device embeds and projects its
token chunk, K/V are all-gathered per layer over ICI, and attention runs
locally with causal masking by GLOBAL position.  Everything except
attention is per-token, so the transformer body needs no other
communication; compute (the dominant prefill cost) scales ~linearly.

Scope: prefill with T divisible by the sp degree.  Composes with
Megatron-style weight TP over a 2-D ('sp', 'tp') mesh (make_sp_tp_mesh):
each tp group holds a column/row shard of every weight, each sp shard a
token chunk; row-parallel projections psum over 'tp' per layer, K/V
all-gather over 'sp'.  The resulting cache is sp-replicated and
tp-sharded over kv-heads -- directly usable by the tp decode path on the
same mesh.  With tp=1 params are replicated and the cache is usable by
the single-chip decode path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmac_tpu.models.config import ModelConfig
from tmac_tpu.models.llama import (KVCache, QuantizedTensor, apply_qlinear,
                                   rms_norm, rope, rope_tables)
from tmac_tpu.parallel.tp import (REP, _localize_params, check_cfg,
                                  local_cfg, param_specs, shard_map)


def _chunked_causal_attention(q, k_buf, v_buf, q_positions, kv_len, D,
                              chunk: int, window: int = 0):
    """Online-softmax attention of q (B, Tl, KV, rep, D) against the cache
    buffers k_buf/v_buf (B, KV, S, Dp), reading only ceil(kv_len/chunk)
    chunks -- score memory is O(Tl * chunk) instead of O(Tl * T), and
    compute is bounded by the REAL kv length (a traced value), not the
    allocation.  Causal: kv index s visible to query t iff s <= pos(t).
    q_positions: (B, Tl) global positions.  Returns (B, Tl, KV*rep*D) f32.
    """
    B, Tl, KV, rep, _ = q.shape
    S = k_buf.shape[2]
    chunk = min(chunk, S)
    while S % chunk:  # clamped dynamic_slice must stay index-aligned
        chunk //= 2
    scale = 1.0 / np.sqrt(D)
    # CPU XLA can't take bf16 x bf16 -> f32 dots (cf. models/llama.py)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    qf = q.astype(dt)

    nchunks = (kv_len + chunk - 1) // chunk  # traced -> while_loop

    def body(c, carry):
        m, l, acc = carry
        c0 = c * chunk
        ks = jax.lax.dynamic_slice(
            k_buf, (0, 0, c0, 0), (B, KV, chunk, k_buf.shape[3]))[..., :D]
        vs = jax.lax.dynamic_slice(
            v_buf, (0, 0, c0, 0), (B, KV, chunk, v_buf.shape[3]))[..., :D]
        s = jnp.einsum("btkrd,bksd->btkrs", qf, ks.astype(dt),
                       preferred_element_type=jnp.float32) * scale
        kv_idx = c0 + jnp.arange(chunk)                     # (chunk,)
        ok = (kv_idx[None, None, :] <= q_positions[:, :, None]) \
            & (kv_idx < kv_len)[None, None, :]              # (B,Tl,chunk)
        if window > 0:  # sliding-window attention (ModelConfig)
            ok &= kv_idx[None, None, :] > q_positions[:, :, None] - window
        s = jnp.where(ok[:, :, None, None, :], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # exp(-inf - -inf) guards: rows with no visible kv yet keep m=-inf
        corr = jnp.exp(jnp.where(jnp.isfinite(m), m - m_new, -jnp.inf))
        p = jnp.exp(jnp.where(jnp.isfinite(s), s - m_new[..., None],
                              -jnp.inf))
        p = jnp.where(jnp.isfinite(p), p, 0.0)
        corr = jnp.where(jnp.isfinite(corr), corr, 0.0)
        l = l * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum("btkrs,bksd->btkrd", p.astype(dt), vs.astype(dt),
                        preferred_element_type=jnp.float32)
        acc = acc * corr[..., None] + pv
        return m_new, l, acc

    m0 = jnp.full((B, Tl, KV, rep), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, Tl, KV, rep), jnp.float32)
    a0 = jnp.zeros((B, Tl, KV, rep, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nchunks, body, (m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.reshape(B, Tl, KV * rep * D)


def layer_qkv_rope(layer, cfg: ModelConfig, x, rope_cs, impl: str):
    """Shared per-layer prologue for the parallel forwards (sp/pp): fused
    norm+qkv projection, optional biases, rotary.  x (B, T, H) ->
    q (B, T, H heads, D), k/v (B, T, KV, D)."""
    B, T = x.shape[:2]
    qkv = apply_qlinear(x, layer["wqkv"], cfg.quant.mode, None, impl,
                        norm=(layer["attn_norm"], cfg.rms_norm_eps))
    qd, kvd = cfg.q_dim, cfg.kv_dim
    q = qkv[..., :qd]
    k = qkv[..., qd:qd + kvd]
    v = qkv[..., qd + kvd:]
    if "bq" in layer:
        q = q + layer["bq"].astype(q.dtype)
    if "bk" in layer:
        k = k + layer["bk"].astype(k.dtype)
    if "bv" in layer:
        v = v + layer["bv"].astype(v.dtype)
    q = rope(q.reshape(B, T, cfg.num_heads, cfg.head_dim), rope_cs)
    k = rope(k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim), rope_cs)
    v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    return q, k, v


def layer_out_mlp(layer, cfg: ModelConfig, x, attn, impl: str, tp_axis=None):
    """Shared per-layer epilogue: wo projection + residual, fused-norm
    gate_up, SwiGLU, down projection + residual.  The residual folds into
    the kernel epilogues ONLY when no cross-chip psum follows (same rule
    as models/llama.forward: the psum must see the partial sum, not
    partial + residual per shard)."""
    mode = cfg.quant.mode
    res = x if tp_axis is None else None
    o = apply_qlinear(attn, layer["wo"], mode, None, impl, residual=res)
    if tp_axis is not None:
        x = x + jax.lax.psum(o, tp_axis)
    else:
        x = o
    gu = apply_qlinear(x, layer["gate_up"], mode, None, impl,
                       norm=(layer["mlp_norm"], cfg.rms_norm_eps))
    down = layer["down"]
    res = x if tp_axis is None else None
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu")
    if (use_pallas and down.kdim_padded == down.kdim
            and (mode != "w_a8" or down.scales.shape[0] == 1)):
        d = apply_qlinear(gu, down, mode, None, impl, glu=True, residual=res)
    else:
        ihalf = down.kdim
        g, u = gu[..., :ihalf], gu[..., ihalf:]
        d = apply_qlinear(
            jax.nn.silu(g.astype(jnp.float32)).astype(g.dtype) * u,
            down, mode, None, impl, residual=res)
    if tp_axis is not None:
        return x + jax.lax.psum(d, tp_axis)
    return d


def _sp_forward(params, cfg: ModelConfig, tokens, cache: KVCache,
                impl: str, axis: str, start, attn_chunk: int = 512,
                tp_axis=None):
    """Runs inside shard_map: tokens (B, Tl) is the local chunk of a
    global T = Tl*sp token span beginning at cache position `start`
    (traced scalar; 0 = fresh prefill).  With start > 0 the attention also
    covers the already-cached prefix, so SP composes with chunked prefill.

    tp_axis: mesh axis name for Megatron weight TP.  cfg must then be the
    LOCAL (per-tp-device) config and params the local shards; wo/down are
    row-parallel (psum over tp_axis before the residual add, mirroring
    models/llama.forward), K/V carry only the local kv-head shard.
    """
    B, Tl = tokens.shape
    sp = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    T = Tl * sp
    offset = start + idx * Tl

    x = params["embed"][tokens]  # (B, Tl, H)
    positions = (offset + jnp.arange(Tl, dtype=jnp.int32))[None, :]
    positions = jnp.broadcast_to(positions, (B, Tl))
    rope_cs = rope_tables(positions, cfg.head_dim, cfg.rope_theta,
                          cfg.rope_scaling)

    new_k, new_v = cache.k, cache.v
    Dp = new_k.shape[-1]
    for li, layer in enumerate(params["layers"]):
        q, k, v = layer_qkv_rope(layer, cfg, x, rope_cs, impl)

        # gather this layer's K/V across the sequence shards:
        # (B, Tl, KV, D) -> (B, T, KV, D), chunk i at [i*Tl, (i+1)*Tl)
        kg = jax.lax.all_gather(k, axis, axis=1, tiled=True)
        vg = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        kg = jnp.swapaxes(kg, 1, 2)  # (B, KV, T, D)
        vg = jnp.swapaxes(vg, 1, 2)

        # write the gathered (replicated) K/V into the cache at [start, start+T)
        if Dp != cfg.head_dim:
            pad = Dp - cfg.head_dim
            kg_w = jnp.pad(kg, ((0, 0), (0, 0), (0, 0), (0, pad)))
            vg_w = jnp.pad(vg, ((0, 0), (0, 0), (0, 0), (0, pad)))
        else:
            kg_w, vg_w = kg, vg
        new_k = jax.lax.dynamic_update_slice(
            new_k, kg_w.astype(new_k.dtype)[None], (li, 0, 0, start, 0))
        new_v = jax.lax.dynamic_update_slice(
            new_v, vg_w.astype(new_v.dtype)[None], (li, 0, 0, start, 0))

        # chunked online-softmax attention against the UPDATED cache
        # (covers the cached prefix [0, start) AND the gathered new span);
        # each shard reads only up to its own last query position
        KV = cfg.num_kv_heads
        rep = cfg.num_heads // KV
        qr = q.reshape(B, Tl, KV, rep, cfg.head_dim)
        attn = _chunked_causal_attention(
            qr, new_k[li], new_v[li], positions,
            kv_len=offset + Tl, D=cfg.head_dim, chunk=attn_chunk,
            window=cfg.sliding_window)
        attn = attn.astype(x.dtype)

        x = layer_out_mlp(layer, cfg, x, attn, impl, tp_axis=tp_axis)

    # only the last shard's last position matters for the next token; all
    # shards compute their local logits, caller takes the global last
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:
        logits = jnp.einsum("bth,vh->btv", x, params["embed"],
                            preferred_element_type=jnp.float32)
    elif isinstance(head, QuantizedTensor):
        from tmac_tpu.ops.qgemm import qgemm
        logits = qgemm(x.reshape(-1, x.shape[-1]), head, impl="xla",
                       out_dtype=jnp.float32).reshape(B, Tl, head.mdim)
    else:
        logits = jnp.einsum("bth,hv->btv", x, head,
                            preferred_element_type=jnp.float32)
    pos = jnp.full((B,), start + T, jnp.int32)
    return logits, KVCache(k=new_k, v=new_v, pos=pos)


def make_sp_prefill(cfg: ModelConfig, mesh: Mesh, impl: str = "auto",
                    attn_chunk: int = 512):
    """Build prefill_fn(params, tokens (B, T), cache, start=0) ->
    (last logits, cache), sharded over mesh axis 'sp' (and, if the mesh
    has a 'tp' axis > 1, Megatron weight TP over 'tp' -- the SPxTP
    composition; pass tp-sharded params/cache, e.g. via tp.shard_params
    with this mesh).  T % sp == 0.

    start (int32 scalar) is the cache position the span begins at: 0 for a
    fresh prompt, or the running offset when composing with chunked
    prefill (attention then covers the cached prefix too).  Score memory
    is bounded by `attn_chunk` (online softmax), so long contexts don't
    materialize O(T^2) f32 scores.
    """
    assert cfg.num_experts == 0, (
        "MoE models are not supported under sp (expert stacks would "
        "replicate; shard them over 'ep' instead -- parallel/ep.py)")
    sp = mesh.shape["sp"]
    tp = mesh.shape.get("tp", 1)
    tp_axis = "tp" if tp > 1 else None
    if tp > 1:
        check_cfg(cfg, tp)
    lcfg = local_cfg(cfg, tp) if tp > 1 else cfg
    # cache layout (L, B, KV, S, D): kv-heads on 'tp', replicated over 'sp'
    cspec = KVCache(k=P(None, None, "tp", None, None),
                    v=P(None, None, "tp", None, None), pos=REP) \
        if tp > 1 else REP

    def _pf(params, tokens, cache, start):
        params = _localize_params(params, tp)
        logits, cache = _sp_forward(params, lcfg, tokens, cache, impl, "sp",
                                    start, attn_chunk=attn_chunk,
                                    tp_axis=tp_axis)
        # the global last position lives on the last shard; psum-broadcast
        # its final-row logits so the output is replicated
        i = jax.lax.axis_index("sp")
        last = jnp.where(i == sp - 1, logits[:, -1, :].astype(jnp.float32), 0.0)
        last = jax.lax.psum(last, "sp")
        return last, cache

    # built lazily: with tp > 1 the param specs need the pytree structure
    state = {}

    def prefill_fn(params, tokens, cache, start=0):
        B, T = tokens.shape
        assert T % sp == 0, f"prompt length {T} must divide sp={sp}"
        if "jitted" not in state:
            pspecs = param_specs(params) if tp > 1 else REP
            state["jitted"] = jax.jit(shard_map(
                _pf, mesh,
                in_specs=(pspecs, P(None, "sp"), cspec, REP),
                out_specs=(REP, cspec)), donate_argnums=(2,))
        return state["jitted"](params, tokens, cache, jnp.int32(start))

    return prefill_fn


def sp_prefill_chunked(prefill_fn, params, tokens, cache, chunk: int):
    """Compose SP with chunked prefill: run `tokens` (B, T) through
    prefill_fn in spans of `chunk` tokens (each span sharded over sp),
    bounding activation memory like the engine's prefill_chunk.  Returns
    (last logits, cache).  T % chunk == 0 and chunk % sp == 0."""
    B, T = tokens.shape
    assert T % chunk == 0, (T, chunk)
    last = None
    for off in range(0, T, chunk):
        last, cache = prefill_fn(params, tokens[:, off:off + chunk], cache,
                                 start=off)
    return last, cache


def make_sp_mesh(sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= sp
    return jax.make_mesh((sp,), ("sp",), devices=devices[:sp])


def shard_cache_sp_tp(cache: KVCache, mesh: Mesh) -> KVCache:
    """device_put a KVCache for the ('sp', 'tp') mesh: kv-heads sharded
    over 'tp', everything replicated over 'sp' (cf. tp.shard_cache, whose
    specs assume a ('dp', 'tp') mesh)."""
    assert not cache.quantized, "int8 KV cache: supported on the tp/dp mesh path only (parallel/tp.py)"
    kv = NamedSharding(mesh, P(None, None, "tp", None, None))
    return KVCache(k=jax.device_put(cache.k, kv),
                   v=jax.device_put(cache.v, kv),
                   pos=jax.device_put(cache.pos, NamedSharding(mesh, P())))


def make_sp_tp_mesh(sp: int, tp: int, devices=None) -> Mesh:
    """2-D ('sp', 'tp') mesh for SPxTP prefill.  tp is the minor
    (fastest-varying) axis so tp groups sit on adjacent devices -- the
    per-layer psums ride the shortest ICI hops; the per-layer 'sp'
    all-gathers are rarer (2/layer vs 2 psums/layer but K/V bytes only)."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= sp * tp, (len(devices), sp, tp)
    return jax.make_mesh((sp, tp), ("sp", "tp"), devices=devices[: sp * tp])
