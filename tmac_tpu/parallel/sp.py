"""Sequence-parallel prefill: shard the PROMPT over chips.

The reference has no sequence/context parallelism of any kind (SURVEY.md
section 2.4); its context handling is a llama.cpp flag.  This is the
optional stretch the survey's north star names: long-prompt prefill
parallelized over a mesh axis 'sp' -- each device embeds and projects its
token chunk, K/V are all-gathered per layer over ICI, and attention runs
locally with causal masking by GLOBAL position.  Everything except
attention is per-token, so the transformer body needs no other
communication; compute (the dominant prefill cost) scales ~linearly.

Scope: fresh prefill (cache.pos == 0) with T divisible by the sp degree;
params replicated (combine with weight TP by nesting meshes later).  The
resulting cache is replicated and directly usable by the single-chip or
tp decode paths.
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
from tmac_tpu.parallel.tp import REP, shard_map


def _sp_forward(params, cfg: ModelConfig, tokens, cache: KVCache,
                impl: str, axis: str):
    """Runs inside shard_map: tokens (B, Tl) is the local chunk."""
    B, Tl = tokens.shape
    sp = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    T = Tl * sp
    offset = idx * Tl
    mode = cfg.quant.mode

    x = params["embed"][tokens]  # (B, Tl, H)
    positions = (offset + jnp.arange(Tl, dtype=jnp.int32))[None, :]
    positions = jnp.broadcast_to(positions, (B, Tl))
    rope_cs = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    # causal mask by global position: kv s visible to local query t iff
    # s <= offset + t
    s_idx = jnp.arange(T)[None, None, :]                       # (1,1,T)
    valid = s_idx <= positions[:, :, None]                     # (B,Tl,T)

    new_k, new_v = cache.k, cache.v
    Dp = new_k.shape[-1]
    for li, layer in enumerate(params["layers"]):
        qkv = apply_qlinear(x, layer["wqkv"], mode, None, impl,
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
        q = rope(q.reshape(B, Tl, cfg.num_heads, cfg.head_dim), rope_cs)
        k = rope(k.reshape(B, Tl, cfg.num_kv_heads, cfg.head_dim), rope_cs)
        v = v.reshape(B, Tl, cfg.num_kv_heads, cfg.head_dim)

        # gather this layer's K/V across the sequence shards:
        # (B, Tl, KV, D) -> (B, T, KV, D), chunk i at [i*Tl, (i+1)*Tl)
        kg = jax.lax.all_gather(k, axis, axis=1, tiled=True)
        vg = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        kg = jnp.swapaxes(kg, 1, 2)  # (B, KV, T, D)
        vg = jnp.swapaxes(vg, 1, 2)

        # write the gathered (replicated) K/V into the cache at [0, T)
        if Dp != cfg.head_dim:
            pad = Dp - cfg.head_dim
            kg_w = jnp.pad(kg, ((0, 0), (0, 0), (0, 0), (0, pad)))
            vg_w = jnp.pad(vg, ((0, 0), (0, 0), (0, 0), (0, pad)))
        else:
            kg_w, vg_w = kg, vg
        new_k = jax.lax.dynamic_update_slice(
            new_k, kg_w.astype(new_k.dtype)[None], (li, 0, 0, 0, 0))
        new_v = jax.lax.dynamic_update_slice(
            new_v, vg_w.astype(new_v.dtype)[None], (li, 0, 0, 0, 0))

        # local attention: q (B,Tl,H,D) vs global kg/vg (B,KV,T,D)
        KV = cfg.num_kv_heads
        rep = cfg.num_heads // KV
        qr = q.reshape(B, Tl, KV, rep, cfg.head_dim).astype(jnp.float32)
        scores = jnp.einsum("btkrd,bksd->btkrs", qr, kg.astype(jnp.float32))
        scores = scores / np.sqrt(cfg.head_dim)
        scores = jnp.where(valid[:, :, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("btkrs,bksd->btkrd", probs, vg.astype(jnp.float32))
        attn = attn.reshape(B, Tl, cfg.q_dim).astype(x.dtype)

        # residual folded like models/llama.forward (no psum here: weights
        # are replicated under sp)
        x = apply_qlinear(attn, layer["wo"], mode, None, impl, residual=x)
        gu = apply_qlinear(x, layer["gate_up"], mode, None, impl,
                           norm=(layer["mlp_norm"], cfg.rms_norm_eps))
        down = layer["down"]
        use_pallas = impl == "pallas" or (
            impl == "auto" and jax.default_backend() == "tpu")
        if (use_pallas and down.kdim_padded == down.kdim
                and (mode != "w_a8" or down.scales.shape[0] == 1)):
            x = apply_qlinear(gu, down, mode, None, impl, glu=True, residual=x)
        else:
            ihalf = down.kdim
            g, u = gu[..., :ihalf], gu[..., ihalf:]
            x = apply_qlinear(
                jax.nn.silu(g.astype(jnp.float32)).astype(g.dtype) * u,
                down, mode, None, impl, residual=x)

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
    pos = jnp.full((B,), T, jnp.int32)
    return logits, KVCache(k=new_k, v=new_v, pos=pos)


def make_sp_prefill(cfg: ModelConfig, mesh: Mesh, impl: str = "auto"):
    """Build prefill_fn(params, tokens (B, T), cache) -> (last logits, cache)
    sharded over mesh axis 'sp'. T % sp == 0; cache.pos must be 0."""
    sp = mesh.shape["sp"]

    def _pf(params, tokens, cache):
        logits, cache = _sp_forward(params, cfg, tokens, cache, impl, "sp")
        # the global last position lives on the last shard; psum-broadcast
        # its final-row logits so the output is replicated
        i = jax.lax.axis_index("sp")
        last = jnp.where(i == sp - 1, logits[:, -1, :].astype(jnp.float32), 0.0)
        last = jax.lax.psum(last, "sp")
        return last, cache

    sm = shard_map(
        _pf, mesh,
        in_specs=(REP, P(None, "sp"), REP),
        out_specs=(REP, REP),
    )
    jitted = jax.jit(sm, donate_argnums=(2,))

    def prefill_fn(params, tokens, cache):
        B, T = tokens.shape
        assert T % sp == 0, f"prompt length {T} must divide sp={sp}"
        return jitted(params, tokens, cache)

    return prefill_fn


def make_sp_mesh(sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= sp
    return jax.make_mesh((sp,), ("sp",), devices=devices[:sp])
