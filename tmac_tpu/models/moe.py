"""Mixture-of-Experts MLP with LUT-mpGEMM expert FFNs.

Net-new surface vs the reference (its model list, python/t_mac/
model_utils.py:19-88, has no MoE family) -- but the reference's low-bit
kernels apply to each expert's gate/up/down exactly as to a dense MLP, so
an MoE model is the natural next member of the family (Mixtral-8x7B W2
GPTQ is a published EfficientQAT target).  Everything here is TPU-first:

  * static shapes everywhere -- routing produces a dense (tokens, E)
    combine-weight matrix, never a ragged gather;
  * decode / small-N uses the DENSE-MASKED form: every local expert runs
    on the whole (small) token block and the combine weights zero out
    non-selected experts.  At serving batch sizes the step is HBM-bound on
    expert weight reads, and with B*top_k >= E the routed set touches
    nearly every expert anyway, so "wasted" expert FLOPs are free -- while
    a gather/scatter dispatch would add latency for nothing;
  * prefill / large-N uses CAPACITY DISPATCH (GShard/Switch style): a
    one-hot (tokens, E, C) dispatch tensor built from a cumsum, two
    einsums to gather/scatter, and per-expert FFNs on dense (C, H) blocks
    that tile straight onto the MXU.  The gather einsum is an exact row
    copy (each (e, c) slot selects at most one token), so with ample
    capacity dispatch matches dense to f32 rounding -- the only
    difference is FMA association in the combine contraction
    (tests/test_moe.py gates at atol 1e-4);
  * expert parallelism shards the STACKED expert weights over an 'ep'
    mesh axis (parallel/ep.py): each device runs its local experts on the
    replicated token block and one psum over 'ep' (linearity of the
    weighted combine) merges the partial outputs -- compute parallelizes
    E-ways with a single collective per MoE layer, no all-to-all and no
    capacity-overflow coupling between devices.

Routing follows Mixtral (HF MixtralSparseMoeBlock): top-k on the router
logits, softmax over the k selected logits, weighted sum of expert
outputs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tmac_tpu.ops.qgemm import QuantizedTensor
from tmac_tpu.utils import round_up


# ---------------------------------------------------------------------------
# Stacked expert weights
# ---------------------------------------------------------------------------

def stack_experts(qts: list) -> QuantizedTensor:
    """Stack per-expert QuantizedTensors along a new leading E axis.

    The result is a QuantizedTensor whose data fields carry an extra
    leading dim (packed (E, K//p, M_pad), scales (E, G, M_pad), ...) while
    the static meta still describes ONE expert -- `expert_view` slices a
    valid per-expert tensor back out.  Stacking (rather than a Python list
    of experts) is what makes expert parallelism a plain PartitionSpec:
    P('ep', ...) on the leading dim shards experts over the mesh.
    """
    base = qts[0]
    for q in qts[1:]:
        assert q.bits == base.bits and q.group_size == base.group_size
        assert q.shape == base.shape and q.m_segments == base.m_segments
        assert q.k_shards == base.k_shards and q.m_shards == base.m_shards
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qts)


def expert_view(stacked: QuantizedTensor, e: int) -> QuantizedTensor:
    """The e-th expert of a stack_experts tensor (static or traced e)."""
    return jax.tree.map(lambda a: a[e], stacked)


def num_local_experts(stacked: QuantizedTensor) -> int:
    return stacked.packed.shape[0]


# ---------------------------------------------------------------------------
# Routing
# ---------------------------------------------------------------------------

def route_topk(x2: jax.Array, router: jax.Array, k: int,
               norm_topk: bool = True) -> jax.Array:
    """Top-k routing -> dense combine weights.

    x2 (N, H) tokens, router (H, E).  Returns (N, E) f32 where row n has
    k nonzero entries.  norm_topk=True: softmax over the k selected
    router logits (Mixtral); False: softmax over ALL experts, top-k
    weights kept unrenormalized (Qwen2-MoE norm_topk_prob=False).  Dense
    by design -- downstream code indexes experts statically, never
    gathers by traced expert id.
    """
    # precision=HIGHEST: the TPU MXU runs "f32" dots on bf16-truncated
    # inputs by default, and bf16-level logit noise FLIPS top-k expert
    # picks at near-ties (observed on hardware: 5 MoE oracle tests fail
    # with default precision, pass with full f32).  Routing decisions
    # must not depend on matmul rounding; the router dot is tiny
    # ((N,H)@(H,E)), so full f32 costs nothing.
    logits = jnp.einsum("nh,he->ne", x2.astype(jnp.float32),
                        router.astype(jnp.float32),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    E = router.shape[1]
    if norm_topk:
        topv, topi = jax.lax.top_k(logits, k)      # (N, k)
        w = jax.nn.softmax(topv, axis=-1)          # (N, k) f32
    else:
        probs = jax.nn.softmax(logits, axis=-1)    # (N, E)
        w, topi = jax.lax.top_k(probs, k)
    onehot = (topi[..., None] == jnp.arange(E)[None, None, :])  # (N, k, E)
    return jnp.sum(onehot * w[..., None], axis=1)  # (N, E)


def expert_capacity(n_tokens: int, cfg, capacity_factor: float = 2.0) -> int:
    """Static per-expert token capacity for the dispatch path (multiple of
    8 so expert blocks stay sublane-aligned).

    The 2.0 default tolerates expert load up to 2x uniform before
    dropping -- Mixtral-class routers are trained near-balanced, and
    inference exactness matters more than the last factor-of-two FLOP
    saving (the dense form is always available as the exact fallback)."""
    import math
    c = math.ceil(n_tokens * cfg.num_experts_per_tok * capacity_factor
                  / cfg.num_experts)
    return round_up(max(c, 8), 8)


# ---------------------------------------------------------------------------
# Expert FFN (same fusion rules as the dense MLP in models/llama.py)
# ---------------------------------------------------------------------------

def _expert_ffn(x2: jax.Array, gu_qt: QuantizedTensor,
                down_qt: QuantizedTensor, mode: str, impl: str,
                act_gs: int) -> jax.Array:
    """silu(x @ gate) * (x @ up) @ down on one expert; x2 (N, H) -> (N, H).

    Mirrors the dense-MLP kernel-fusion rules in models/llama.forward: the
    SwiGLU folds into the down kernel's prologue on the pallas path."""
    from tmac_tpu.models.llama import apply_qlinear
    gu = apply_qlinear(x2, gu_qt, mode, None, impl, act_gs=act_gs)
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu")
    if (use_pallas and down_qt.kdim_padded == down_qt.kdim
            and (mode != "w_a8" or down_qt.scales.shape[0] == 1)):
        return apply_qlinear(gu, down_qt, mode, None, impl, glu=True,
                             act_gs=act_gs)
    ihalf = down_qt.kdim
    g, u = gu[..., :ihalf], gu[..., ihalf:]
    return apply_qlinear(
        jax.nn.silu(g.astype(jnp.float32)).astype(g.dtype) * u,
        down_qt, mode, None, impl, act_gs=act_gs)


# ---------------------------------------------------------------------------
# The MoE MLP block
# ---------------------------------------------------------------------------

def moe_mlp(x: jax.Array, layer: dict, cfg, mode: str, impl: str = "auto",
            act_gs: int = 0, ep_axis: Optional[str] = None,
            moe_impl: str = "auto", capacity: Optional[int] = None,
            valid: Optional[jax.Array] = None) -> jax.Array:
    """The MoE replacement for the gate_up/down block.

    x (B, T, H) pre-norm hidden states.  Returns the (B, T, H) expert-
    combined output WITHOUT the residual add and WITHOUT cross-device
    reduction -- under tp/ep sharding the caller psums over the relevant
    axes first (the combine is linear, so one psum covers both the
    row-parallel down partials and the expert partials), then adds the
    residual.

    ep_axis: mesh axis name when the expert stacks are sharded over
    devices (parallel/ep.py); each device sees only its leading slice of
    the stacks and weights it with its slice of the combine matrix.
    moe_impl: 'dense' | 'dispatch' | 'select' | 'auto'.  Auto picks
    dispatch only for PREFILL-shaped blocks (T > 1 and N >= 64, where the
    k/E FLOP saving beats the dispatch einsums); decode (T == 1) always
    uses the exact dense-masked form no matter the batch -- capacity
    dispatch on a decode batch would let stale/inactive engine slots
    steal expert capacity from live ones.
    valid: optional (B, T) bool -- rows marked False (e.g. right-padding
    in an engine prefill bucket) get zero combine weight, so they neither
    consume dispatch capacity nor contribute output.

    'select' (N == 1, single-device latency mode; TMAC_MOE_SELECT=1 makes
    'auto' pick it): runs only the top-k routed experts.  On the pallas
    path this is ZERO-COPY: the expert index rides into the kernel and
    the weight DMAs read expert e's blocks straight from the HBM stack
    (ops/pallas/expert_kernel.py) -- HBM traffic is exactly k experts'
    bytes, E/k times less than dense (4x on Mixtral 8x2).  Outside the
    kernel's scope (bits 3/8, k-padded shapes, CPU) it falls back to a
    traced leading-axis gather, which materializes a copy (~3 bytes
    moved per selected byte -- still a win whenever E/k > 3).
    """
    B, T, H = x.shape
    from tmac_tpu.models.llama import rms_norm
    xn = rms_norm(x, layer["mlp_norm"], cfg.rms_norm_eps)
    x2 = xn.reshape(-1, H)
    N = x2.shape[0]

    cw = route_topk(x2, layer["moe_router"], cfg.num_experts_per_tok,
                    norm_topk=cfg.moe_norm_topk)
    if valid is not None:
        cw = cw * valid.reshape(-1, 1).astype(cw.dtype)
    gu_stack: QuantizedTensor = layer["experts_gate_up"]
    down_stack: QuantizedTensor = layer["experts_down"]
    E_local = num_local_experts(gu_stack)
    if ep_axis is not None:
        off = jax.lax.axis_index(ep_axis) * E_local
        cw = jax.lax.dynamic_slice_in_dim(cw, off, E_local, axis=-1)
    else:
        assert E_local == cfg.num_experts, (E_local, cfg.num_experts)

    import os
    if moe_impl == "auto":
        if T > 1 and N >= 64:
            moe_impl = "dispatch"
        elif (N == 1 and ep_axis is None
              and os.environ.get("TMAC_MOE_SELECT", "1") == "1"):
            # expert-select is the B=1 decode default: it moves exactly k
            # experts' bytes per token (measured 150.4 vs 20.0 tok/s for
            # the dense-masked form on mixtral-8x7b, BENCH.md), and its
            # oracle gates are green on hardware (bench_artifacts/r5/
            # moe_hw_gates.log).  TMAC_MOE_SELECT=0 restores dense-masked.
            moe_impl = "select"
        else:
            moe_impl = "dense"

    if moe_impl == "select":
        assert N == 1 and ep_axis is None, (N, ep_axis)
        k = cfg.num_experts_per_tok
        topw, topi = jax.lax.top_k(cw[0], k)  # the k routed weights
        use_pallas = impl == "pallas" or (
            impl == "auto" and jax.default_backend() == "tpu")
        from tmac_tpu.ops.pallas.expert_kernel import (
            expert_kernel_supported, qgemm_expert_pallas)
        acc = jnp.zeros((N, H), jnp.float32)
        if (use_pallas and expert_kernel_supported(gu_stack, act_gs)
                and expert_kernel_supported(down_stack, act_gs)):
            # zero-copy form: the expert index rides into the kernel and
            # the weight DMAs read expert e's blocks straight from the
            # HBM stack -- exactly k experts' bytes move per token
            for j in range(k):
                gu = qgemm_expert_pallas(x2, gu_stack, topi[j])
                ye = qgemm_expert_pallas(gu.astype(x2.dtype), down_stack,
                                         topi[j], glu=True)
                acc = acc + topw[j] * ye
        else:
            for j in range(k):
                gu_e = expert_view(gu_stack, topi[j])  # traced gather
                down_e = expert_view(down_stack, topi[j])
                ye = _expert_ffn(x2, gu_e, down_e, mode, impl, act_gs)
                acc = acc + topw[j] * ye.astype(jnp.float32)
        out = acc
    elif moe_impl == "dense":
        acc = jnp.zeros((N, H), jnp.float32)
        for e in range(E_local):
            ye = _expert_ffn(x2, expert_view(gu_stack, e),
                             expert_view(down_stack, e), mode, impl, act_gs)
            acc = acc + cw[:, e:e + 1] * ye.astype(jnp.float32)
        out = acc
    else:
        assert moe_impl == "dispatch", moe_impl
        C = capacity if capacity is not None else expert_capacity(N, cfg)
        sel = cw > 0.0                                        # (N, E_local)
        pos = jnp.cumsum(sel.astype(jnp.int32), axis=0) - 1   # slot in expert
        keep = sel & (pos < C)
        # one-hot dispatch: disp[n, e, c] = token n occupies slot c of
        # expert e.  Each (e, c) selects at most one n, so the gather
        # einsum is an exact row copy even in bf16.
        disp = (keep[:, :, None]
                & (pos[:, :, None] == jnp.arange(C)[None, None, :]))
        xe = jnp.einsum("nec,nh->ech", disp.astype(x2.dtype), x2)  # (E,C,H)
        ys = [
            _expert_ffn(xe[e], expert_view(gu_stack, e),
                        expert_view(down_stack, e), mode, impl, act_gs)
            for e in range(E_local)
        ]
        ye = jnp.stack(ys).astype(jnp.float32)                # (E, C, H)
        # combine: scatter each expert slot back to its token, weighted.
        # Tokens dropped by capacity overflow contribute zero (standard
        # Switch semantics; capacity_factor 1.25 over uniform load).
        out = jnp.einsum("nec,ech->nh",
                         disp.astype(jnp.float32) * cw[:, :, None], ye)

    if "shared_gate_up" in layer:
        # always-on shared expert (Qwen2-MoE/DeepSeek family): a dense FFN
        # every token takes, optionally sigmoid-gated.  tp-sharded like
        # the dense MLP (partials merged by the caller's psum); under ep
        # every device computes it identically, so pre-divide by the ep
        # group size to survive the same psum.
        ys = _expert_ffn(x2, layer["shared_gate_up"], layer["shared_down"],
                         mode, impl, act_gs).astype(jnp.float32)
        if "shared_gate" in layer:
            gate = jax.nn.sigmoid(jnp.einsum(
                "nh,h->n", x2.astype(jnp.float32),
                layer["shared_gate"].astype(jnp.float32)))
            ys = ys * gate[:, None]
        if ep_axis is not None:
            ys = ys / jax.lax.axis_size(ep_axis)
        out = out + ys
    return out.reshape(B, T, H).astype(x.dtype)
