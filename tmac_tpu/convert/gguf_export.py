"""Packed tmac-tpu checkpoint -> gguf artifact (the llama-quantize role).

The reference pipeline both consumes and PRODUCES gguf: step 3 converts
HF -> gguf and `llama-quantize` requantizes artifacts between block
types (reference tools/run_pipeline.py:139-175, 164-175).  This module
closes the loop in that direction: a converted checkpoint (any source --
HF fp, GPTQ, gguf) exports to a llama.cpp-named gguf with a chosen block
type, so tmac-tpu interoperates with the llama.cpp ecosystem both ways.

Export = dequantize each packed matrix through the framework's dequant
contract (Wdq = scales*wq - sub, the same math qgemm executes), then
requantize into the target gguf block codec -- exactly llama-quantize's
semantics (dequant -> requant), so a Q4_0 -> checkpoint -> Q4_0 round
trip is lossless (block boundaries at 32 divide group_size).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from tmac_tpu.convert import gguf as gg
from tmac_tpu.models.config import ModelConfig

WTYPE_BY_NAME = {
    "Q4_0": gg.GGML_Q4_0, "Q4_1": gg.GGML_Q4_1, "Q5_0": gg.GGML_Q5_0,
    "Q5_1": gg.GGML_Q5_1, "Q8_0": gg.GGML_Q8_0, "Q2_K": gg.GGML_Q2_K,
    "Q3_K": gg.GGML_Q3_K, "Q4_K": gg.GGML_Q4_K,
    "Q5_K": gg.GGML_Q5_K, "Q6_K": gg.GGML_Q6_K, "TQ1_0": gg.GGML_TQ1_0,
    "TQ2_0": gg.GGML_TQ2_0, "I2_S": gg.GGML_I2_S, "F16": gg.GGML_F16,
    "F32": gg.GGML_F32,
}


def qt_to_float(qt) -> np.ndarray:
    """Dequantize a QuantizedTensor to float32 at its logical (K, M) shape
    via the framework dequant contract (ops/qgemm.qgemm_xla docstring).
    Requires an unsharded (tp=1) tensor."""
    import jax.numpy as jnp

    from tmac_tpu.ops import packing
    from tmac_tpu.ops.qgemm import _unpack_jnp

    assert qt.k_shards == 1 and qt.m_shards == 1, \
        "export needs a tp=1 checkpoint (convert with --tp 1)"
    wq_p = np.asarray(_unpack_jnp(qt.packed, qt.packed_hi, qt.bits, 1))
    sc_p = np.asarray(qt.scales, np.float32)
    sb_p = np.asarray(qt.sub, np.float32)
    wdq_p = packing.dequantize(wq_p, sc_p, sb_p, qt.group_size)  # (Kp, Mp)
    wdq = np.asarray(qt.slice_m(jnp.asarray(wdq_p)))  # (Kp, M) logical m
    return wdq[: qt.kdim]


def split_fused(qt, wdq: np.ndarray):
    """Split a fuse_m tensor's dequantized (K, M) matrix back into its
    logical components ([q|k|v] or [gate|up])."""
    if qt.m_segments is None:
        return [wdq]
    out, off = [], 0
    for (Mi, _) in qt.m_segments:
        out.append(wdq[:, off:off + Mi])
        off += Mi
    return out


def _f32(a) -> np.ndarray:
    return np.asarray(a, np.float32)


def export_gguf(path: str, cfg: ModelConfig, params: Dict[str, Any],
                wtype: str = "auto", ckpt_dir: Optional[str] = None,
                arch: str = "llama") -> Dict[str, Any]:
    """Write `params` as a llama.cpp-compatible gguf.

    wtype: matmul block type (WTYPE_BY_NAME key).  'auto' picks from the
    checkpoint's quant mode: ternary w_a8 -> TQ2_0, bits=8 -> Q8_0,
    bits<=2 grouped -> Q4_0 (no 2-bit legacy block type exists in
    llama.cpp), else Q4_0/Q4_1 by zero_point.  Embeddings export F16,
    norms/biases F32, output.weight Q8_0 (lossless-ish head like
    llama.cpp's high-precision head defaults).  Returns a summary dict.
    """
    if cfg.num_experts > 0 and arch == "llama" \
            and cfg.moe_shared_intermediate_size > 0:
        # shared-expert family: the reader keys routing behavior off the
        # architecture string (convert/gguf.model_config_from_gguf)
        arch = "qwen2moe"
    if wtype == "auto":
        if cfg.quant.mode == "w_a8":
            wtype = "TQ2_0"
        elif cfg.quant.bits == 8:
            wtype = "Q8_0"
        elif cfg.quant.bits == 4 and cfg.quant.zero_point:
            wtype = "Q4_1"
        else:
            wtype = "Q4_0"
    wt = WTYPE_BY_NAME[wtype]

    md: Dict[str, Any] = {
        "general.architecture": arch,
        "general.name": cfg.name,
        f"{arch}.embedding_length": int(cfg.hidden_size),
        f"{arch}.block_count": int(cfg.num_layers),
        f"{arch}.attention.head_count": int(cfg.num_heads),
        f"{arch}.attention.head_count_kv": int(cfg.num_kv_heads),
        f"{arch}.attention.key_length": int(cfg.head_dim),
        f"{arch}.vocab_size": int(cfg.vocab_size),
        f"{arch}.rope.freq_base": float(cfg.rope_theta),
        f"{arch}.attention.layer_norm_rms_epsilon": float(cfg.rms_norm_eps),
        f"{arch}.context_length": int(cfg.max_position_embeddings),
    }
    if cfg.sliding_window > 0:
        md[f"{arch}.attention.sliding_window"] = int(cfg.sliding_window)
    # feed_forward_length from the actual tensors (init_params may pad the
    # configured intermediate size to the lane multiple)
    l0 = params["layers"][0]
    if cfg.num_experts > 0:
        md[f"{arch}.feed_forward_length"] = int(
            l0["experts_down"].kdim)
        md[f"{arch}.expert_count"] = int(cfg.num_experts)
        md[f"{arch}.expert_used_count"] = int(cfg.num_experts_per_tok)
        md[f"{arch}.expert_feed_forward_length"] = int(
            l0["experts_down"].kdim)
        if "shared_down" in l0:
            md[f"{arch}.expert_shared_feed_forward_length"] = int(
                l0["shared_down"].kdim)
    else:
        md[f"{arch}.feed_forward_length"] = int(l0["down"].kdim)

    rope_freqs = None
    if cfg.rope_scaling is not None:
        kind = cfg.rope_scaling[0]
        if kind in ("factors", "llama3"):
            # store as the per-dim divisor tensor llama.cpp uses for
            # llama-3.1-style scaling (rope_freqs.weight)
            from tmac_tpu.models.llama import _scaled_inv_freqs
            base, _ = _scaled_inv_freqs(cfg.head_dim, cfg.rope_theta, None)
            scaled, _ = _scaled_inv_freqs(cfg.head_dim, cfg.rope_theta,
                                          cfg.rope_scaling)
            rope_freqs = (base / scaled).astype(np.float32)
        elif kind == "linear":
            md[f"{arch}.rope.scaling.type"] = "linear"
            md[f"{arch}.rope.scaling.factor"] = float(cfg.rope_scaling[1])
        elif kind == "yarn":
            md[f"{arch}.rope.scaling.type"] = "yarn"
            md[f"{arch}.rope.scaling.factor"] = float(cfg.rope_scaling[1])
            md[f"{arch}.rope.scaling.original_context_length"] = int(
                cfg.rope_scaling[2])

    # embedded tokenizer rides along when the checkpoint has one
    if ckpt_dir is not None:
        from tmac_tpu.runtime.tokenizer import load_tokenizer
        tok = load_tokenizer(ckpt_dir)
        if tok is not None:
            md["tokenizer.ggml.model"] = tok.MODEL
            md["tokenizer.ggml.tokens"] = tok.tokens
            md["tokenizer.ggml.token_type"] = [int(t) for t in
                                               tok.token_types]
            if tok.MODEL == "llama":
                md["tokenizer.ggml.scores"] = [float(s) for s in tok.scores]
                md["tokenizer.ggml.add_space_prefix"] = bool(
                    tok.add_space_prefix)
            else:
                md["tokenizer.ggml.merges"] = tok.merges
            if tok.bos_token_id is not None:
                md["tokenizer.ggml.bos_token_id"] = int(tok.bos_token_id)
            if tok.eos_token_id is not None:
                md["tokenizer.ggml.eos_token_id"] = int(tok.eos_token_id)
            if tok.unk_token_id is not None:
                md["tokenizer.ggml.unknown_token_id"] = int(tok.unk_token_id)
            md["tokenizer.ggml.add_bos_token"] = bool(tok.add_bos)
            if tok.chat_template:
                md["tokenizer.chat_template"] = tok.chat_template

    # gguf stores weights as (rows=out_features, cols=in_features); the
    # framework's (K, M) is (in, out) -> transpose on the way out
    tensors: Dict[str, tuple] = {
        "token_embd.weight": (gg.GGML_F16, _f32(params["embed"])),
        "output_norm.weight": (gg.GGML_F32, _f32(params["final_norm"])),
    }
    if rope_freqs is not None:
        tensors["rope_freqs.weight"] = (gg.GGML_F32, rope_freqs)
    if "lm_head" in params:
        head = params["lm_head"]
        head_f = qt_to_float(head) if hasattr(head, "packed") else _f32(head)
        tensors["output.weight"] = (gg.GGML_Q8_0, head_f.T)

    for i, layer in enumerate(params["layers"]):
        p = f"blk.{i}"
        tensors[f"{p}.attn_norm.weight"] = (gg.GGML_F32,
                                            _f32(layer["attn_norm"]))
        tensors[f"{p}.ffn_norm.weight"] = (gg.GGML_F32,
                                           _f32(layer["mlp_norm"]))
        q, k, v = split_fused(layer["wqkv"], qt_to_float(layer["wqkv"]))
        matmuls = [("attn_q", q), ("attn_k", k), ("attn_v", v),
                   ("attn_output", qt_to_float(layer["wo"]))]
        if cfg.num_experts > 0:
            from tmac_tpu.models.moe import expert_view, num_local_experts
            # router (H, E) -> gguf (E, H) rows
            tensors[f"{p}.ffn_gate_inp.weight"] = (
                gg.GGML_F32, _f32(layer["moe_router"]).T)
            E = num_local_experts(layer["experts_gate_up"])
            gates, ups, downs = [], [], []
            for e in range(E):
                gu = expert_view(layer["experts_gate_up"], e)
                ge, ue = split_fused(gu, qt_to_float(gu))
                gates.append(ge.T)
                ups.append(ue.T)
                downs.append(qt_to_float(
                    expert_view(layer["experts_down"], e)).T)
            # llama.cpp 3-D stacked expert layout: ne=[in, out, E]
            tensors[f"{p}.ffn_gate_exps.weight"] = (wt, np.stack(gates))
            tensors[f"{p}.ffn_up_exps.weight"] = (wt, np.stack(ups))
            tensors[f"{p}.ffn_down_exps.weight"] = (wt, np.stack(downs))
            if "shared_down" in layer:
                sg, su = split_fused(layer["shared_gate_up"],
                                     qt_to_float(layer["shared_gate_up"]))
                matmuls += [("ffn_gate_shexp", sg), ("ffn_up_shexp", su),
                            ("ffn_down_shexp",
                             qt_to_float(layer["shared_down"]))]
                if "shared_gate" in layer:
                    tensors[f"{p}.ffn_gate_inp_shexp.weight"] = (
                        gg.GGML_F32,
                        _f32(layer["shared_gate"]).reshape(1, -1))
        else:
            gate, up = split_fused(layer["gate_up"],
                                   qt_to_float(layer["gate_up"]))
            matmuls += [("ffn_gate", gate), ("ffn_up", up),
                        ("ffn_down", qt_to_float(layer["down"]))]
        for name, w in matmuls:
            tensors[f"{p}.{name}.weight"] = (wt, w.T)
        for ours, gname in (("bq", "attn_q"), ("bk", "attn_k"),
                            ("bv", "attn_v")):
            if ours in layer:
                tensors[f"{p}.{gname}.bias"] = (gg.GGML_F32,
                                                _f32(layer[ours]))

    gg.write_gguf(path, md, tensors)
    return {"path": path, "wtype": wtype, "tensors": len(tensors),
            "bytes": os.path.getsize(path)}
