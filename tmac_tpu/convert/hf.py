"""HuggingFace checkpoint -> tmac-tpu packed params.

The converter role of the reference's `convert_hf_to_gguf.py --enable-t-mac`
step (tools/run_pipeline.py:139-175) + `preprocess_for_t_mac`
(model_utils.py:243-271): reads a HF model directory (safetensors), unpacks
GPTQ / quantizes BitNet / quantizes fp weights, and packs everything into
QuantizedTensors ready for (optionally tensor-parallel) inference.

Supported input formats:
  * GPTQ / GPTQModel / EfficientQAT int-packed (qweight/qzeros/scales)
  * BitNet b1.58 full-precision master weights (absmean ternarization)
  * plain fp16/bf16/fp32 weights (quantized on the fly at --bits)
"""

from __future__ import annotations

import dataclasses
import json
import os
from glob import glob
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from tmac_tpu.convert.bitnet import quantize_bitnet
from tmac_tpu.convert.gptq import unpack_gptq
from tmac_tpu.models.config import ModelConfig, QuantConfig
from tmac_tpu.models.llama import padded_intermediate
from tmac_tpu.ops.packing import quantize_weights
from tmac_tpu.ops.qgemm import QuantizedTensor, fuse_m


class HFReader:
    """Lazy tensor reader over a HF model dir (sharded safetensors)."""

    def __init__(self, model_dir: str):
        self.dir = model_dir
        from safetensors import safe_open
        self._safe_open = safe_open
        self.tensor_index: Dict[str, str] = {}
        idx = os.path.join(model_dir, "model.safetensors.index.json")
        if os.path.exists(idx):
            with open(idx) as f:
                self.tensor_index = json.load(f)["weight_map"]
        else:
            for path in sorted(glob(os.path.join(model_dir, "*.safetensors"))):
                with safe_open(path, framework="np") as f:
                    for name in f.keys():
                        self.tensor_index[name] = os.path.basename(path)
        self._handles: Dict[str, Any] = {}

    def __contains__(self, name: str) -> bool:
        return name in self.tensor_index

    def get(self, name: str) -> np.ndarray:
        fname = self.tensor_index[name]
        if fname not in self._handles:
            self._handles[fname] = self._safe_open(
                os.path.join(self.dir, fname), framework="np")
        t = self._handles[fname].get_tensor(name)
        return t

    def keys(self):
        return self.tensor_index.keys()


def read_hf_config(model_dir: str) -> dict:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


def _rope_scaling_from_hf(hf: dict):
    """HF config.json rope_scaling -> ModelConfig.rope_scaling tuple
    (llama-3.1 "llama3", longrope-less "linear"/"yarn"; None otherwise)."""
    rs = hf.get("rope_scaling") or None
    if not rs:
        return None
    t = rs.get("rope_type") or rs.get("type")
    if t in (None, "default"):
        return None
    if t == "linear":
        return ("linear", float(rs["factor"]))
    if t == "llama3":
        return ("llama3", float(rs["factor"]),
                int(rs.get("original_max_position_embeddings", 8192)),
                float(rs.get("low_freq_factor", 1.0)),
                float(rs.get("high_freq_factor", 4.0)))
    if t == "yarn":
        return ("yarn", float(rs["factor"]),
                int(rs.get("original_max_position_embeddings", 4096)))
    raise NotImplementedError(f"rope_scaling type {t!r}")


def model_config_from_hf(hf: dict, quant: QuantConfig, name: str = "hf-model") -> ModelConfig:
    head_dim = hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"]
    # MoE (Mixtral: num_local_experts + top-k routing; Qwen2-MoE:
    # num_experts + moe_intermediate_size + an always-on gated shared
    # expert + norm_topk_prob=False routing)
    num_experts = hf.get("num_local_experts") or hf.get("num_experts") or 0
    shared = hf.get("shared_expert_intermediate_size", 0) if num_experts \
        else 0
    return ModelConfig(
        num_experts=num_experts,
        num_experts_per_tok=hf.get("num_experts_per_tok", 2),
        moe_intermediate_size=(hf.get("moe_intermediate_size")
                               or hf["intermediate_size"])
        if num_experts else 0,
        # default per architecture, matching HF's config classes: Mixtral
        # always renormalizes; Qwen2MoeConfig defaults norm_topk_prob to
        # FALSE -- a checkpoint whose config omits the key must not
        # silently convert with the wrong routing
        moe_norm_topk=bool(hf.get(
            "norm_topk_prob", hf.get("model_type") != "qwen2_moe")),
        moe_shared_intermediate_size=shared,
        moe_shared_gate=bool(shared)
        and hf.get("model_type") == "qwen2_moe",
        name=name,
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=head_dim,
        rope_theta=hf.get("rope_theta", 10000.0),
        max_position_embeddings=int(
            hf.get("max_position_embeddings", 4096)),
        rope_scaling=_rope_scaling_from_hf(hf),
        # qwen2 carries sliding_window but gates it behind
        # use_sliding_window (default False) AND applies it only to
        # layers >= max_window_layers (default == num layers, i.e. never).
        # ModelConfig has one global window, so honor it only when it
        # covers EVERY layer (max_window_layers == 0); the common
        # configs (use_sliding_window false, or mwl >= layers) correctly
        # resolve to full attention.  mistral/phi-3 set sliding_window
        # unconditionally and carry no max_window_layers key.
        sliding_window=int(hf.get("sliding_window") or 0)
        if (hf.get("use_sliding_window", True)
            and ("max_window_layers" not in hf
                 or int(hf["max_window_layers"] or 0) == 0)) else 0,
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        attention_bias=hf.get("attention_bias", False)
        or str(hf.get("model_type", "")).startswith("qwen2"),
        quant=quant,
    )


def quant_config_from_hf(hf: dict, mode_hint: Optional[str] = None) -> Optional[QuantConfig]:
    """Read HF quantization_config (cf. reference get_quantization_config,
    model_utils.py:219-240, incl. the desc_act=False assert)."""
    qc = hf.get("quantization_config")
    if qc is None:
        return None
    if qc.get("quant_method") == "awq":
        # AutoAWQ: w_bit/q_group_size naming, always zero-point affine;
        # only the 'gemm' packing is implemented (gemv interleaves
        # differently and is refused rather than mis-read)
        version = str(qc.get("version", "gemm")).lower()
        assert version == "gemm", f"AWQ version {version!r} unsupported"
        return QuantConfig(
            bits=int(qc.get("bits", qc.get("w_bit", 4))),
            group_size=int(qc.get("group_size", qc.get("q_group_size", 128))),
            zero_point=bool(qc.get("zero_point", True)),
            mode=mode_hint or "w_fp",
        ), "awq"
    assert not qc.get("desc_act", False), "act-order (desc_act) not supported"
    fmt = qc.get("checkpoint_format", "gptq")
    return QuantConfig(
        bits=qc["bits"],
        group_size=qc["group_size"],
        zero_point=not qc.get("sym", False),
        mode=mode_hint or "w_fp",
    ), fmt


def _qt_from_hf_linear(reader: HFReader, prefix: str, quant: QuantConfig,
                       fmt, k_shards: int, m_shards: int,
                       pad_k: int = 0, pad_m: int = 0) -> QuantizedTensor:
    """Convert one linear layer; prefix like 'model.layers.0.self_attn.q_proj'.

    fmt: packed-checkpoint format -- 'gptq' / 'gptq_v2' / 'awq' (also
    accepts the legacy bool, True == gptq_v2)."""
    if f"{prefix}.qweight" in reader:
        if fmt == "awq":
            from tmac_tpu.convert.gptq import unpack_awq
            wq, scales, sub, bits, gs = unpack_awq(
                reader.get(f"{prefix}.qweight").view(np.int32),
                reader.get(f"{prefix}.scales"),
                reader.get(f"{prefix}.qzeros").view(np.int32),
            )
        else:
            wq, scales, sub, bits, gs = unpack_gptq(
                reader.get(f"{prefix}.qweight").view(np.int32),
                reader.get(f"{prefix}.scales"),
                reader.get(f"{prefix}.qzeros").view(np.int32),
                gptq_v2=(fmt is True or fmt == "gptq_v2"),
            )
        assert bits == quant.bits and gs == quant.group_size, (
            (bits, gs), (quant.bits, quant.group_size))
    else:
        # fp weights, HF layout (M, K) -> kernel layout (K, M)
        w = reader.get(f"{prefix}.weight")
        if w.dtype == np.uint16:  # bf16 stored raw
            w = w.view(jnp.bfloat16)
        w = np.asarray(w, dtype=np.float32).T
        if quant.mode == "w_a8":
            wq, scales, sub = quantize_bitnet(w, k_shards=k_shards)
            gs = w.shape[0] // k_shards
            bits = 2
        else:
            gs = quant.group_size if quant.group_size != -1 else w.shape[0]
            wq, scales, sub = quantize_weights(w, quant.bits, gs, quant.zero_point)
            bits = quant.bits

    if pad_k and wq.shape[0] < pad_k:
        d = pad_k - wq.shape[0]
        wq = np.pad(wq, ((0, d), (0, 0)))
        if scales.shape[0] > k_shards or quant.mode != "w_a8":
            gp = pad_k // gs - scales.shape[0]
            if gp > 0:
                scales = np.pad(scales, ((0, gp), (0, 0)))
                sub = np.pad(sub, ((0, gp), (0, 0)))
    if pad_m and wq.shape[1] < pad_m:
        d = pad_m - wq.shape[1]
        wq = np.pad(wq, ((0, 0), (0, d)))
        scales = np.pad(scales, ((0, 0), (0, d)))
        sub = np.pad(sub, ((0, 0), (0, d)))

    # bf16 scales for grouped modes (reference stores fp16 scales too);
    # per-tensor (BitNet) stays f32 -- exactness at zero traffic cost
    grouped = quant.mode != "w_a8" and gs < wq.shape[0]
    return QuantizedTensor.from_quantized(
        wq, scales, sub, bits=bits,
        group_size=gs if quant.mode != "w_a8" else wq.shape[0] // k_shards,
        k_shards=k_shards, m_shards=m_shards,
        scale_dtype=jnp.bfloat16 if grouped else jnp.float32)


def _bf16(reader: HFReader, name: str) -> jnp.ndarray:
    t = reader.get(name)
    if t.dtype == np.uint16:
        t = t.view(jnp.bfloat16)
    return jnp.asarray(t, dtype=jnp.bfloat16)


def convert_hf_model(model_dir: str, quant: Optional[QuantConfig] = None,
                     tp: int = 1, gptq_v2: Optional[bool] = None,
                     name: str = "hf-model"):
    """Full conversion: HF dir -> (ModelConfig, params pytree).

    quant: required for fp checkpoints; inferred from quantization_config
    for GPTQ checkpoints. tp: pack for tp-way tensor parallelism.
    """
    hf = read_hf_config(model_dir)
    reader = HFReader(model_dir)

    inferred = quant_config_from_hf(hf)
    fmt = None
    if inferred is not None:
        qc, fmt = inferred
        if quant is not None:
            qc = dataclasses.replace(qc, mode=quant.mode)
        quant = qc
    assert quant is not None, "fp checkpoint needs an explicit QuantConfig"
    if gptq_v2 is not None and fmt != "awq":  # explicit override (legacy)
        fmt = "gptq_v2" if gptq_v2 else "gptq"
    if fmt is None:
        fmt = "gptq_v2"

    cfg = model_config_from_hf(hf, quant, name=name)
    H = cfg.hidden_size
    Ipad = padded_intermediate(cfg, tp)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        at = f"{p}.self_attn"
        layer = {
            "attn_norm": _bf16(reader, f"{p}.input_layernorm.weight"),
            "mlp_norm": _bf16(reader, f"{p}.post_attention_layernorm.weight"),
            "wqkv": fuse_m([
                _qt_from_hf_linear(reader, f"{at}.q_proj", quant, fmt, 1, tp),
                _qt_from_hf_linear(reader, f"{at}.k_proj", quant, fmt, 1, tp),
                _qt_from_hf_linear(reader, f"{at}.v_proj", quant, fmt, 1, tp),
            ]),
            "wo": _qt_from_hf_linear(reader, f"{at}.o_proj", quant, fmt, tp, 1),
        }
        if cfg.num_experts > 0:
            # Mixtral (block_sparse_moe, w1/w3/w2, softmax over selected)
            # or Qwen2-MoE (mlp.experts.{e}.gate/up/down_proj, all-expert
            # softmax + gated shared expert -- both routing forms live in
            # models/moe.route_topk via cfg.moe_norm_topk).  DeepSeek's
            # grouped routing (mlp.shared_experts, plural) differs and is
            # refused rather than silently mis-converted.
            if f"{p}.mlp.shared_experts.gate_proj.weight" in reader:
                raise NotImplementedError(
                    "DeepSeek-style grouped-routing MoE checkpoints are "
                    "not supported")
            from tmac_tpu.models.llama import padded_moe_intermediate
            from tmac_tpu.models.moe import stack_experts
            Iep = padded_moe_intermediate(cfg, tp)
            if f"{p}.block_sparse_moe.gate.weight" in reader:
                moe, gname = f"{p}.block_sparse_moe", "gate"
                names = ("w1", "w3", "w2")
            else:
                # Qwen2-MoE-style per-expert gate/up/down_proj naming
                moe, gname = f"{p}.mlp", "gate"
                names = ("gate_proj", "up_proj", "down_proj")
            router = np.asarray(_bf16(reader, f"{moe}.{gname}.weight"),
                                np.float32).T  # HF (E, H) -> (H, E)
            layer["moe_router"] = jnp.asarray(router, jnp.bfloat16)
            gn, un, dn = names
            layer["experts_gate_up"] = stack_experts([
                fuse_m([
                    _qt_from_hf_linear(reader, f"{moe}.experts.{e}.{gn}",
                                       quant, fmt, 1, tp, pad_m=Iep),
                    _qt_from_hf_linear(reader, f"{moe}.experts.{e}.{un}",
                                       quant, fmt, 1, tp, pad_m=Iep),
                ]) for e in range(cfg.num_experts)
            ])
            layer["experts_down"] = stack_experts([
                _qt_from_hf_linear(reader, f"{moe}.experts.{e}.{dn}",
                                   quant, fmt, tp, 1, pad_k=Iep)
                for e in range(cfg.num_experts)
            ])
            if cfg.moe_shared_intermediate_size:
                from tmac_tpu.models.llama import _padded_ffn_width
                Isp = _padded_ffn_width(cfg.moe_shared_intermediate_size,
                                        cfg, tp)
                se = f"{p}.mlp.shared_expert"
                layer["shared_gate_up"] = fuse_m([
                    _qt_from_hf_linear(reader, f"{se}.gate_proj", quant,
                                       fmt, 1, tp, pad_m=Isp),
                    _qt_from_hf_linear(reader, f"{se}.up_proj", quant,
                                       fmt, 1, tp, pad_m=Isp),
                ])
                layer["shared_down"] = _qt_from_hf_linear(
                    reader, f"{se}.down_proj", quant, fmt, tp, 1,
                    pad_k=Isp)
                sg = f"{p}.mlp.shared_expert_gate.weight"
                if cfg.moe_shared_gate and sg in reader:
                    layer["shared_gate"] = jnp.asarray(
                        _bf16(reader, sg)).reshape(-1)  # (1, H) -> (H,)
        else:
            layer["gate_up"] = fuse_m([
                _qt_from_hf_linear(reader, f"{p}.mlp.gate_proj", quant,
                                   fmt, 1, tp, pad_m=Ipad),
                _qt_from_hf_linear(reader, f"{p}.mlp.up_proj", quant,
                                   fmt, 1, tp, pad_m=Ipad),
            ])
            layer["down"] = _qt_from_hf_linear(reader, f"{p}.mlp.down_proj",
                                               quant, fmt, tp, 1,
                                               pad_k=Ipad)
        if cfg.attention_bias:
            for hf_b, ours in (("q_proj", "bq"), ("k_proj", "bk"), ("v_proj", "bv")):
                bn = f"{at}.{hf_b}.bias"
                if bn in reader:
                    layer[ours] = _bf16(reader, bn)
        layers.append(layer)

    params: Dict[str, Any] = {
        "embed": _bf16(reader, "model.embed_tokens.weight"),
        "layers": layers,
        "final_norm": _bf16(reader, "model.norm.weight"),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in reader:
        from tmac_tpu.models.llama import make_head
        head = np.asarray(_bf16(reader, "lm_head.weight"), np.float32).T  # (H, V)
        params["lm_head"] = make_head(head, cfg)
    return cfg, params
