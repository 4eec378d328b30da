"""Packed-checkpoint save/load -- the replacement for the reference's
gguf INT_N embedding + kcfg.ini contract (reference tools/run_pipeline.py
step 3, python/t_mac/model_utils.py:243-271, deploy/compile.py:156-165).

Format: a directory with
  config.json            ModelConfig + per-tensor quantization meta
  weights.safetensors    flat dict of arrays (packed bit-fields, scales,
                         norms, embeddings), zero-copy mmap on load
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from safetensors.numpy import load_file, save_file

from tmac_tpu.models.config import ModelConfig
from tmac_tpu.ops.qgemm import QuantizedTensor

_FORMAT_VERSION = 1


def _flatten(params, prefix="", arrays=None, meta=None):
    arrays = {} if arrays is None else arrays
    meta = {} if meta is None else meta
    if isinstance(params, QuantizedTensor):
        arrays[prefix + ".packed"] = np.asarray(params.packed)
        if params.packed_hi is not None:
            arrays[prefix + ".packed_hi"] = np.asarray(params.packed_hi)
        arrays[prefix + ".scales"] = np.asarray(params.scales)
        arrays[prefix + ".sub"] = np.asarray(params.sub)
        meta[prefix] = {
            "bits": params.bits,
            "group_size": params.group_size,
            "k_shards": params.k_shards,
            "m_shards": params.m_shards,
            "shape": list(params.shape),
        }
        if params.m_segments is not None:
            meta[prefix]["m_segments"] = [list(s) for s in params.m_segments]
    elif isinstance(params, dict):
        for k, v in params.items():
            _flatten(v, f"{prefix}.{k}" if prefix else k, arrays, meta)
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            _flatten(v, f"{prefix}.{i}", arrays, meta)
    elif params is not None:
        a = np.asarray(params)
        if a.dtype == jnp.bfloat16:
            arrays[prefix] = a.view(np.uint16)
            meta[prefix] = {"dtype": "bfloat16"}
        else:
            arrays[prefix] = a
    return arrays, meta


def save_checkpoint(path: str, cfg: ModelConfig, params: Dict[str, Any]):
    os.makedirs(path, exist_ok=True)
    arrays, meta = _flatten(params)
    save_file(arrays, os.path.join(path, "weights.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({
            "format_version": _FORMAT_VERSION,
            "model": json.loads(cfg.to_json()),
            "tensors": meta,
        }, f, indent=1)


def load_checkpoint(path: str, device_put: bool = True):
    """Returns (cfg, params)."""
    with open(os.path.join(path, "config.json")) as f:
        blob = json.load(f)
    assert blob["format_version"] == _FORMAT_VERSION
    cfg = ModelConfig.from_json(json.dumps(blob["model"]))
    arrays = load_file(os.path.join(path, "weights.safetensors"))
    meta = blob["tensors"]

    def _get(name):
        a = arrays[name]
        m = meta.get(name, {})
        if m.get("dtype") == "bfloat16":
            a = a.view(jnp.bfloat16)
        return jnp.asarray(a) if device_put else a

    # rebuild the nested pytree from flat keys
    root: Dict[str, Any] = {}
    qt_prefixes = {k for k, v in meta.items() if "bits" in v}

    def _insert(tree, keys, value):
        k = keys[0]
        if k.isdigit():
            k = int(k)
        if len(keys) == 1:
            tree[k] = value
            return
        if k not in tree:
            tree[k] = {}
        _insert(tree[k], keys[1:], value)

    done = set()
    for name in arrays:
        base = name.rsplit(".", 1)[0]
        if base in qt_prefixes:
            if base in done:
                continue
            done.add(base)
            m = meta[base]
            qt = QuantizedTensor(
                packed=_get(base + ".packed"),
                packed_hi=_get(base + ".packed_hi") if base + ".packed_hi" in arrays else None,
                scales=_get(base + ".scales"),
                sub=_get(base + ".sub"),
                bits=m["bits"],
                group_size=m["group_size"],
                k_shards=m["k_shards"],
                m_shards=m["m_shards"],
                shape=tuple(m["shape"]),
                m_segments=tuple(tuple(s) for s in m["m_segments"])
                if "m_segments" in m else None,
            )
            _insert(root, base.split("."), qt)
        else:
            _insert(root, name.split("."), _get(name))

    # convert integer-keyed dicts (list indices) back to lists
    def _listify(tree):
        if isinstance(tree, dict):
            if tree and all(isinstance(k, int) for k in tree):
                return [_listify(tree[i]) for i in range(len(tree))]
            return {k: _listify(v) for k, v in tree.items()}
        return tree

    return cfg, _listify(root)
