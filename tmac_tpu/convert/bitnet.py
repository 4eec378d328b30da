"""BitNet b1.58 weight quantization (W1.58A8).

The 1bitLLM/bitnet_b1_58-* and microsoft/BitNet checkpoints store
full-precision master weights; the ternary quantization is defined by the
BitNet b1.58 recipe (absmean):

    gamma = mean(|W|)
    Wq    = RoundClip(W / gamma, -1, 1)      in {-1, 0, +1}
    Wdq   = Wq * gamma

This is the reference's m_groups=1 "BitNet-like unified scales" mode
(ops/qgemm.py:57-60); stored here as biased uint8 {0,1,2} with mid=2 under
bits=2 and per-tensor scale, which routes qgemm onto the exact-int32 MXU
path (the do_scale_final analog).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def quantize_bitnet(w_km: np.ndarray, k_shards: int = 1) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(K, M) float master weights -> (wq uint8 {0,1,2}, scales, sub).

    scales/sub rows = k_shards (one per K-shard; identical values) so the
    tensor k-shards cleanly under tensor parallelism.
    """
    K, M = w_km.shape
    from tmac_tpu import native
    if native.available() and w_km.size >= (1 << 20):
        return native.quantize_bitnet(np.asarray(w_km, np.float32), k_shards)
    gamma = np.mean(np.abs(w_km)).astype(np.float32)
    gamma = max(float(gamma), 1e-8)
    wq = np.clip(np.rint(w_km / gamma), -1, 1).astype(np.int8)
    wq = (wq + 2).astype(np.uint8)  # biased: mid = 2 for bits=2
    scales = np.full((k_shards, M), gamma, np.float32)
    sub = 2.0 * scales
    return wq, scales, sub


def is_ternary(w: np.ndarray, tol: float = 0.0) -> bool:
    """True if the tensor is already exactly ternary * scale (pre-quantized
    checkpoints like 1bitLLM's tq variants)."""
    u = np.unique(w)
    if u.size > 3:
        return False
    nz = u[u != 0]
    if nz.size == 0:
        return True
    return np.allclose(np.abs(nz), np.abs(nz[0]), atol=tol)
