"""TPU device registry -- the reference platform.py analog
(python/t_mac/platform.py:75-158 maps device -> TVM target/dtypes/eval
params; here: device kind -> hardware constants for roofline/SoL math and
tiling heuristics).

Numbers are public spec sheets (per chip, not per host):
  v4:  275 TFLOPs bf16, 1228 GB/s HBM, 32 GB
  v5e: 197 TFLOPs bf16 / 394 TOPS int8, 819 GB/s, 16 GB
  v5p: 459 TFLOPs bf16, 2765 GB/s, 95 GB
  v6e: 918 TFLOPs bf16 / 1836 TOPS int8, 1640 GB/s, 32 GB
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class DeviceSpec:
    kind: str
    hbm_gbps: float            # HBM bandwidth, GB/s
    bf16_tflops: float         # MXU peak, bf16
    int8_tops: float           # MXU peak, int8
    hbm_gib: float             # capacity
    vmem_mib: float = 16.0     # per-core VMEM (~128 MiB on v5p+; 16 typical)
    ici_gbps: float = 0.0      # per-link ICI bandwidth (one direction)


_REGISTRY = {
    "TPU v4": DeviceSpec("TPU v4", 1228.0, 275.0, 275.0, 32.0, 16.0, 50.0),
    "TPU v5 lite": DeviceSpec("TPU v5 lite", 819.0, 197.0, 394.0, 16.0, 16.0, 50.0),
    "TPU v5": DeviceSpec("TPU v5", 2765.0, 459.0, 918.0, 95.0, 16.0, 100.0),
    "TPU v6 lite": DeviceSpec("TPU v6 lite", 1640.0, 918.0, 1836.0, 32.0, 16.0, 100.0),
}

_FALLBACK = _REGISTRY["TPU v5 lite"]


def device_spec(kind: Optional[str] = None) -> DeviceSpec:
    """Spec for the given (or current) device kind; v5e fallback."""
    if kind is None:
        import jax
        try:
            kind = jax.devices()[0].device_kind
        except Exception:  # noqa: BLE001
            return _FALLBACK
    for name, spec in _REGISTRY.items():
        if kind.startswith(name):
            return spec
    return dataclasses.replace(_FALLBACK, kind=kind)


def decode_speed_of_light_tps(model_bytes_per_token: float,
                              kind: Optional[str] = None) -> float:
    """Upper bound on single-stream decode tokens/s: every weight byte is
    read once per token from HBM."""
    return device_spec(kind).hbm_gbps * 1e9 / model_bytes_per_token
