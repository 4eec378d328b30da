"""Persisted tile-configuration table for the Pallas mpGEMM kernel.

The kcfg.ini analog (reference deploy/compile.py:156-165 writes bm/kfactor
per shape after autotvm tuning; tmac_gemm_wrapper.h:230-255 reads it back).
Here the tunable is block_m; the table is JSON keyed by device kind and
kernel signature, written by tools/autotune.py and consulted by
qgemm_kernel._pick_block_m before falling back to the static heuristic.

Lookup order: $TMAC_TUNE_TABLE, then <repo>/tuned/tune_table.json.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Optional

_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                             os.pardir, "tuned", "tune_table.json")

_lock = threading.Lock()
_table: Optional[dict] = None
_device_kind: Optional[str] = None


def table_path() -> str:
    return os.environ.get("TMAC_TUNE_TABLE", os.path.abspath(_DEFAULT_PATH))


def _load() -> dict:
    global _table
    with _lock:
        if _table is None:
            try:
                with open(table_path()) as f:
                    _table = json.load(f)
            except (OSError, json.JSONDecodeError):
                _table = {}
        return _table


def _device() -> str:
    global _device_kind
    if _device_kind is None:
        import jax
        try:
            _device_kind = jax.devices()[0].device_kind.replace(" ", "_")
        except Exception:  # noqa: BLE001
            _device_kind = "unknown"
    return _device_kind


def key(bits: int, K: int, Mp: int, N: int, gs: int, path: str) -> str:
    """path: 'int' (int8 x, per-tensor), 'grouped' (int8-quantized acts),
    'native' (float acts)."""
    return f"b{bits}_k{K}_m{Mp}_n{N}_g{gs}_{path}"


def lookup_block_m(bits: int, K: int, Mp: int, N: int, gs: int,
                   path: str) -> int:
    """Tuned block_m for this kernel signature, or 0 (use heuristic)."""
    t = _load().get(_device(), {})
    e = t.get(key(bits, K, Mp, N, gs, path))
    return int(e["block_m"]) if e else 0


def lookup_dispatch(bits: int, K: int, Mp: int, N: int, gs: int,
                    mode: str):
    """Measured kernel-path choice for large-N grouped shapes, or None.

    mode: 'float' (external activations) or 'fused' (in-kernel prologue).
    Returns 'chunk' (per-group int8 dots) or 'dequant' (bf16 dequant
    scratch + one dot) -- the two paths trade MXU rate against VPU work
    and which one wins is shape-dependent (measured on v5e: chunk wins
    256x4096x4096 b4 at 33 vs 95 us, dequant wins 256x4096x11008 at 123
    vs 161 us)."""
    t = _load().get(_device(), {})
    e = t.get(key(bits, K, Mp, N, gs, f"dispatch-{mode}"))
    return e.get("path") if e else None


def record_dispatch(bits: int, K: int, Mp: int, N: int, gs: int, mode: str,
                    path: str, us: float):
    record(bits, K, Mp, N, gs, f"dispatch-{mode}", 0, us, kernel_path=path)


def record(bits: int, K: int, Mp: int, N: int, gs: int, path: str,
           block_m: int, us: float, kernel_path: str = None) -> bool:
    """Write one tuning result through to the table file.

    Keep-if-better: a re-tune that measures a DIFFERENT config slower than
    the recorded one does not evict it (a noisy later run once replaced a
    5.68 us block_m=1024 entry with a 6.41 us block_m=384 pick).  A re-tune
    of the SAME config refreshes its time (the kernel may have changed).
    Set TMAC_TUNE_OVERWRITE=1 to force (e.g. after a kernel rewrite that
    invalidates old timings).  Returns True if the table was updated."""
    global _table
    path_choice = kernel_path
    with _lock:
        p = table_path()
        try:
            with open(p) as f:
                t = json.load(f)
        except (OSError, json.JSONDecodeError):
            t = {}
        dev = t.setdefault(_device(), {})
        entry = {"block_m": block_m, "us": round(us, 2)}
        if path_choice:
            entry["path"] = path_choice
        k = key(bits, K, Mp, N, gs, path)
        old = dev.get(k)
        same_cfg = old is not None and old.get("block_m") == block_m \
            and old.get("path") == entry.get("path")
        if old is not None and not same_cfg \
                and os.environ.get("TMAC_TUNE_OVERWRITE", "") != "1" \
                and old.get("us", float("inf")) <= us:
            return False
        dev[k] = entry
        os.makedirs(os.path.dirname(p), exist_ok=True)
        # Atomic replace: a crash mid-write must not leave a truncated file
        # (which _load would silently treat as an empty table), and
        # concurrent writers on a shared filesystem each land a complete
        # snapshot instead of interleaved bytes.
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(t, f, indent=1, sort_keys=True)
        os.replace(tmp, p)
        _table = t
        return True


def invalidate_cache():
    global _table
    with _lock:
        _table = None
