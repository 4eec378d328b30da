"""Tune-table persistence and kernel consultation (CPU; no real sweep)."""

import json
import os

import jax.numpy as jnp
import numpy as np

from tmac_tpu.ops.pallas import tune_table
from tmac_tpu.ops.pallas.qgemm_kernel import qgemm_pallas
from tmac_tpu.ops.qgemm import QuantizedTensor
from tmac_tpu.tools.autotune import candidates
from tmac_tpu.utils import nmse


def test_record_and_lookup(tmp_path, monkeypatch):
    monkeypatch.setenv("TMAC_TUNE_TABLE", str(tmp_path / "t.json"))
    tune_table.invalidate_cache()
    assert tune_table.lookup_block_m(2, 512, 256, 1, 128, "grouped") == 0
    tune_table.record(2, 512, 256, 1, 128, "grouped", 128, 12.3)
    tune_table.invalidate_cache()
    assert tune_table.lookup_block_m(2, 512, 256, 1, 128, "grouped") == 128
    with open(tmp_path / "t.json") as f:
        blob = json.load(f)
    (dev,) = blob.keys()
    assert blob[dev]["b2_k512_m256_n1_g128_grouped"]["block_m"] == 128
    tune_table.invalidate_cache()


def test_kernel_respects_tuned_block(tmp_path, monkeypatch):
    """A tuned entry must change nothing about results, only the tiling."""
    monkeypatch.setenv("TMAC_TUNE_TABLE", str(tmp_path / "t.json"))
    tune_table.invalidate_cache()
    rng = np.random.default_rng(0)
    K, M, gs = 512, 512, 128
    w = rng.standard_normal((K, M)).astype(np.float32)
    qt = QuantizedTensor.from_float(w, 2, gs, zero_point=True)
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
    a = np.asarray(qgemm_pallas(x, qt, out_dtype=jnp.float32, interpret=True))
    tune_table.record(2, qt.kdim_padded, qt.mdim_padded, 1, gs, "grouped", 256, 1.0)
    tune_table.invalidate_cache()
    b = np.asarray(qgemm_pallas(x, qt, out_dtype=jnp.float32, interpret=True))
    assert nmse(a, b) < 1e-10
    tune_table.invalidate_cache()


def test_candidates_legal():
    c = candidates(Mp=1280, KP=800)
    assert all(1280 % bm == 0 and bm % 128 == 0 for bm in c)
    assert all(800 * bm <= (6 << 20) for bm in c)
    assert 128 in c
