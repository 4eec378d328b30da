"""CLI + perplexity smoke tests (CPU)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import init_params
from tmac_tpu.runtime.perplexity import perplexity


def test_perplexity_sane():
    cfg = get_preset("bitnet-3b").scaled(8)
    params = init_params(cfg, seed=0)
    stream = np.random.default_rng(0).integers(0, cfg.vocab_size, 64).astype(np.int32)
    r = perplexity(params, cfg, stream, window=32, impl="xla")
    assert r["tokens"] == 62  # two windows x 31 predictions
    # random model on random tokens: ppl should be near vocab_size
    assert 0 < r["nll"] < 20
    assert r["ppl"] > 1


def test_cli_convert_and_ppl(tmp_path):
    """End-to-end through the CLI: synthetic HF -> convert -> ppl."""
    from tests.test_convert import _write_synthetic_hf_gptq
    cfg0 = get_preset("llama-2-7b").scaled(8)
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    _write_synthetic_hf_gptq(str(hf_dir), cfg0, bits=2, gs=128)

    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": "/root/repo"}
    out_dir = tmp_path / "ck"
    r = subprocess.run(
        [sys.executable, "-m", "tmac_tpu.tools.cli", "convert",
         "--model-dir", str(hf_dir), "--out", str(out_dir), "--name", "t"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "weights.safetensors").exists()

    toks = tmp_path / "toks.npy"
    np.save(toks, np.random.default_rng(0).integers(0, cfg0.vocab_size, 80).astype(np.int32))
    r = subprocess.run(
        [sys.executable, "-m", "tmac_tpu.tools.cli", "ppl",
         "--ckpt", str(out_dir), "--tokens", str(toks), "--window", "32"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["ppl"] > 1


def test_cli_generate_ids(tmp_path):
    from tmac_tpu.convert.checkpoint import save_checkpoint
    cfg = get_preset("bitnet-3b").scaled(8)
    params = init_params(cfg, seed=0)
    save_checkpoint(str(tmp_path / "ck"), cfg, params)
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": "/root/repo"}
    r = subprocess.run(
        [sys.executable, "-m", "tmac_tpu.tools.cli", "generate",
         "--ckpt", str(tmp_path / "ck"), "--prompt-ids", "1,2,3", "-n", "4"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    ids = [int(t) for t in r.stdout.strip().split(",")]
    assert len(ids) == 4
