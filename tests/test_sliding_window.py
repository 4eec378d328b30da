"""Sliding-window attention (ModelConfig.sliding_window).

mistral/phi-3 checkpoints bound attention to a window; ignoring it gives
wrong outputs past the window (the reference runs them through
llama.cpp, which honors it).  Covers the XLA mask, the sp/pp chunked
online-softmax mask, the flash-decode eligibility guard, and converter
plumbing.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import (KVCache, _flash_decode_ok, forward,
                                   init_params)
from tmac_tpu.utils import nmse


def _logits(cfg, params, T=24):
    toks = (np.arange(T, dtype=np.int32) % (cfg.vocab_size - 2) + 1)[None, :]
    out, _ = forward(params, cfg, toks, KVCache.create(cfg, 1, 32),
                     impl="xla")
    return np.asarray(out)


def test_window_noop_within_window():
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=0)
    wide = dataclasses.replace(cfg, sliding_window=1024)
    np.testing.assert_allclose(_logits(cfg, params), _logits(wide, params),
                               atol=0)


def test_window_changes_logits_past_window():
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=0)
    narrow = dataclasses.replace(cfg, sliding_window=8)
    a, b = _logits(cfg, params, T=24), _logits(narrow, params, T=24)
    # positions < window see identical context
    np.testing.assert_allclose(a[:, :8], b[:, :8], atol=0)
    assert not np.allclose(a[:, -1], b[:, -1])


def test_window_mask_oracle():
    """XLA attention with a window == explicit softmax oracle."""
    cfg = dataclasses.replace(get_preset("llama-2-7b").scaled(8),
                              num_layers=1, sliding_window=5)
    params = init_params(cfg, seed=1)
    T = 12
    toks = (np.arange(T, dtype=np.int32) + 1)[None, :]
    got, _ = forward(params, cfg, toks, KVCache.create(cfg, 1, 16),
                     impl="xla")
    # oracle: full model minus the masked context == run each query over
    # only its visible slice (single layer makes this exact)
    for t in (6, 11):
        lo = t - cfg.sliding_window + 1
        sub = toks[:, lo:t + 1]
        ref, _ = forward(params, cfg, sub, KVCache.create(cfg, 1, 16),
                         impl="xla")
        # the LAST query of the slice sees exactly the windowed context;
        # its own positional rotation differs, so compare via a shifted
        # cache instead: prefill the slice at the true start position
        c = KVCache.create(cfg, 1, 16)
        c = dataclasses.replace(c, pos=jnp.asarray([lo], jnp.int32))
        ref2, _ = forward(params, cfg, sub, c, impl="xla")
        assert nmse(np.asarray(got)[0, t], np.asarray(ref2)[0, -1]) < 1e-4


def test_sp_chunked_window_matches_xla():
    from tmac_tpu.parallel.sp import _chunked_causal_attention

    rng = np.random.default_rng(3)
    B, T, KV, rep, D, W = 1, 16, 2, 2, 64, 6
    q = jnp.asarray(rng.standard_normal((B, T, KV, rep, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KV, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KV, T, D)), jnp.float32)
    pos = jnp.arange(T)[None, :]
    got = np.asarray(_chunked_causal_attention(
        q, k, v, pos, kv_len=jnp.int32(T), D=D, chunk=8, window=W))
    # numpy oracle
    qn, kn, vn = (np.asarray(x, np.float64) for x in (q, k, v))
    s = np.einsum("btkrd,bksd->btkrs", qn, kn) / np.sqrt(D)
    t_idx = np.arange(T)[:, None]
    s_idx = np.arange(T)[None, :]
    ok = (s_idx <= t_idx) & (s_idx > t_idx - W)
    s = np.where(ok[None, :, None, None, :], s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("btkrs,bksd->btkrd", p, vn).reshape(B, T, KV * rep * D)
    assert nmse(ref, got) < 1e-9


def test_flash_gate_window(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # windowed models stay on the kernel (it takes the window as a static
    # bound and skips blocks below it) -- the gate is window-agnostic
    assert _flash_decode_ok(1, 1024, 128, "auto")
    assert _flash_decode_ok(1, 4096, 128, "auto")


def _flash_oracle(q, k, v, lens, lo):
    """numpy masked-softmax oracle over visible range [lo, lens)."""
    B, KV, rep, D = q.shape
    S = k.shape[3]
    s = np.einsum("bkrd,bksd->bkrs", q.astype(np.float64),
                  k[0].astype(np.float64)) / np.sqrt(D)
    idx = np.arange(S)
    for b in range(B):
        s[b][..., (idx >= lens[b]) | (idx < lo[b])] = -np.inf
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bkrs,bksd->bkrd", p, v[0].astype(np.float64))


def test_flash_kernel_window_interpret():
    """Windowed flash-decode kernel (interpret mode) == masked oracle,
    including a window crossing block boundaries and a fully-in-window
    row."""
    from tmac_tpu.ops.pallas.attention_kernel import flash_decode_stacked

    rng = np.random.default_rng(7)
    B, KV, rep, D, S, W = 2, 2, 2, 64, 128, 40
    q = rng.standard_normal((B, KV, rep, D)).astype(np.float32)
    k = rng.standard_normal((1, B, KV, S, D)).astype(np.float32)
    v = rng.standard_normal((1, B, KV, S, D)).astype(np.float32)
    lens = np.asarray([100, 16], np.int32)  # row 1: pos < window
    got = np.asarray(flash_decode_stacked(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lens),
        jnp.int32(0), blk=32, interpret=True, window=W))
    lo = np.maximum(lens - W, 0)
    ref = _flash_oracle(q, k, v, lens, lo)
    assert nmse(ref, got) < 1e-9


def test_flash_append_window_interpret():
    from tmac_tpu.ops.pallas.attention_kernel import \
        flash_decode_stacked_append

    rng = np.random.default_rng(8)
    B, KV, rep, D, S, W = 1, 2, 2, 64, 128, 24
    q = rng.standard_normal((B, KV, rep, D)).astype(np.float32)
    k = rng.standard_normal((1, B, KV, S, D)).astype(np.float32)
    v = rng.standard_normal((1, B, KV, S, D)).astype(np.float32)
    ck = rng.standard_normal((B, KV, D)).astype(np.float32)
    cv = rng.standard_normal((B, KV, D)).astype(np.float32)
    lens = np.asarray([90], np.int32)  # current token at position 90
    got = np.asarray(flash_decode_stacked_append(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lens),
        jnp.int32(0), jnp.asarray(ck), jnp.asarray(cv), blk=32,
        interpret=True, window=W))
    # oracle: cache entries [lens-W+1, lens) plus the current token
    ke = k.copy()
    ve = v.copy()
    ke[0, :, :, lens[0]] = ck
    ve[0, :, :, lens[0]] = cv
    ref = _flash_oracle(q, ke, ve, lens + 1, np.maximum(lens + 1 - W, 0))
    assert nmse(ref, got) < 1e-9


def test_converters_and_export(tmp_path):
    from tmac_tpu.convert.hf import model_config_from_hf
    from tmac_tpu.models.config import QuantConfig

    base = {"vocab_size": 256, "hidden_size": 256, "intermediate_size": 256,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "num_key_value_heads": 2}
    q = QuantConfig()
    assert model_config_from_hf(dict(base), q).sliding_window == 0
    assert model_config_from_hf(
        dict(base, sliding_window=2047), q).sliding_window == 2047
    assert model_config_from_hf(
        dict(base, sliding_window=4096, use_sliding_window=False),
        q).sliding_window == 0

    # gguf metadata round trip via export
    from tmac_tpu.convert import gguf
    from tmac_tpu.convert.gguf_export import export_gguf

    cfg = dataclasses.replace(get_preset("phi-3-mini").scaled(8),
                              sliding_window=2047, head_dim=128)
    params = init_params(cfg, seed=0)
    out = str(tmp_path / "m.gguf")
    export_gguf(out, cfg, params)
    cfg2, _ = gguf.convert_gguf_model(out, name="re")
    assert cfg2.sliding_window == 2047


def test_qwen2_max_window_layers_gating():
    """Qwen2 applies SWA only to layers >= max_window_layers; with one
    global window, honor it only when it covers every layer."""
    from tmac_tpu.convert.hf import model_config_from_hf
    from tmac_tpu.models.config import QuantConfig

    base = {"vocab_size": 256, "hidden_size": 256, "intermediate_size": 256,
            "num_hidden_layers": 28, "num_attention_heads": 2,
            "num_key_value_heads": 2, "sliding_window": 4096,
            "use_sliding_window": True}
    q = QuantConfig()
    # default qwen2 shape: mwl == num layers -> the window NEVER applies
    assert model_config_from_hf(
        dict(base, max_window_layers=28), q).sliding_window == 0
    # mwl == 0 -> every layer windowed -> honor
    assert model_config_from_hf(
        dict(base, max_window_layers=0), q).sliding_window == 4096
    # mistral-style config without the key -> honor
    assert model_config_from_hf(dict(base), q).sliding_window == 4096
