"""int8 KV cache (KVCache quant mode): kernel exactness vs the dequant
model, forward-accuracy gates, and engine integration.

The llama.cpp analog is --cache-type-k/v q8_0; here the flash-decode
kernel streams int8 codes + per-vector scales and folds the scales into
scores/probs (never a dequantized KV copy), halving KV HBM traffic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, forward, init_params
from tmac_tpu.ops.pallas.attention_kernel import (flash_decode_stacked,
                                                  flash_decode_stacked_append)
from tmac_tpu.utils import nmse


def _quantize(x):
    sc = np.maximum(np.abs(x).max(-1), 1e-20) / 127.0
    q = np.clip(np.round(x / sc[..., None]), -127, 127).astype(np.int8)
    return q, sc.astype(np.float32)


@pytest.fixture(scope="module")
def model():
    cfg = get_preset("llama-2-7b").scaled(8)
    return cfg, init_params(cfg, seed=0)


def test_flash_quant_matches_dequant_oracle():
    """The quantized flash kernel == float attention over the DEQUANTIZED
    cache, exactly (the scale folds are algebraic, not approximations)."""
    rng = np.random.default_rng(0)
    L, B, KV, rep, S, D = 2, 3, 4, 2, 256, 128
    k = rng.standard_normal((L, B, KV, S, D)).astype(np.float32)
    v = rng.standard_normal((L, B, KV, S, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, KV, rep, D)), jnp.float32)
    lens = jnp.asarray([5, 100, 256], jnp.int32)
    kq, ksc = _quantize(k)
    vq, vsc = _quantize(v)
    kdq = kq.astype(np.float32) * ksc[..., None]
    vdq = vq.astype(np.float32) * vsc[..., None]

    def ref(li, extra_k=None, extra_v=None, lens_=lens):
        out = np.zeros((B, KV, rep, D), np.float32)
        for b in range(B):
            Lb = int(lens_[b])
            kk, vv = kdq[li, b, :, :Lb], vdq[li, b, :, :Lb]
            if extra_k is not None:
                kk = np.concatenate([kk, extra_k[b][:, None]], 1)
                vv = np.concatenate([vv, extra_v[b][:, None]], 1)
            s = np.einsum("krd,ksd->krs", np.asarray(q)[b], kk) / np.sqrt(D)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b] = np.einsum("krs,ksd->krd", p, vv)
        return out

    for li in range(L):
        o = flash_decode_stacked(q, jnp.asarray(kq), jnp.asarray(vq), lens,
                                 jnp.int32(li), k_scale=jnp.asarray(ksc),
                                 v_scale=jnp.asarray(vsc))
        np.testing.assert_allclose(np.asarray(o), ref(li), atol=2e-5)

    # append variant: current token rides as an exact float operand
    ck = rng.standard_normal((B, KV, D)).astype(np.float32)
    cv = rng.standard_normal((B, KV, D)).astype(np.float32)
    lens2 = jnp.asarray([5, 100, 255], jnp.int32)
    o = flash_decode_stacked_append(
        q, jnp.asarray(kq), jnp.asarray(vq), lens2, jnp.int32(1),
        jnp.asarray(ck), jnp.asarray(cv), k_scale=jnp.asarray(ksc),
        v_scale=jnp.asarray(vsc))
    np.testing.assert_allclose(np.asarray(o), ref(1, ck, cv, lens2),
                               atol=2e-5)


def test_forward_quant_cache_accuracy(model):
    """Full-model forward with an int8 cache stays within the int8-KV
    noise band of the bf16-cache forward (matched inputs)."""
    cfg, params = model
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)
    c_f = KVCache.create(cfg, 2, 64)
    c_q = KVCache.create(cfg, 2, 64, quant=True)
    assert c_q.quantized and c_q.k.dtype == jnp.int8
    lf, c_f = forward(params, cfg, toks, c_f, impl="xla")
    lq, c_q = forward(params, cfg, toks, c_q, impl="xla")
    assert nmse(np.asarray(lf, np.float32), np.asarray(lq, np.float32)) < 5e-3
    # one matched decode step (same input token for both)
    nxt = jnp.argmax(lf[:, -1:], -1).astype(jnp.int32)
    lf, _ = forward(params, cfg, nxt, c_f, impl="xla")
    lq, _ = forward(params, cfg, nxt, c_q, impl="xla")
    assert nmse(np.asarray(lf, np.float32), np.asarray(lq, np.float32)) < 5e-3


def test_forward_deferred_kv_quant(model):
    """Deferred-KV decode over an int8 cache (flash append, interpret on
    CPU) matches the per-layer-write quantized path: the same codes land
    in the cache and the same scores come out."""
    cfg, params = model
    rng = np.random.default_rng(2)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)), jnp.int32)
    c_a = KVCache.create(cfg, 1, 64, quant=True)
    c_b = KVCache.create(cfg, 1, 64, quant=True)
    la, c_a = forward(params, cfg, toks, c_a, impl="xla")
    lb, c_b = forward(params, cfg, toks, c_b, impl="xla")
    nxt = jnp.argmax(la[:, -1:], -1).astype(jnp.int32)
    la, c_a = forward(params, cfg, nxt, c_a, impl="xla", deferred_kv=False)
    lb, c_b = forward(params, cfg, nxt, c_b, deferred_kv=True)
    # deferred keeps the CURRENT token exact (float operand) while the
    # per-layer path reads it back quantized -> small activation drift
    # from layer 1 onward (so only layer 0's codes are bit-identical)
    assert nmse(np.asarray(la, np.float32), np.asarray(lb, np.float32)) < 5e-3
    np.testing.assert_array_equal(np.asarray(c_a.pos), np.asarray(c_b.pos))
    np.testing.assert_array_equal(np.asarray(c_a.k[0]), np.asarray(c_b.k[0]))
    np.testing.assert_allclose(np.asarray(c_a.k_scale[0]),
                               np.asarray(c_b.k_scale[0]), rtol=1e-6)


def test_engine_kv_quant(model):
    """The continuous-batching engine over an int8 cache: requests
    complete, outputs are valid tokens, and the first greedy token per
    request matches the bf16-cache engine (later tokens may diverge on
    near-ties -- int8 KV is an accuracy/bandwidth trade)."""
    from tmac_tpu.runtime.engine import InferenceEngine
    cfg, params = model
    prompts = [[1, 2, 3], [7, 8, 9, 10]]
    eq = InferenceEngine(cfg, params, max_batch=2, max_len=64, impl="xla",
                         decode_chunk=4, kv_quant=True,
                         prefix_cache_size=2, prefix_cache_min_reuse=2)
    ef = InferenceEngine(cfg, params, max_batch=2, max_len=64, impl="xla",
                         decode_chunk=4)
    uq = [eq.submit(p, max_new_tokens=5) for p in prompts]
    uf = [ef.submit(p, max_new_tokens=5) for p in prompts]
    rq, rf = eq.run(), ef.run()
    for a, b in zip(uq, uf):
        assert len(rq[a]) == 5
        assert all(0 <= t < cfg.vocab_size for t in rq[a])
        assert rq[a][0] == rf[b][0]
    # prefix cache stores/reuses quantized blocks
    u2 = eq.submit(prompts[1], max_new_tokens=3)
    r2 = eq.run()[u2]
    assert eq.stats["prefix_hits"] == 1
    assert r2[0] == rq[uq[1]][0]


def test_engine_kv_quant_under_tp_mesh(model):
    """int8 cache sharded over a tp mesh (scales shard like k/v minus
    head_dim); the mesh engine drains requests with valid outputs."""
    from tmac_tpu.parallel import tp as tpmod
    from tmac_tpu.runtime.engine import InferenceEngine
    cfg, _ = model
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    tp = 2
    params = init_params(cfg, seed=0, tp=tp)
    mesh = tpmod.make_mesh(tp=tp)
    sparams = tpmod.shard_params(params, mesh)
    cache = tpmod.shard_cache(KVCache.create(cfg, 2, 64, quant=True), mesh)
    assert cache.quantized
    eng = InferenceEngine(
        cfg, sparams, max_batch=2, max_len=64, impl="xla", decode_chunk=4,
        step_fns=tpmod.make_engine_fns(cfg, mesh, impl="xla", kv_quant=True),
        cache=cache)
    uids = [eng.submit([1, 2, 3], max_new_tokens=4),
            eng.submit([9, 8], max_new_tokens=6)]
    res = eng.run()
    for uid, n in zip(uids, (4, 6)):
        assert len(res[uid]) == n
        assert all(0 <= t < cfg.vocab_size for t in res[uid])
