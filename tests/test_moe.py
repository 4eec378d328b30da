"""MoE model family: routing math vs an f32 oracle, dispatch == dense,
and expert-parallel (ep x tp) equality on the 8-device virtual mesh.

The reference has no MoE family (model_utils.py:19-88); these tests gate
the net-new surface in models/moe.py + parallel/ep.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import KVCache, forward, init_params, rms_norm
from tmac_tpu.models.moe import (expert_capacity, moe_mlp, route_topk,
                                 stack_experts, expert_view)
from tmac_tpu.ops.qgemm import qgemm
from tmac_tpu.parallel import ep as epmod
from tmac_tpu.runtime.sampling import SamplerConfig
from tmac_tpu.utils import nmse


def _tiny_moe_cfg(E=4, k=2):
    import dataclasses
    cfg = get_preset("mixtral-8x7b").scaled(16)
    # scaled(16) leaves 1 kv head and a 896-wide expert FFN; bump both so
    # the ep x tp tests can shard kv-heads and scale groups over tp=2
    return dataclasses.replace(cfg, num_experts=E, num_experts_per_tok=k,
                               num_kv_heads=2, moe_intermediate_size=512)


def _dequant(qt) -> np.ndarray:
    """Dequantized (K, M) f32 weights via the XLA path with an identity
    input (slice_m restores logical column order for fused tensors)."""
    eye = jnp.eye(qt.kdim, dtype=jnp.float32)
    return np.asarray(qgemm(eye, qt, impl="xla", out_dtype=jnp.float32))


def _oracle_moe(x2: np.ndarray, layer, cfg) -> np.ndarray:
    """Per-token numpy f32 MoE MLP: top-k over router logits with either
    normalization form (models/moe.route_topk), weighted sum of
    dequant-expert FFNs, plus the optional gated shared expert."""
    router = np.asarray(layer["moe_router"], np.float32)
    E, k = cfg.num_experts, cfg.num_experts_per_tok
    gus = [_dequant(expert_view(layer["experts_gate_up"], e)) for e in range(E)]
    downs = [_dequant(expert_view(layer["experts_down"], e)) for e in range(E)]
    Ie = downs[0].shape[0]

    def _ffn(v, wgu, wdn, ihalf):
        gu = v @ wgu
        g, u = gu[..., :ihalf], gu[..., ihalf:]
        return ((g / (1.0 + np.exp(-g))) * u) @ wdn

    logits = x2 @ router  # (N, E)
    out = np.zeros_like(x2)
    for n in range(x2.shape[0]):
        sel = np.argsort(-logits[n], kind="stable")[:k]
        if cfg.moe_norm_topk:
            w = np.exp(logits[n, sel] - logits[n, sel].max())
            w = w / w.sum()
        else:
            p_all = np.exp(logits[n] - logits[n].max())
            w = (p_all / p_all.sum())[sel]
        for j, e in enumerate(sel):
            out[n] += w[j] * _ffn(x2[n], gus[e], downs[e], Ie)
    if "shared_gate_up" in layer:
        wgu = _dequant(layer["shared_gate_up"])
        wdn = _dequant(layer["shared_down"])
        ys = _ffn(x2, wgu, wdn, wdn.shape[0])
        if "shared_gate" in layer:
            sg = np.asarray(layer["shared_gate"], np.float32)
            ys = ys * (1.0 / (1.0 + np.exp(-(x2 @ sg))))[:, None]
        out = out + ys
    return out


def test_moe_mlp_matches_oracle():
    cfg = _tiny_moe_cfg()
    params = init_params(cfg, seed=3)
    layer = params["layers"][0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 12, cfg.hidden_size)) * 0.5,
                    jnp.float32)

    got = moe_mlp(x, layer, cfg, cfg.quant.mode, impl="xla")
    xn = np.asarray(
        rms_norm(x.reshape(-1, cfg.hidden_size),
                 layer["mlp_norm"], cfg.rms_norm_eps), np.float32)
    want = _oracle_moe(xn, layer, cfg)
    # NMSE bar (the reference's verification metric, ops/qgemm.py:278):
    # elementwise f32 rtol cannot hold on the TPU MXU, which truncates
    # f32 dot inputs to bf16 (~0.4% elementwise, NMSE ~2e-5); a routing
    # flip or a wrong expert weight is O(1) on the affected token and
    # blows NMSE past the bar by orders of magnitude either way.
    got = np.asarray(got, np.float32).reshape(want.shape)
    assert nmse(want, got) <= 5e-4


def _tiny_qwen2moe_cfg(E=4, k=2):
    import dataclasses
    cfg = get_preset("qwen2-moe-a14b").scaled(16)
    return dataclasses.replace(
        cfg, num_experts=E, num_experts_per_tok=k, num_kv_heads=2,
        moe_intermediate_size=512, moe_shared_intermediate_size=512)


def test_qwen2moe_mlp_matches_oracle():
    """The shared-expert family: all-expert-softmax routing
    (norm_topk=False), unrenormalized top-k weights, plus the sigmoid-
    gated always-on shared expert."""
    cfg = _tiny_qwen2moe_cfg()
    assert not cfg.moe_norm_topk and cfg.moe_shared_gate
    params = init_params(cfg, seed=21)
    layer = params["layers"][0]
    assert "shared_gate_up" in layer and "shared_gate" in layer
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 12, cfg.hidden_size)) * 0.5,
                    jnp.float32)
    got = moe_mlp(x, layer, cfg, cfg.quant.mode, impl="xla")
    xn = np.asarray(
        rms_norm(x.reshape(-1, cfg.hidden_size),
                 layer["mlp_norm"], cfg.rms_norm_eps), np.float32)
    want = _oracle_moe(xn, layer, cfg)
    # NMSE bar (the reference's verification metric, ops/qgemm.py:278):
    # elementwise f32 rtol cannot hold on the TPU MXU, which truncates
    # f32 dot inputs to bf16 (~0.4% elementwise, NMSE ~2e-5); a routing
    # flip or a wrong expert weight is O(1) on the affected token and
    # blows NMSE past the bar by orders of magnitude either way.
    got = np.asarray(got, np.float32).reshape(want.shape)
    assert nmse(want, got) <= 5e-4


def test_route_topk_norm_flag():
    """norm_topk=False keeps the all-expert softmax mass: top-k weights
    don't sum to 1 and match the full softmax at the selected entries."""
    rng = np.random.default_rng(9)
    x2 = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    router = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    cw = np.asarray(route_topk(x2, router, 2, norm_topk=False))
    logits = np.asarray(x2) @ np.asarray(router)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    assert ((cw > 0).sum(-1) == 2).all()
    # mass outside the top-2 is NOT renormalized in: sums stay <= 1 and
    # are meaningfully below 1 for typical rows
    assert (cw.sum(-1) <= 1.0 + 1e-6).all()
    assert (cw.sum(-1) < 0.99).any()
    nz = cw > 0
    np.testing.assert_allclose(cw[nz], p[nz], rtol=1e-5)


def test_qwen2moe_forward_and_ep():
    """Full forward with the shared expert + EP equality over an ep x tp
    mesh (the shared expert replicates over ep and is pre-divided by the
    group size before the joint psum)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = _tiny_qwen2moe_cfg(E=8, k=2)
    params = init_params(cfg, seed=22, tp=2)
    B, T, steps = 1, 4, 3
    rng = np.random.default_rng(10)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    mesh = epmod.make_moe_mesh(ep=4, tp=2)
    sparams = epmod.shard_params_moe(params, mesh)
    cache = epmod.shard_cache_moe(KVCache.create(cfg, B, T + steps), mesh)
    prefill_fn, decode_fn = epmod.make_ep_step(cfg, mesh, params,
                                               SamplerConfig(), impl="xla")
    logits, cache = prefill_fn(sparams, toks, cache)
    ref_cache = KVCache.create(cfg, B, T + steps)
    ref_logits, ref_cache = forward(params, cfg, toks, ref_cache, impl="xla")
    np.testing.assert_allclose(
        np.asarray(logits, np.float32),
        np.asarray(ref_logits[:, -1, :], np.float32), rtol=5e-2, atol=0.1)

    # decode through the ep x tp mesh (shared-expert ep pre-division must
    # survive the per-step psum): teacher-forced single-device agreement
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    toks_out, cache = decode_fn(sparams, first, cache,
                                jax.random.PRNGKey(0), steps - 1)
    got = np.concatenate([np.asarray(first)[:, None],
                          np.asarray(toks_out)], 1)
    refs = [np.asarray(ref_logits[:, -1, :], np.float32)]
    for t in range(steps - 1):
        lg, ref_cache = forward(params, cfg, jnp.asarray(got[:, t:t + 1]),
                                ref_cache, impl="xla")
        refs.append(np.asarray(lg[:, -1, :], np.float32))
    ref = np.stack(refs, 1)
    agree = (ref.argmax(-1) == got).mean()
    assert agree >= 0.75, (ref.argmax(-1), got)


def test_route_topk_rows_sum_to_one():
    rng = np.random.default_rng(1)
    x2 = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)
    router = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    cw = np.asarray(route_topk(x2, router, 2))
    assert cw.shape == (32, 8)
    np.testing.assert_allclose(cw.sum(-1), 1.0, rtol=1e-6)
    assert ((cw > 0).sum(-1) == 2).all()


def test_moe_dispatch_equals_dense():
    """Capacity dispatch gathers exact row copies (each slot holds at most
    one token), so with ample capacity the two forms agree to f32 rounding
    -- only FMA association in the combine contraction differs."""
    cfg = _tiny_moe_cfg()
    params = init_params(cfg, seed=5)
    layer = params["layers"][1]
    rng = np.random.default_rng(2)
    N = 96
    x = jnp.asarray(rng.standard_normal((1, N, cfg.hidden_size)) * 0.5,
                    jnp.bfloat16)

    dense = moe_mlp(x, layer, cfg, cfg.quant.mode, impl="xla",
                    moe_impl="dense")
    disp = moe_mlp(x, layer, cfg, cfg.quant.mode, impl="xla",
                   moe_impl="dispatch", capacity=N)
    d = np.asarray(dense, np.float32).reshape(N, -1)
    p = np.asarray(disp, np.float32).reshape(N, -1)
    # per-token NMSE: the two forms batch tokens into different matmul
    # shapes, so the bf16 MXU rounds them differently (~2e-5 NMSE); a
    # dropped/corrupted row is O(1) on that token and fails loudly
    per_tok = [nmse(d[i], p[i]) for i in range(N)]
    assert max(per_tok) <= 1e-3, max(per_tok)


def test_moe_select_equals_dense_decode():
    """The decode latency path (gather only the top-k routed experts by a
    traced index) must match the dense-masked form at N=1."""
    cfg = _tiny_moe_cfg()
    params = init_params(cfg, seed=9)
    layer = params["layers"][0]
    rng = np.random.default_rng(5)
    for trial in range(4):
        x = jnp.asarray(rng.standard_normal((1, 1, cfg.hidden_size)) * 0.5,
                        jnp.bfloat16)
        dense = np.asarray(moe_mlp(x, layer, cfg, cfg.quant.mode, impl="xla",
                                   moe_impl="dense"), np.float32)
        sel = np.asarray(moe_mlp(x, layer, cfg, cfg.quant.mode, impl="xla",
                                 moe_impl="select"), np.float32)
        np.testing.assert_allclose(dense, sel, rtol=0, atol=1e-4)


def test_moe_dispatch_drops_overflow_tokens():
    """Capacity overflow zeroes an expert's contribution for the dropped
    tokens (Switch semantics) instead of corrupting other rows."""
    cfg = _tiny_moe_cfg(E=2, k=1)
    params = init_params(cfg, seed=7)
    layer = params["layers"][0]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 64, cfg.hidden_size)),
                    jnp.bfloat16)
    # capacity 8 over 64 tokens with k=1, E=2: at least one expert drops
    out = np.asarray(moe_mlp(x, layer, cfg, cfg.quant.mode, impl="xla",
                             moe_impl="dispatch", capacity=8), np.float32)
    dense = np.asarray(moe_mlp(x, layer, cfg, cfg.quant.mode, impl="xla",
                               moe_impl="dense"), np.float32)
    assert np.isfinite(out).all()
    # kept rows agree with dense (to combine-FMA rounding); dropped rows
    # are exactly zero
    row_match = (np.abs(out - dense).max(-1) <= 1e-4)
    row_zero = (np.abs(out).max(-1) == 0.0)
    assert (row_match | row_zero).all()
    assert row_zero.sum() > 0 and row_match.sum() >= 16


def test_moe_dispatch_padding_does_not_steal_capacity():
    """Right-padded rows (engine prefill buckets) must not consume
    dispatch capacity: with a valid mask, the real rows' outputs match the
    dense form even when the padded batch would overflow capacity."""
    cfg = _tiny_moe_cfg(E=2, k=1)
    params = init_params(cfg, seed=13)
    layer = params["layers"][0]
    rng = np.random.default_rng(7)
    n_real, n_pad = 24, 104  # 128 total rows, capacity sized for ~real only
    x_real = rng.standard_normal((1, n_real, cfg.hidden_size))
    x = jnp.asarray(np.concatenate(
        [x_real, np.ones((1, n_pad, cfg.hidden_size))], 1), jnp.bfloat16)
    valid = jnp.asarray(
        np.arange(n_real + n_pad)[None, :] < n_real)
    out = np.asarray(moe_mlp(x, layer, cfg, cfg.quant.mode, impl="xla",
                             moe_impl="dispatch", capacity=32, valid=valid),
                     np.float32)
    dense = np.asarray(moe_mlp(x, layer, cfg, cfg.quant.mode, impl="xla",
                               moe_impl="dense"), np.float32)
    # every real row survives (no capacity theft by the 104 pad rows, which
    # would certainly overflow capacity 32 if they routed); pad rows zero
    np.testing.assert_allclose(out[0, :n_real], dense[0, :n_real],
                               rtol=0, atol=1e-4)
    assert (np.abs(out[0, n_real:]).max() == 0.0)


def test_expert_capacity_static():
    cfg = _tiny_moe_cfg(E=4, k=2)
    c = expert_capacity(256, cfg)
    assert c % 8 == 0 and c >= 256 * 2 // 4


def test_moe_forward_prefill_decode():
    """Full MoE model forward: prefill then greedy decode steps through the
    KV cache; dense and dispatch MLP paths see the same routing."""
    cfg = _tiny_moe_cfg()
    params = init_params(cfg, seed=11)
    rng = np.random.default_rng(4)
    B, T, steps = 2, 8, 3
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    cache = KVCache.create(cfg, B, T + steps)
    logits, cache = forward(params, cfg, toks, cache, impl="xla")
    assert logits.shape == (B, T, cfg.vocab_size)
    tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
    for _ in range(steps):
        lg, cache = forward(params, cfg, tok[:, None], cache, impl="xla")
        tok = jnp.argmax(lg[:, -1, :], -1).astype(jnp.int32)
    assert int(cache.pos[0]) == T + steps


def test_moe_engine_matches_single_stream():
    """The continuous-batching engine serves MoE models: engine output for
    a request equals the single-stream greedy decode of its prompt."""
    from tmac_tpu.runtime.engine import InferenceEngine
    from tmac_tpu.runtime.generate import generate
    cfg = _tiny_moe_cfg()
    params = init_params(cfg, seed=2)
    eng = InferenceEngine(cfg, params, max_batch=2, max_len=64,
                          impl="xla", decode_chunk=4)
    uid1 = eng.submit([1, 2, 3], max_new_tokens=6)
    uid2 = eng.submit([5, 6], max_new_tokens=6)
    results = eng.run()
    for uid, prompt in ((uid1, [1, 2, 3]), (uid2, [5, 6])):
        ref = generate(params, cfg, np.asarray([prompt], np.int32),
                       max_new_tokens=6, impl="xla")
        if results[uid] == [int(t) for t in np.asarray(ref)[0]]:
            continue
        # The engine batches slots together (B=2 padded) while the
        # single-stream reference runs B=1, so the bf16 MXU rounds their
        # logits differently and greedy picks can flip at genuine
        # near-ties (exact token equality holds on CPU f32).  Gate the
        # divergent case tie-aware instead (the parity-gate protocol,
        # tools/parity.py): teacher-force the ENGINE's tokens through the
        # reference forward and require every engine token to be the
        # argmax or within the tie margin of it -- scheduler/cache bugs
        # produce O(1) logit gaps and still fail.
        _assert_greedy_tie_aware(params, cfg, prompt, results[uid])


def _assert_greedy_tie_aware(params, cfg, prompt, tokens, margin=0.35):
    full = np.asarray([list(prompt) + list(tokens)], np.int32)
    cache = KVCache.create(cfg, 1, full.shape[1])
    logits, _ = forward(params, cfg, jnp.asarray(full), cache, impl="xla")
    lg = np.asarray(logits, np.float32)[0]
    T = len(prompt)
    for i, tok in enumerate(tokens):
        row = lg[T - 1 + i]
        top = int(np.argmax(row))
        gap = float(row[top] - row[tok])
        assert top == tok or gap < margin, (i, tok, top, gap)


def test_moe_engine_over_ep_mesh():
    """Continuous-batching MoE serving over an ep x tp mesh: the engine
    runs, and a slot-prefill's logits match the single-device slot
    prefill at float-noise tolerance (same protocol as the dp x tp engine
    test in test_engine.py)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from tmac_tpu.models.llama import KVCache as KVC
    from tmac_tpu.runtime.engine import InferenceEngine, _prefill_slot
    cfg = _tiny_moe_cfg(E=8, k=2)
    params = init_params(cfg, seed=0, tp=2)
    mesh = epmod.make_moe_mesh(ep=4, tp=2)
    sparams = epmod.shard_params_moe(params, mesh)
    cache = epmod.shard_cache_moe(KVC.create(cfg, 2, 64), mesh)
    eng = InferenceEngine(
        cfg, sparams, max_batch=2, max_len=64, impl="xla", decode_chunk=4,
        step_fns=epmod.make_moe_engine_fns(cfg, mesh, impl="xla"),
        cache=cache)
    u1 = eng.submit([1, 2, 3], max_new_tokens=6)
    u2 = eng.submit([9, 8], max_new_tokens=5)
    res = eng.run()
    assert len(res[u1]) == 6 and len(res[u2]) == 5
    for t in res[u1] + res[u2]:
        assert 0 <= t < cfg.vocab_size

    toks = np.zeros((1, 16), np.int32)
    toks[0, :3] = [1, 2, 3]
    cache_ep = epmod.shard_cache_moe(KVC.create(cfg, 2, 64), mesh)
    pf_ep = epmod.make_moe_engine_fns(cfg, mesh, impl="xla")[0]
    last_ep, _ = pf_ep(sparams, jnp.asarray(toks), jnp.int32(3), cache_ep,
                       jnp.int32(0), jnp.int32(0))
    last_sc, _ = _prefill_slot(params, cfg, jnp.asarray(toks), jnp.int32(3),
                               KVC.create(cfg, 2, 64), jnp.int32(0),
                               jnp.int32(0), impl="xla", bucket=16)
    np.testing.assert_allclose(np.asarray(last_ep, np.float32),
                               np.asarray(last_sc, np.float32),
                               rtol=5e-2, atol=0.08)


def test_stack_experts_roundtrip():
    cfg = _tiny_moe_cfg()
    params = init_params(cfg, seed=1)
    stack = params["layers"][0]["experts_down"]
    e1 = expert_view(stack, 1)
    assert e1.packed.ndim == 2 and e1.shape == stack.shape
    # views must be usable as plain QuantizedTensors
    x = jnp.ones((4, e1.kdim), jnp.float32)
    out = qgemm(x, e1, impl="xla")
    assert out.shape == (4, e1.mdim)


@pytest.mark.parametrize("ep,tp", [(8, 1), (4, 2), (2, 2)])
def test_ep_matches_single_device(ep, tp):
    """Expert-parallel (x tensor-parallel) MoE must match the single-device
    model along a teacher-forced path (same protocol as test_parallel)."""
    if len(jax.devices()) < ep * tp:
        pytest.skip("needs 8 devices")
    cfg = _tiny_moe_cfg(E=8, k=2)
    params = init_params(cfg, seed=0, tp=tp)
    mesh = epmod.make_moe_mesh(ep=ep, tp=tp)
    B, T, steps = 2, 4, 4
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))

    sparams = epmod.shard_params_moe(params, mesh)
    cache = epmod.shard_cache_moe(KVCache.create(cfg, B, T + steps), mesh)
    prefill_fn, decode_fn = epmod.make_ep_step(cfg, mesh, params,
                                               SamplerConfig(), impl="xla")
    logits, cache = prefill_fn(sparams, toks, cache)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    toks_out, cache = decode_fn(sparams, first, cache,
                                jax.random.PRNGKey(0), steps - 1)
    got = np.concatenate([np.asarray(first)[:, None], np.asarray(toks_out)], 1)

    # teacher-forced single-device logits along the ep-generated path
    ref_cache = KVCache.create(cfg, B, T + steps)
    ref_logits, ref_cache = forward(params, cfg, toks, ref_cache, impl="xla")
    refs = [np.asarray(ref_logits[:, -1, :], np.float32)]
    for t in range(steps - 1):
        lg, ref_cache = forward(params, cfg, jnp.asarray(got[:, t:t + 1]),
                                ref_cache, impl="xla")
        refs.append(np.asarray(lg[:, -1, :], np.float32))
    ref = np.stack(refs, 1)
    np.testing.assert_allclose(np.asarray(logits, np.float32), ref[:, 0],
                               rtol=5e-2, atol=0.1)
    agree = (ref.argmax(-1) == got).mean()
    assert agree >= 0.75, (ref.argmax(-1), got)
