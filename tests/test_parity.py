"""Model-level output-quality parity gate (tools/parity.py): production
forward vs an independent f32 dequant-oracle, per preset x quant mode.

The CPU suite runs scaled models through the XLA path (the dequant
contract executor); the hardware run (`tmac-tpu parity`, BENCH.md) runs
full-size models through the pallas kernels.  Reference role:
llama-perplexity quality parity (tools/run_pipeline.py:218) + the
NMSE <= 5e-4 kernel gate (python/t_mac/ops/qgemm.py:278) extended
model-wide.
"""

import numpy as np
import pytest

from tmac_tpu.models.config import get_preset
from tmac_tpu.tools import parity


@pytest.mark.parametrize("label,preset,quant_kw", [
    ("bitnet-w1.58", "bitnet-3b", {}),
    ("llama2-w2-zp", "llama-2-7b", {}),
    ("llama2-w4-zp", "llama-2-7b", {"bits": 4}),
    ("trilm-w2-sym", "trilm-3.9b", {}),
    ("llama3-w3-gqa", "llama-3-8b", {"bits": 3}),
    ("mixtral-w2-moe", "mixtral-8x7b", {}),
])
def test_model_parity_gate(label, preset, quant_kw):
    cfg = get_preset(preset, **quant_kw).scaled(8)
    r = parity.model_parity(cfg, seed=0, impl="xla")
    # model-level bar: an order of magnitude above the reference's
    # per-kernel 5e-4 to absorb cross-layer accumulation; real layout or
    # packing bugs produce nmse > 1e-1 and huge disagree gaps
    assert r["nmse"] < 2e-3, r
    # per-layer bisection: every production layer must match the oracle
    # layer from the same input (the full-size kernel-correctness gate;
    # immune to cross-layer amplification)
    assert r["layer_nmse_max"] < 2e-3, r
    assert r["agree_tie_aware"] == 1.0, r
    assert r["max_disagree_gap"] < 0.35, r
    # perplexity parity on the same weights (the llama-perplexity role):
    # the robust per-position NLL delta must be tight everywhere; the mean
    # ppl delta gets a looser bar because random-init chaotic positions
    # (see parity.model_parity) inflate it -- real checkpoints are
    # well-conditioned
    assert r["nll_delta_median"] < 0.01, r
    assert r["ppl_rel_delta"] < 0.05, r


def test_model_parity_gate_qwen2moe():
    """The shared-expert MoE family (all-expert-softmax routing + gated
    shared expert) through the same gate, at a CI-sized expert count."""
    import dataclasses
    cfg = dataclasses.replace(
        get_preset("qwen2-moe-a14b").scaled(8), num_experts=8,
        num_experts_per_tok=2, num_heads=4, num_kv_heads=2,
        moe_intermediate_size=512, moe_shared_intermediate_size=512)
    r = parity.model_parity(cfg, seed=0, impl="xla")
    assert r["nmse"] < 2e-3, r
    # per-layer bisection: every production layer must match the oracle
    # layer from the same input (the full-size kernel-correctness gate;
    # immune to cross-layer amplification)
    assert r["layer_nmse_max"] < 2e-3, r
    assert r["agree_tie_aware"] == 1.0, r
    assert r["nll_delta_median"] < 0.01, r


def test_oracle_catches_corruption():
    """The gate must actually FAIL on a corrupted model -- flip a few
    packed weight bytes and require a large NMSE."""
    import jax.numpy as jnp

    from tmac_tpu.models.llama import init_params

    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=0)
    dense = parity.dense_params(params)
    # corrupt layer 0 wqkv packed bytes AFTER densifying the oracle copy
    qt = params["layers"][0]["wqkv"]
    bad = qt.packed.at[:8, :].set(jnp.uint8(0xFF))
    params["layers"][0]["wqkv"] = type(qt)(
        packed=bad, packed_hi=qt.packed_hi, scales=qt.scales, sub=qt.sub,
        bits=qt.bits, group_size=qt.group_size, k_shards=qt.k_shards,
        m_shards=qt.m_shards, shape=qt.shape, m_segments=qt.m_segments)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, (1, 16))
    from tmac_tpu.models.llama import KVCache, forward
    cache = KVCache.create(cfg, 1, 32)
    logits, _ = forward(params, cfg, jnp.asarray(prompt), cache, impl="xla")
    want = parity.oracle_forward(dense, cfg, prompt)
    from tmac_tpu.utils import nmse
    e = float(nmse(want, np.asarray(logits, np.float32)))
    assert e > 1e-2, e


def test_parity_gate_rope_scaling_and_window():
    """The gate validates the long-context paths: the oracle honors
    rope_scaling via an INDEPENDENT frequency computation and applies
    the sliding-window mask, so scaled/windowed production forwards must
    still agree."""
    import dataclasses
    cfg = get_preset("llama-3.1-8b").scaled(8)  # llama3 rope scaling
    r = parity.model_parity(cfg, seed=0, impl="xla")
    assert r["nmse"] < 2e-3, r
    # per-layer bisection: every production layer must match the oracle
    # layer from the same input (the full-size kernel-correctness gate;
    # immune to cross-layer amplification)
    assert r["layer_nmse_max"] < 2e-3, r
    assert r["agree_tie_aware"] == 1.0, r
    # a window small enough to bite within the gate's prefill length
    cfgw = dataclasses.replace(get_preset("llama-2-7b").scaled(8),
                               sliding_window=8)
    r = parity.model_parity(cfgw, seed=0, impl="xla")
    assert r["nmse"] < 2e-3, r
    # per-layer bisection: every production layer must match the oracle
    # layer from the same input (the full-size kernel-correctness gate;
    # immune to cross-layer amplification)
    assert r["layer_nmse_max"] < 2e-3, r
    assert r["agree_tie_aware"] == 1.0, r


def test_parity_oracle_catches_ignored_window():
    """Negative control: if the production path IGNORED the window the
    gate must fail -- simulate by scoring a windowed oracle against an
    UNwindowed production forward."""
    import dataclasses
    base = get_preset("llama-2-7b").scaled(8)
    cfgw = dataclasses.replace(base, sliding_window=8)
    from tmac_tpu.models.llama import init_params
    params = init_params(base, seed=0)
    dense = parity.dense_params(params)
    toks = (np.arange(32, dtype=np.int32) % (base.vocab_size - 2) + 1)[None]
    import jax.numpy as jnp
    from tmac_tpu.models.llama import KVCache, forward
    prod, _ = forward(params, base, jnp.asarray(toks),
                      KVCache.create(base, 1, 32), impl="xla")  # NO window
    oracle = parity.oracle_forward(dense, cfgw, toks)            # windowed
    from tmac_tpu.utils import nmse
    tail = nmse(oracle[0, -1], np.asarray(prod)[0, -1].astype(np.float32))
    assert tail > 2e-3, tail  # the gate would catch it


@pytest.mark.parametrize("bits,gs,zp,ks,ms", [
    (2, 64, True, 1, 1),
    (4, 32, False, 1, 1),
    (3, 64, True, 1, 1),     # two-plane packing
    (2, 64, True, 2, 1),     # k-sharded (row-parallel packing)
    (4, 64, True, 1, 2),     # m-sharded (column-parallel padding)
])
def test_dense_weight_matches_identity_contract(bits, gs, zp, ks, ms):
    """The host-side dense_weight (numpy, no device traffic) must equal
    the executable dequant contract: identity @ qgemm_xla.  Guards the
    oracle's densification across every packing layout."""
    import jax.numpy as jnp

    from tmac_tpu.ops.qgemm import QuantizedTensor, qgemm_xla

    rng = np.random.default_rng(3)
    K, M = 256, 384  # M/ms not a lane multiple -> exercises m-padding
    w = rng.standard_normal((K, M)).astype(np.float32) / 16
    qt = QuantizedTensor.from_float(w, bits=bits, group_size=gs,
                                    zero_point=zp, k_shards=ks, m_shards=ms)
    got = parity.dense_weight(qt)
    eye = jnp.eye(K, dtype=jnp.float32)
    want = np.asarray(qgemm_xla(eye, qt, out_dtype=jnp.float32))
    assert got.shape == want.shape == (K, M)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_dense_weight_matches_identity_contract_fused_and_pertensor():
    import jax.numpy as jnp

    from tmac_tpu.models.config import get_preset
    from tmac_tpu.models.llama import init_params
    from tmac_tpu.ops.qgemm import qgemm_xla

    # fused wqkv (m_segments) from a real preset init + the BitNet
    # per-tensor w_a8 mode in one shot
    for preset in ("llama-2-7b", "bitnet-3b"):
        cfg = get_preset(preset).scaled(8)
        qt = init_params(cfg, seed=0)["layers"][0]["wqkv"]
        got = parity.dense_weight(qt)
        eye = jnp.eye(qt.kdim, dtype=jnp.float32)
        want = np.asarray(qgemm_xla(eye, qt, out_dtype=jnp.float32))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
