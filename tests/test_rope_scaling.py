"""Long-context RoPE frequency scaling (models/llama._scaled_inv_freqs).

Real llama-3.1 / yarn-extended checkpoints carry rope_scaling configs
(HF config.json) or rope_freqs.weight divisors (gguf); converting them
without honoring the scaling silently corrupts attention beyond the
original context.  Reference analog: llama.cpp's rope freq_factors path
(the -c 2048 long-context role, tools/run_pipeline.py:262).
"""

import numpy as np
import pytest

from tmac_tpu.convert import gguf
from tmac_tpu.models.config import ModelConfig, get_preset
from tmac_tpu.models.llama import _scaled_inv_freqs, rope_tables


def _base(head_dim=128, theta=500000.0):
    f, s = _scaled_inv_freqs(head_dim, theta, None)
    assert s == 1.0
    return f


def test_linear_scaling():
    base = _base()
    f, s = _scaled_inv_freqs(128, 500000.0, ("linear", 4.0))
    np.testing.assert_allclose(f, base / 4.0, rtol=1e-6)
    assert s == 1.0


def test_factors_scaling():
    base = _base()
    fac = np.linspace(1.0, 8.0, 64)
    f, _ = _scaled_inv_freqs(128, 500000.0, ("factors", tuple(fac)))
    np.testing.assert_allclose(f, base / fac, rtol=1e-6)


def test_llama3_piecewise():
    """High-frequency dims keep the base rotation, low-frequency dims
    divide by the factor, mid dims blend monotonically."""
    base = _base()
    f, _ = _scaled_inv_freqs(128, 500000.0, ("llama3", 8.0, 8192, 1.0, 4.0))
    np.testing.assert_allclose(f[0], base[0], rtol=1e-6)      # untouched
    np.testing.assert_allclose(f[-1], base[-1] / 8.0, rtol=1e-6)
    ratio = f / base
    assert np.all(ratio <= 1.0 + 1e-6) and np.all(ratio >= 1 / 8.0 - 1e-6)
    assert np.all(np.diff(ratio) <= 1e-6)  # monotone toward 1/factor


def test_yarn_ramp_and_attention_scale():
    base = _base(theta=10000.0)
    f, s = _scaled_inv_freqs(128, 10000.0, ("yarn", 4.0, 4096))
    np.testing.assert_allclose(f[0], base[0], rtol=1e-6)       # extrapolated
    np.testing.assert_allclose(f[-1], base[-1] / 4.0, rtol=1e-6)
    assert abs(s - (0.1 * np.log(4.0) + 1.0)) < 1e-9


def test_rope_tables_scaled_vs_plain():
    import jax.numpy as jnp
    pos = jnp.arange(8)[None, :]
    cos_p, _ = rope_tables(pos, 64, 10000.0)
    cos_l, _ = rope_tables(pos, 64, 10000.0, ("linear", 2.0))
    # linear scaling == halving positions: scaled tables at pos p match
    # plain tables at pos p/2
    np.testing.assert_allclose(np.asarray(cos_l)[:, 4],
                               np.asarray(cos_p)[:, 2], atol=1e-6)


def test_config_json_roundtrip():
    import dataclasses
    for rs in (("linear", 4.0),
               ("llama3", 8.0, 8192, 1.0, 4.0),
               ("factors", tuple(float(i + 1) for i in range(64)))):
        cfg = dataclasses.replace(get_preset("llama-3-8b"), rope_scaling=rs)
        cfg2 = ModelConfig.from_json(cfg.to_json())
        assert cfg2.rope_scaling == rs
        hash(cfg2)  # must stay hashable (cfg is a static jit arg)


def test_hf_config_translation():
    from tmac_tpu.convert.hf import _rope_scaling_from_hf
    assert _rope_scaling_from_hf({}) is None
    assert _rope_scaling_from_hf({"rope_scaling": None}) is None
    assert _rope_scaling_from_hf(
        {"rope_scaling": {"type": "linear", "factor": 2.0}}) == ("linear", 2.0)
    rs = _rope_scaling_from_hf({"rope_scaling": {
        "rope_type": "llama3", "factor": 8.0,
        "original_max_position_embeddings": 8192,
        "low_freq_factor": 1.0, "high_freq_factor": 4.0}})
    assert rs == ("llama3", 8.0, 8192, 1.0, 4.0)
    with pytest.raises(NotImplementedError):
        _rope_scaling_from_hf({"rope_scaling": {"type": "longrope",
                                                "factor": 4.0}})


def test_gguf_rope_freqs_roundtrip(tmp_path):
    """gguf rope_freqs.weight -> cfg ('factors', ...) -> export writes the
    identical divisor tensor back out; forward runs with scaling."""
    from tests.test_gguf import _write_tiny_llama_gguf
    from tmac_tpu.convert.gguf_export import export_gguf
    from tmac_tpu.runtime.generate import generate

    cfg0 = get_preset("llama-2-7b").scaled(8)
    rng = np.random.default_rng(11)
    path = str(tmp_path / "m.gguf")
    half = cfg0.head_dim // 2
    fac = np.linspace(1.0, 8.0, half).astype(np.float32)

    orig = gguf.write_gguf

    def with_freqs(p, md, tensors):
        tensors = dict(tensors)
        tensors["rope_freqs.weight"] = (gguf.GGML_F32, fac)
        orig(p, md, tensors)

    gguf.write_gguf = with_freqs
    try:
        _write_tiny_llama_gguf(path, cfg0, rng)
    finally:
        gguf.write_gguf = orig

    cfg, params = gguf.convert_gguf_model(path, name="scaled")
    assert cfg.rope_scaling is not None
    assert cfg.rope_scaling[0] == "factors"
    np.testing.assert_allclose(cfg.rope_scaling[1], fac, rtol=1e-6)

    out = np.asarray(generate(params, cfg, np.asarray([[1, 2, 3]], np.int32),
                              max_new_tokens=4))
    assert out.shape == (1, 4)

    out_path = str(tmp_path / "re.gguf")
    export_gguf(out_path, cfg, params)
    r = gguf.GGUFReader(out_path)
    back = r.dequantized("rope_freqs.weight").reshape(-1)
    r.close()
    np.testing.assert_allclose(back, fac, rtol=1e-5)


def test_scaled_model_differs_past_context():
    """Scaling changes logits (sanity: the knob is actually wired into
    the forward path)."""
    import dataclasses
    from tmac_tpu.models.llama import KVCache, forward, init_params

    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=0)
    cfg2 = dataclasses.replace(cfg, rope_scaling=("linear", 4.0))
    toks = np.arange(1, 17, dtype=np.int32)[None, :]
    a = np.asarray(forward(params, cfg, toks,
                           KVCache.create(cfg, 1, 32), impl="xla")[0])
    b = np.asarray(forward(params, cfg2, toks,
                           KVCache.create(cfg, 1, 32), impl="xla")[0])
    assert not np.allclose(a, b)


def test_yarn_matches_hf_reference_values():
    """YaRN correction dims vs the published formula (HF
    _compute_yarn_parameters): head_dim=128, theta=1e4, orig=4096,
    factor=4 -> correction range [20, 46]; interior dims must blend,
    not just the endpoints (regression: a /2 error halved the range)."""
    base = _base(theta=10000.0)
    f, _ = _scaled_inv_freqs(128, 10000.0, ("yarn", 4.0, 4096))
    ratio = f / base
    # dims below floor(20.95)=20: pure extrapolation (ratio 1)
    np.testing.assert_allclose(ratio[:20], 1.0, atol=1e-9)
    # dims above ceil(45.03)=46: pure interpolation (ratio 1/4)
    np.testing.assert_allclose(ratio[47:], 0.25, atol=1e-9)
    # the blend region is strictly between
    assert np.all(ratio[21:46] < 1.0) and np.all(ratio[21:46] > 0.25)
