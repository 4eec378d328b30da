"""Lossless speculative SAMPLING (runtime/speculative._sampled_accept).

The rejection-sampling scheme (arXiv:2211.17192) must make the marginal
distribution of every emitted position exactly the serving sampler's --
verified empirically over vmapped keys, for both the deterministic-draft
(lookup) and draft-model forms, plus e2e generate runs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import init_params
from tmac_tpu.runtime.sampling import SamplerConfig, filtered_logits
from tmac_tpu.runtime.speculative import (_sampled_accept,
                                          generate_draft_speculative,
                                          generate_speculative)

V, K = 8, 3
N_TRIALS = 40_000


def _fixed_logits(seed, rows):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((rows, V)) * 1.5, jnp.float32)


def _empirical_first_marginal(draft, q_probs, cfg, logits):
    """Distribution of the FIRST emitted token over N_TRIALS keys.  The
    first position is the clean test: it is emitted in every trial
    (later positions only exist conditionally on acceptance)."""
    keys = jax.random.split(jax.random.PRNGKey(0), N_TRIALS)
    toks, _ = jax.vmap(
        lambda k: _sampled_accept(logits, draft, k, cfg, q_probs))(keys)
    first = np.asarray(toks[:, 0])
    return np.bincount(first, minlength=V) / N_TRIALS


def _target_p(logits, cfg):
    return np.asarray(jax.nn.softmax(filtered_logits(logits, cfg), -1))


@pytest.mark.parametrize("cfg", [
    SamplerConfig(temperature=1.0),
    SamplerConfig(temperature=0.7, top_k=4),
    SamplerConfig(temperature=1.3, top_p=0.8),
])
def test_deterministic_draft_preserves_distribution(cfg):
    logits = _fixed_logits(1, K + 1)
    p0 = _target_p(logits, cfg)[0]
    for draft0 in (int(np.argmax(p0)), int(np.argmin(p0))):
        draft = jnp.asarray([draft0, 1, 2], jnp.int32)
        emp = _empirical_first_marginal(draft, None, cfg, logits)
        # total-variation distance ~ O(1/sqrt(N)); 40k trials -> < 0.02
        assert 0.5 * np.abs(emp - p0).sum() < 0.02, (emp, p0)


def test_draft_model_q_preserves_distribution():
    cfg = SamplerConfig(temperature=1.0)
    logits = _fixed_logits(2, K + 1)
    p0 = _target_p(logits, cfg)[0]
    # a MISMATCHED proposal distribution q != p: draft tokens sampled
    # from q, acceptance must still reproduce p exactly
    rng = np.random.default_rng(3)
    q = jax.nn.softmax(jnp.asarray(rng.standard_normal((K, V)) * 2.0), -1)

    def trial(key):
        kd, ka = jax.random.split(key)
        draft = jax.vmap(
            lambda i: jax.random.categorical(
                jax.random.fold_in(kd, i), jnp.log(q[i])))(jnp.arange(K)
                                                           ).astype(jnp.int32)
        toks, _ = _sampled_accept(logits, draft, ka, cfg, q_probs=q)
        return toks[0]

    keys = jax.random.split(jax.random.PRNGKey(1), N_TRIALS)
    first = np.asarray(jax.vmap(trial)(keys))
    emp = np.bincount(first, minlength=V) / N_TRIALS
    assert 0.5 * np.abs(emp - p0).sum() < 0.02, (emp, p0)


def test_all_rejected_draft_is_resampled_from_residual():
    """q a point mass on token 0 with p(0) = 0 (top-k filtered out):
    always rejected, and the correction never emits token 0."""
    cfg = SamplerConfig(temperature=1.0, top_k=2)
    logits = jnp.asarray(
        np.array([[5.0, 4.0, -3.0, 0, 0, 0, 0, 0]] * (K + 1)), jnp.float32)
    draft = jnp.asarray([2, 2, 2], jnp.int32)  # filtered out by top-k
    keys = jax.random.split(jax.random.PRNGKey(2), 4000)
    toks, a = jax.vmap(
        lambda k: _sampled_accept(logits, draft, k, cfg))(keys)
    assert int(jnp.max(a)) == 0          # never accepted
    assert not np.any(np.asarray(toks[:, 0]) == 2)


def test_spiked_distribution_matches_greedy():
    """temperature > 0 but a near-point-mass distribution: sampled
    speculation emits the same stream as greedy speculation."""
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=0)
    # scale the head way up so softmax is a point mass
    import jax.tree_util as jtu
    prompt = np.asarray([[5, 6, 7, 6, 5, 6, 7, 6]], np.int32)
    greedy, _ = generate_speculative(params, cfg, prompt, max_new_tokens=10,
                                     impl="xla")
    hot = dataclasses.replace  # noqa: F841 (keep imports honest)
    sampled, _ = generate_speculative(
        params, cfg, prompt, max_new_tokens=10, impl="xla",
        sampler=SamplerConfig(temperature=1e-4), seed=0)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(sampled))


def test_generate_speculative_sampled_runs():
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=0)
    prompt = np.asarray([[1, 2, 3, 4]], np.int32)
    out, nf = generate_speculative(
        params, cfg, prompt, max_new_tokens=12, impl="xla",
        sampler=SamplerConfig(temperature=0.8, top_k=40), seed=7)
    assert np.asarray(out).shape == (1, 12)
    assert nf >= 1
    # different seeds give different streams (it is actually sampling)
    out2, _ = generate_speculative(
        params, cfg, prompt, max_new_tokens=12, impl="xla",
        sampler=SamplerConfig(temperature=0.8, top_k=40), seed=8)
    assert not np.array_equal(np.asarray(out), np.asarray(out2))


def test_generate_draft_speculative_sampled_runs():
    cfg_t = get_preset("llama-2-7b").scaled(8)
    params_t = init_params(cfg_t, seed=0)
    cfg_d = dataclasses.replace(cfg_t, num_layers=1, name="draft")
    params_d = init_params(cfg_d, seed=1)
    prompt = np.asarray([[1, 2, 3, 4]], np.int32)
    out, nft, nfd = generate_draft_speculative(
        params_t, cfg_t, params_d, cfg_d, prompt, max_new_tokens=10, k=3,
        impl="xla", sampler=SamplerConfig(temperature=0.9), seed=3)
    assert np.asarray(out).shape == (1, 10)
    assert nft >= 1 and nfd >= 3


def test_no_proposal_round_is_unbiased():
    """draft == -1 (no n-gram match) must resample from FULL p -- token
    id 0 keeps its probability (regression: the residual zeroed index 0,
    biasing it out of no-proposal rounds forever)."""
    cfg = SamplerConfig(temperature=1.0)
    # token 0 carries most of the mass
    logits = jnp.asarray([[3.0, 0.0, 0.0, 0.0, -1, -1, -1, -1]] * (K + 1),
                         jnp.float32)
    draft = jnp.asarray([-1, -1, -1], jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(4), 8000)
    toks, a = jax.vmap(
        lambda k: _sampled_accept(logits, draft, k, cfg))(keys)
    assert int(jnp.max(a)) == 0  # nothing to accept
    emp = np.bincount(np.asarray(toks[:, 0]), minlength=V) / 8000
    p0 = _target_p(logits, cfg)[0]
    assert 0.5 * np.abs(emp - p0).sum() < 0.02, (emp, p0)
