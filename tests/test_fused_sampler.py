"""Fused Pallas filter+sampler: parity vs the XLA threshold path.

Runs in Pallas interpret mode on CPU. The on-core PRNG path cannot be
tested here (the interpret stub returns zero bits), so sampling parity is
pinned with INJECTED Gumbel noise — bit-identical selection vs the XLA
reference (filter -> perturb -> lax.top_k(2)). The PRNG path itself is
exercised on real TPU by bench.py's engine phase.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from clipcap_tpu.ops import sampling as S
from clipcap_tpu.ops.pallas import fused_sampler as F


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def test_fused_filter_matches_threshold_filter(rng):
    logits = jnp.asarray(rng.normal(size=(6, 512)).astype(np.float32) * 3)
    p = jnp.asarray([0.0, 0.1, 0.3, 0.5, 0.8, 0.95], jnp.float32)
    k = jnp.asarray([0.0, 5.0, 0.25, 0.0, 100.0, 3.0], jnp.float32)
    a = S.top_k_top_p_filter_threshold(logits, k, p)
    b = F.fused_filter(logits, k, p, interpret=True, block_rows=2)
    ma, mb = np.isfinite(np.asarray(a)), np.isfinite(np.asarray(b))
    np.testing.assert_array_equal(ma, mb)
    np.testing.assert_allclose(np.where(ma, np.asarray(a), 0.0),
                               np.where(mb, np.asarray(b), 0.0), rtol=1e-6)


def test_fused_filter_handles_neg_inf_rows(rng):
    """Pre-suppressed columns (the engine's min-length EOS -inf writes)
    must flow through both bisections unchanged."""
    logits = np.asarray(rng.normal(size=(4, 256)).astype(np.float32) * 2)
    logits[:, 7] = -np.inf
    logits = jnp.asarray(logits)
    p = jnp.asarray([0.5, 0.9, 0.0, 0.7], jnp.float32)
    k = jnp.asarray([0.0, 10.0, 3.0, 0.0], jnp.float32)
    a = S.top_k_top_p_filter_threshold(logits, k, p)
    b = F.fused_filter(logits, k, p, interpret=True, block_rows=4)
    np.testing.assert_array_equal(np.isfinite(np.asarray(a)),
                                  np.isfinite(np.asarray(b)))
    assert not np.isfinite(np.asarray(b)[:, 7]).any()


def test_fused_sample_matches_xla_with_injected_noise(rng):
    """filter -> +gumbel -> top-2 with the SAME noise must select the
    same (next, alt) pair as the XLA path, and alt_prob must equal the
    filtered softmax at alt."""
    B, V = 6, 512
    logits = jnp.asarray(rng.normal(size=(B, V)).astype(np.float32) * 3)
    p = jnp.asarray([0.0, 0.1, 0.3, 0.5, 0.8, 0.95], jnp.float32)
    k = jnp.asarray([0.0, 5.0, 0.25, 0.0, 100.0, 3.0], jnp.float32)
    g = jnp.asarray(rng.gumbel(size=(B, V)).astype(np.float32))

    nxt, alt, ap = F.fused_filter_sample(
        logits, k, p, seed=jnp.int32(7), gumbel_noise=g,
        interpret=pltpu.InterpretParams(), block_rows=2,
    )
    filt = S.top_k_top_p_filter_threshold(logits, k, p)
    _, idx = jax.lax.top_k(jnp.asarray(filt) + g, 2)
    probs = jax.nn.softmax(filt, axis=-1)
    want_ap = np.take_along_axis(
        np.asarray(probs), np.asarray(idx[:, 1:2]), axis=-1
    )[:, 0]
    np.testing.assert_array_equal(np.asarray(nxt), np.asarray(idx[:, 0]))
    np.testing.assert_array_equal(np.asarray(alt), np.asarray(idx[:, 1]))
    np.testing.assert_allclose(np.asarray(ap), want_ap, rtol=1e-5, atol=1e-7)


def test_fused_sample_singleton_kept_set_alt_prob_zero(rng):
    """When filtering keeps exactly one token the runner-up is degenerate
    in BOTH implementations (top-2 of an all -inf remainder); the engine
    guards on alt_prob > threshold, so alt_prob must come back 0."""
    logits = jnp.asarray([[10.0, 1.0, 0.5, -1.0]], jnp.float32)
    g = jnp.zeros((1, 4), jnp.float32)
    nxt, alt, ap = F.fused_filter_sample(
        logits, 1.0, 0.0, seed=jnp.int32(0), gumbel_noise=g,
        do_topp=False, interpret=pltpu.InterpretParams(), block_rows=1,
    )
    assert int(nxt[0]) == 0
    assert float(ap[0]) == 0.0


def test_fused_step_sample_matches_xla_pipeline(rng):
    """fused_step_sample's in-kernel prologue (raw eos logprob -> min-length
    eos suppression -> repetition penalty -> temperature) + filter + top-2
    must match the engine's XLA op chain bit-for-bit with injected noise."""
    B, V, EOS, PEN, TEMP = 6, 512, 9, 1.2, 0.9
    logits = jnp.asarray(rng.normal(size=(B, V)).astype(np.float32) * 3)
    p = jnp.asarray([0.0, 0.1, 0.3, 0.5, 0.8, 0.95], jnp.float32)
    k = jnp.asarray([0.0, 5.0, 0.25, 0.0, 100.0, 3.0], jnp.float32)
    hist = jnp.asarray(rng.integers(0, V, (B, 7)), jnp.int32)
    hist_valid = jnp.asarray(rng.random((B, 7)) < 0.7)
    suppress = jnp.asarray([True, False, True, False, False, True])
    g = jnp.asarray(rng.gumbel(size=(B, V)).astype(np.float32))

    appears = S.token_occurrence_mask(hist, V, tokens_valid=hist_valid)
    nxt, alt, ap, eos_lp = F.fused_step_sample(
        logits, k, p, seed=jnp.int32(3), appears=appears, penalty=PEN,
        temperature=TEMP, eos_token_id=EOS, suppress_eos=suppress,
        want_eos_lp=True, gumbel_noise=g,
        interpret=pltpu.InterpretParams(), block_rows=2,
    )

    # XLA reference: the exact engine.generate op order
    want_eos_lp = logits[:, EOS] - jax.scipy.special.logsumexp(logits, axis=-1)
    x = logits.at[:, EOS].set(jnp.where(suppress, -jnp.inf, logits[:, EOS]))
    x = S.repetition_penalty(x, hist, PEN, tokens_valid=hist_valid)
    x = x / TEMP
    filt = S.top_k_top_p_filter_threshold(x, k, p)
    _, idx = jax.lax.top_k(jnp.asarray(filt) + g, 2)
    probs = jax.nn.softmax(filt, axis=-1)
    want_ap = np.take_along_axis(
        np.asarray(probs), np.asarray(idx[:, 1:2]), axis=-1
    )[:, 0]

    np.testing.assert_allclose(np.asarray(eos_lp), np.asarray(want_eos_lp),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nxt), np.asarray(idx[:, 0]))
    np.testing.assert_array_equal(np.asarray(alt), np.asarray(idx[:, 1]))
    np.testing.assert_allclose(np.asarray(ap), want_ap, rtol=1e-5, atol=1e-7)


def test_engine_fused_step_falls_back_on_cpu(rng):
    """filter_method='fused_step' must be trajectory-identical to
    'threshold' off-TPU, like 'fused'."""
    from clipcap_tpu.core.config import GPT2Config
    from clipcap_tpu.decode import engine
    from clipcap_tpu.models import gpt2

    cfg = GPT2Config(n_embd=64, n_layer=2, n_head=4, vocab_size=97,
                     n_positions=64)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    prefix = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 64))
    kw = dict(top_p=0.8, repetition_penalty=1.2, min_length=2, max_length=10,
              eos_token_id=5)
    a = engine.generate(
        gpt2, params, cfg, prefix,
        engine.GenerationSettings(max_new_tokens=8,
                                  filter_method="fused_step", **kw),
        rng=jax.random.PRNGKey(2),
    )
    b = engine.generate(
        gpt2, params, cfg, prefix,
        engine.GenerationSettings(max_new_tokens=8,
                                  filter_method="threshold", **kw),
        rng=jax.random.PRNGKey(2),
    )
    np.testing.assert_array_equal(np.asarray(a["tokens"]),
                                  np.asarray(b["tokens"]))
    np.testing.assert_allclose(np.asarray(a["eos_logprob"]),
                               np.asarray(b["eos_logprob"]), rtol=1e-5)


def test_engine_fused_default_falls_back_on_cpu(rng):
    """filter_method='fused' (the default) must be trajectory-identical to
    'threshold' off-TPU: CPU goldens stay bit-stable."""
    from clipcap_tpu.core.config import GPT2Config
    from clipcap_tpu.decode import engine
    from clipcap_tpu.models import gpt2

    cfg = GPT2Config(n_embd=64, n_layer=2, n_head=4, vocab_size=97,
                     n_positions=64)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    prefix = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 64))
    for settings_kw in (
        dict(top_p=jnp.asarray([0.4, 0.6, 0.9]), repetition_penalty=1.2),
        dict(top_k=8.0, min_length=2, max_length=10, eos_token_id=5,
             min_alternate_prob=0.05),
    ):
        a = engine.generate(
            gpt2, params, cfg, prefix,
            engine.GenerationSettings(max_new_tokens=8, filter_method="fused",
                                      **settings_kw),
            rng=jax.random.PRNGKey(2),
        )
        b = engine.generate(
            gpt2, params, cfg, prefix,
            engine.GenerationSettings(max_new_tokens=8,
                                      filter_method="threshold", **settings_kw),
            rng=jax.random.PRNGKey(2),
        )
        np.testing.assert_array_equal(np.asarray(a["tokens"]),
                                      np.asarray(b["tokens"]))
