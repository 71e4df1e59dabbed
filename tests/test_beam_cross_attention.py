"""Beam search over cross-attention LMs (t5, BLIP decoder adapter).

The reference's generate_beam runs over whatever LM the captioner wraps —
including T0 (reference inference.py:70-148 with lms/T0.py) — so
beam_search must handle caches carrying encoder/cross-attention tensors.
Those tensors are beam-invariant (all beams decode the same prompt):
beam.py replicates them once at expansion and never gathers them on
reorder. These tests pin that against a rebuild-from-scratch oracle that
re-runs prefill + sequential decode_steps for every beam every step (no
cache reordering at all), and directly test the beam-invariance
assumption the no-gather optimization rests on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clipcap_tpu.core.config import BlipTextConfig, T5Config
from clipcap_tpu.decode import beam_search
from clipcap_tpu.models import blip_text, t5

T5_CFG = T5Config(vocab_size=89, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                  num_decoder_layers=2, num_heads=4)
BLIP_CFG = BlipTextConfig(vocab_size=83, hidden_size=32, num_layers=2,
                          num_heads=4, intermediate_size=64,
                          encoder_width=16, embed_dim=16)


@pytest.fixture(scope="module")
def t5_params():
    return t5.init(jax.random.PRNGKey(0), T5_CFG)


@pytest.fixture(scope="module")
def blip_setup():
    params = blip_text.init(jax.random.PRNGKey(1), BLIP_CFG)
    img = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 5, 16)).astype(np.float32)
    )
    return params, blip_text.decoder_lm(params, BLIP_CFG, img)


def oracle_beam(last_logits, beam_size, n):
    """Reference beam semantics (inference.py:70-137) in numpy, driven by a
    `last_logits(history_token_list) -> [V]` callback that rebuilds state
    from scratch — fully independent of beam.py's cache reorder/expand."""
    logits = last_logits([])
    logp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
    order = np.argsort(-logp)[:beam_size]
    scores = logp[order]
    tokens = order[:, None]
    seq_lengths = np.ones(beam_size)
    for _ in range(1, n):
        logps = []
        for b in range(beam_size):
            lg = last_logits([int(t) for t in tokens[b]])
            logps.append(lg - np.log(np.exp(lg - lg.max()).sum()) - lg.max())
        logp = np.stack(logps)
        vocab = logp.shape[-1]
        scores_sum = scores[:, None] + logp
        seq_lengths += 1
        avg = scores_sum / seq_lengths[:, None]
        flat = np.argsort(-avg.reshape(-1))[:beam_size]
        source = flat // vocab
        next_tokens = flat % vocab
        seq_lengths = seq_lengths[source]
        tokens = np.concatenate([tokens[source], next_tokens[:, None]], axis=1)
        scores = avg.reshape(-1)[flat] * seq_lengths
    return tokens, scores / seq_lengths


def test_t5_beam_matches_rebuild_oracle(t5_params):
    prompt = jax.random.normal(jax.random.PRNGKey(3), (1, 4, T5_CFG.d_model))
    n, beam = 6, 3

    def last_logits(history):
        cache = t5.init_cache(T5_CFG, batch=1, max_len=4 + n)
        logits, cache = t5.prefill(t5_params, T5_CFG, prompt, cache)
        out = logits[:, -1]
        for tok in history:
            emb = t5.embed_tokens(t5_params, jnp.asarray([tok]))[:, None, :]
            out, cache = t5.decode_step(t5_params, T5_CFG, emb, cache)
        return np.asarray(out[0], np.float32)

    want_tokens, want_scores = oracle_beam(last_logits, beam, n)
    out = beam_search(t5, t5_params, T5_CFG, prompt, beam_size=beam,
                      max_new_tokens=n)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), want_tokens)
    np.testing.assert_allclose(np.asarray(out["scores"]), want_scores,
                               atol=1e-4)


def test_blip_token_mode_beam_matches_rebuild_oracle(blip_setup):
    params, lm = blip_setup
    prompt = jnp.asarray([[2, 11, 12]])  # [1, 3] token ids
    n, beam = 6, 3

    def last_logits(history):
        cache = lm.init_cache(BLIP_CFG, batch=1, max_len=3 + n)
        logits, cache = lm.prefill(params, BLIP_CFG, prompt, cache)
        out = logits[:, -1]
        for tok in history:
            out, cache = lm.decode_step(
                params, BLIP_CFG, jnp.asarray([[tok]], jnp.int32), cache
            )
        return np.asarray(out[0], np.float32)

    want_tokens, want_scores = oracle_beam(last_logits, beam, n)
    out = beam_search(lm, params, BLIP_CFG, prompt, beam_size=beam,
                      max_new_tokens=n)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), want_tokens)
    np.testing.assert_allclose(np.asarray(out["scores"]), want_scores,
                               atol=1e-4)


def test_cross_fields_are_beam_invariant(t5_params):
    """The no-gather optimization's load-bearing assumption: after
    _expand_beams, permuting the cross/encoder fields by any beam order
    must not change decode_step's output (every beam row is identical)."""
    from clipcap_tpu.decode.beam import _CROSS_FIELDS, _expand_beams

    beam = 3
    prompt = jax.random.normal(jax.random.PRNGKey(4), (1, 4, T5_CFG.d_model))
    cache = t5.init_cache(T5_CFG, batch=1, max_len=8)
    _, cache = t5.prefill(t5_params, T5_CFG, prompt, cache)
    cache = _expand_beams(cache, beam)

    perm = jnp.asarray([2, 0, 1])
    upd = {}
    for name, axis in _CROSS_FIELDS.items():
        val = getattr(cache, name, None)
        if val is not None:
            upd[name] = jnp.take(val, perm, axis=axis)
    shuffled = cache._replace(**upd)
    assert upd, "t5 cache should carry cross fields"

    emb = t5.embed_tokens(t5_params, jnp.asarray([5, 7, 9]))[:, None, :]
    out_a, _ = t5.decode_step(t5_params, T5_CFG, emb, cache)
    out_b, _ = t5.decode_step(t5_params, T5_CFG, emb, shuffled)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
