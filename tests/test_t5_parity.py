"""T5/T0 parity vs HF T5ForConditionalGeneration (fp32, random tiny config)
under the reference T0 wrapper contract: the same inputs_embeds feed both
encoder and decoder (lms/T0.py:19). Also checks gated-gelu (T0-style) and
the cached decode path.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

from clipcap_tpu.core.config import T5Config
from clipcap_tpu.models import t5
from clipcap_tpu.tools.import_weights import t5_from_state_dict


def make_pair(feed_forward_proj: str, tie: bool):
    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, dropout_rate=0.0,
        feed_forward_proj=feed_forward_proj, tie_word_embeddings=tie,
        attn_implementation="eager",
    )
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = T5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, feed_forward_proj=feed_forward_proj,
        tie_word_embeddings=tie,
    )
    params = t5_from_state_dict(hf.state_dict(), cfg)
    return hf, cfg, params


@pytest.mark.parametrize("proj,tie", [("relu", True), ("gated-gelu", False)])
def test_t0_call_contract_parity(proj, tie):
    hf, cfg, params = make_pair(proj, tie)
    torch.manual_seed(1)
    embeds = torch.randn(2, 9, 32)
    with torch.no_grad():
        ref = hf(inputs_embeds=embeds, decoder_inputs_embeds=embeds).logits.numpy()
    ours = t5.apply(params, cfg, jnp.asarray(embeds.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=1e-4)


def test_t0_parity_with_attention_mask():
    hf, cfg, params = make_pair("relu", True)
    torch.manual_seed(2)
    embeds = torch.randn(2, 8, 32)
    mask = torch.ones(2, 8, dtype=torch.long)
    mask[1, 5:] = 0
    with torch.no_grad():
        ref = hf(inputs_embeds=embeds, decoder_inputs_embeds=embeds,
                 attention_mask=mask).logits.numpy()
    ours = t5.apply(params, cfg, jnp.asarray(embeds.numpy()),
                    attention_mask=jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=1e-4)


def test_cached_decode_matches_full():
    _, cfg, params = make_pair("relu", True)
    embeds = jax.random.normal(jax.random.PRNGKey(0), (2, 11, 32))

    # full (uncached) forward with decoder == prompt + generated
    full = t5.apply(params, cfg, embeds[:, :6], decoder_inputs_embeds=embeds)

    cache = t5.init_cache(cfg, batch=2, max_len=16)
    # encoder sees only the 6-token prompt; decoder starts from the same prompt
    logits, cache = t5.prefill(params, cfg, embeds[:, :6], cache)
    # recompute full with matching encoder input
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, :6]), atol=1e-4, rtol=1e-4
    )
    for t_idx in range(6, 11):
        step, cache = t5.decode_step(params, cfg, embeds[:, t_idx : t_idx + 1], cache)
        np.testing.assert_allclose(
            np.asarray(step), np.asarray(full[:, t_idx]), atol=1e-4, rtol=1e-4
        )


def test_embed_surface():
    _, cfg, params = make_pair("relu", True)
    assert t5.embedding_size(params) == 32
    toks = jnp.asarray([[1, 2, 3]])
    ref = np.asarray(params["shared"])[np.array([[1, 2, 3]])]
    np.testing.assert_array_equal(np.asarray(t5.embed_tokens(params, toks)), ref)


def test_int8_params_track_f32_decode():
    """t5.quantize_params + the quant-dispatching linears: cached decode
    with int8 weights tracks the f32 path (prefill logits correlated,
    greedy steps mostly agreeing). int8 is what fits T0-11B on one chip."""
    from clipcap_tpu.core.config import T5Config
    from clipcap_tpu.models import t5 as m

    cfg = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_heads=4,
                   num_layers=2, num_decoder_layers=2,
                   feed_forward_proj="gated-gelu", tie_word_embeddings=True)
    params = m.init(jax.random.PRNGKey(0), cfg)
    q = m.quantize_params(params)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.d_model)) * 0.1

    cache = m.init_cache(cfg, batch=2, max_len=12)
    ref, rc = m.prefill(params, cfg, embeds, cache)
    cache8 = m.init_cache(cfg, batch=2, max_len=12)
    got, qc = m.prefill(q, cfg, embeds, cache8)
    corr = np.corrcoef(np.asarray(ref, np.float32).ravel(),
                       np.asarray(got, np.float32).ravel())[0, 1]
    assert corr > 0.995, corr

    agree = 0
    n = 8
    rt = jnp.argmax(ref[:, -1], axis=-1)
    qt = jnp.argmax(got[:, -1], axis=-1)
    for _ in range(n):
        agree += int((rt == qt).sum())
        remb = m.embed_tokens(params, rt)[:, None, :]
        qemb = m.embed_tokens(q, qt)[:, None, :]
        rl, rc = m.decode_step(params, cfg, remb, rc)
        ql, qc = m.decode_step(q, cfg, qemb, qc)
        rt, qt = jnp.argmax(rl, axis=-1), jnp.argmax(ql, axis=-1)
    assert agree / (2 * n) >= 0.6, agree / (2 * n)
