"""BLIP text decoder parity vs HF BlipTextLMHeadModel (fp32, random tiny
config): causal decoder with cross-attention to image tokens, text-only
encoder mode, and the KV-cached adapter used by the Gen-B sampler.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from transformers import BlipTextConfig as HFBlipTextConfig
from transformers.models.blip.modeling_blip_text import BlipTextLMHeadModel

from clipcap_tpu.core.config import BlipTextConfig
from clipcap_tpu.models import blip_text
from clipcap_tpu.tools.import_weights import blip_text_from_hf_state_dict

CFG = BlipTextConfig(
    vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=32, encoder_width=48,
)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    hf = BlipTextLMHeadModel(
        HFBlipTextConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=32, encoder_hidden_size=48,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            is_decoder=True, attn_implementation="eager",
        )
    ).eval()
    params = blip_text_from_hf_state_dict(hf.state_dict(), CFG)
    return hf, params


def test_decoder_parity_with_cross_attention(models):
    hf, params = models
    torch.manual_seed(1)
    tokens = torch.randint(0, 64, (2, 7))
    img = torch.randn(2, 5, 48)
    img_mask = torch.ones(2, 5, dtype=torch.long)
    with torch.no_grad():
        ref = hf(
            input_ids=tokens, encoder_hidden_states=img,
            encoder_attention_mask=img_mask,
        ).logits.numpy()
    ours = blip_text.apply(
        params, CFG, jnp.asarray(tokens.numpy()),
        encoder_hidden_states=jnp.asarray(img.numpy()),
        encoder_attention_mask=jnp.asarray(img_mask.numpy()),
        causal=True, with_lm_head=True,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_cached_adapter_matches_full(models):
    _, params = models
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 64, size=(2, 10)))
    img = jnp.asarray(rng.normal(size=(2, 5, 48)).astype(np.float32))

    full = blip_text.apply(params, CFG, tokens, encoder_hidden_states=img,
                           causal=True, with_lm_head=True)

    lm = blip_text.decoder_lm(params, CFG, img)
    cache = lm.init_cache(CFG, batch=2, max_len=12)
    logits, cache = lm.prefill(params, CFG, tokens[:, :6], cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :6]),
                               atol=1e-4, rtol=1e-4)
    for t in range(6, 10):
        step, cache = lm.decode_step(params, CFG, tokens[:, t : t + 1], cache)
        np.testing.assert_allclose(np.asarray(step), np.asarray(full[:, t]),
                                   atol=1e-4, rtol=1e-4)


def test_generate_engine_drives_blip_adapter(models):
    """decode.generate in token-id mode over the BLIP decoder adapter."""
    _, params = models
    from clipcap_tpu.decode import GenerationSettings, generate

    img = jnp.asarray(np.random.default_rng(1).normal(size=(3, 5, 48)).astype(np.float32))
    lm = blip_text.decoder_lm(params, CFG, img)
    prompt = jnp.asarray(np.tile(np.array([[2, 11, 12]]), (3, 1)))  # "a picture of"
    out = generate(
        lm, params, CFG, prompt,
        GenerationSettings(max_new_tokens=6, greedy=True, eos_token_id=3,
                           min_length=jnp.asarray([6, 0, 0]), max_length=6),
    )
    assert out["tokens"].shape == (3, 6)
    toks0 = np.asarray(out["tokens"][0])[: int(out["lengths"][0])]
    assert 3 not in toks0[:-1]


def test_grouped_cross_attention_matches_repeated_rows(models):
    """decoder_lm(repeat=S) over unrepeated image rows must match
    decoder_lm(repeat=1) over jnp.repeat'ed rows (the Gen-B layout,
    reference sampling.py:288) — the grouped path streams each image's
    cross K/V once instead of once per candidate row."""
    _, params = models
    rng = np.random.default_rng(2)
    S = 3
    img = jnp.asarray(rng.normal(size=(2, 5, 48)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 64, size=(2 * S, 8)))

    lm_rep = blip_text.decoder_lm(params, CFG, jnp.repeat(img, S, axis=0))
    cache = lm_rep.init_cache(CFG, batch=2 * S, max_len=10)
    ref, cache = lm_rep.prefill(params, CFG, tokens[:, :6], cache)
    ref_step, _ = lm_rep.decode_step(params, CFG, tokens[:, 6:7], cache)

    lm_grp = blip_text.decoder_lm(params, CFG, img, repeat=S)
    cache_g = lm_grp.init_cache(CFG, batch=2 * S, max_len=10)
    got, cache_g = lm_grp.prefill(params, CFG, tokens[:, :6], cache_g)
    got_step, _ = lm_grp.decode_step(params, CFG, tokens[:, 6:7], cache_g)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_step), np.asarray(ref_step), atol=1e-5, rtol=1e-5)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        lm_grp.init_cache(CFG, batch=5, max_len=10)  # not images x repeat
