"""BLIP ITM/ITC parity vs HF BlipForImageTextRetrieval (fp32, random tiny
config) — the ranking heads of reference sampling.py:40-62.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import (
    BlipConfig,
    BlipForImageTextRetrieval,
    BlipTextConfig as HFBlipTextConfig,
    BlipVisionConfig as HFBlipVisionConfig,
)

from clipcap_tpu.core.config import BlipTextConfig, ViTConfig
from clipcap_tpu.models import blip_retrieval
from clipcap_tpu.tools.import_weights import blip_retrieval_from_hf_state_dict

VIT_CFG = ViTConfig(image_size=16, patch_size=8, width=24, layers=1, heads=4,
                    mlp_ratio=2.0, output_dim=None, style="blip",
                    layer_norm_epsilon=1e-5)
TEXT_CFG = BlipTextConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                          intermediate_size=64, max_position_embeddings=32,
                          encoder_width=24, embed_dim=16, layer_norm_epsilon=1e-12)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    cfg = BlipConfig(
        text_config=HFBlipTextConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=32, encoder_hidden_size=24,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            attn_implementation="eager",
        ).to_dict(),
        vision_config=HFBlipVisionConfig(
            image_size=16, patch_size=8, hidden_size=24, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=48, layer_norm_eps=1e-5,
            attention_dropout=0.0, attn_implementation="eager",
        ).to_dict(),
        image_text_hidden_size=16,
    )
    hf = BlipForImageTextRetrieval(cfg).eval()
    params = blip_retrieval_from_hf_state_dict(hf.state_dict(), VIT_CFG, TEXT_CFG)
    return hf, params


def test_itm_parity(models):
    hf, params = models
    torch.manual_seed(1)
    pixels = torch.randn(2, 3, 16, 16)
    tokens = torch.randint(0, 64, (2, 7))
    mask = torch.ones(2, 7, dtype=torch.long)
    with torch.no_grad():
        ref_logits = hf(input_ids=tokens, pixel_values=pixels,
                        attention_mask=mask, use_itm_head=True).itm_score
        ref = torch.softmax(ref_logits, dim=1)[:, 1].numpy()
    img = blip_retrieval.encode_image(params, VIT_CFG, jnp.asarray(pixels.numpy()))
    ours = blip_retrieval.itm_score(params, TEXT_CFG, jnp.asarray(tokens.numpy()),
                                    img, jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def test_itc_parity(models):
    hf, params = models
    torch.manual_seed(2)
    pixels = torch.randn(2, 3, 16, 16)
    tokens = torch.randint(0, 64, (2, 6))
    mask = torch.ones(2, 6, dtype=torch.long)
    with torch.no_grad():
        out = hf(input_ids=tokens, pixel_values=pixels, attention_mask=mask,
                 use_itm_head=False).itm_score
        # HF returns the raw image-text similarity matrix [B, B]; the
        # per-pair score is its diagonal
        ref = out.diag().numpy() if out.ndim == 2 else out.numpy()
    img = blip_retrieval.encode_image(params, VIT_CFG, jnp.asarray(pixels.numpy()))
    ours = blip_retrieval.itc_score(params, TEXT_CFG, jnp.asarray(tokens.numpy()),
                                    img, jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)
