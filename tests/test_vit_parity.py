"""ViT / CLIP-text numerics parity vs HF torch models (random init, fp32),
including the all-features output mode that reproduces the reference's
monkeypatched CLIP forward (inference.py:422-444: no ln_post, @ proj).
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import (
    BlipVisionConfig,
    BlipVisionModel,
    CLIPTextConfig as HFCLIPTextConfig,
    CLIPTextModelWithProjection,
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
)

from clipcap_tpu.core.config import CLIPTextConfig, ViTConfig
from clipcap_tpu.models import clip_text, vit
from clipcap_tpu.tools.import_weights import (
    blip_vit_from_hf_state_dict,
    clip_text_from_hf_state_dict,
    clip_vit_from_hf_state_dict,
)

VIT_CFG = ViTConfig(image_size=32, patch_size=8, width=32, layers=2, heads=4,
                    mlp_ratio=2.0, output_dim=16, style="clip")


@pytest.fixture(scope="module")
def clip_vision():
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(
        CLIPVisionConfig(
            image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64, projection_dim=16,
            attention_dropout=0.0, attn_implementation="eager",
        )
    ).eval()
    params = clip_vit_from_hf_state_dict(hf.state_dict(), VIT_CFG)
    return hf, params


def test_clip_vit_pooled_parity(clip_vision):
    hf, params = clip_vision
    torch.manual_seed(1)
    pixels = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = hf(pixel_values=pixels).image_embeds.numpy()
    ours = vit.apply(params, VIT_CFG, jnp.asarray(pixels.numpy()), output="pooled")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def test_clip_vit_all_features_mode(clip_vision):
    """tokens_proj = all tokens @ proj with NO ln_post (the reference patch)."""
    hf, params = clip_vision
    torch.manual_seed(2)
    pixels = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        out = hf.vision_model(pixel_values=pixels, output_hidden_states=False)
        # HF last_hidden_state is pre-post_layernorm: exactly the patch's input
        ref = out.last_hidden_state.numpy() @ hf.visual_projection.weight.numpy().T
    ours = vit.apply(params, VIT_CFG, jnp.asarray(pixels.numpy()), output="tokens_proj")
    assert ours.shape == (2, VIT_CFG.seq_len, 16)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def test_blip_vit_parity():
    torch.manual_seed(3)
    cfg = ViTConfig(image_size=32, patch_size=8, width=32, layers=2, heads=4,
                    mlp_ratio=2.0, output_dim=None, style="blip",
                    layer_norm_epsilon=1e-5)
    hf = BlipVisionModel(
        BlipVisionConfig(
            image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64, attention_dropout=0.0,
            layer_norm_eps=1e-5, attn_implementation="eager",
        )
    ).eval()
    params = blip_vit_from_hf_state_dict(hf.state_dict(), cfg)
    torch.manual_seed(4)
    pixels = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = hf(pixel_values=pixels).last_hidden_state.numpy()
    ours = vit.apply(params, cfg, jnp.asarray(pixels.numpy()), output="tokens")
    assert ours.shape == ref.shape  # [B, 17, 32]
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def test_clip_text_parity():
    torch.manual_seed(5)
    cfg = CLIPTextConfig(vocab_size=64, context_length=16, width=32, layers=2,
                         heads=4, output_dim=16)
    hf = CLIPTextModelWithProjection(
        HFCLIPTextConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128, projection_dim=16,
            max_position_embeddings=16, attention_dropout=0.0,
            eos_token_id=63, attn_implementation="eager",
        )
    ).eval()
    params = clip_text_from_hf_state_dict(hf.state_dict(), cfg)
    torch.manual_seed(6)
    # CLIP-style rows: tokens then eot (max id), zero padding after
    tokens = torch.randint(1, 62, (3, 16))
    tokens[:, 0] = 62  # pretend sot
    tokens[0, 5], tokens[0, 6:] = 63, 0
    tokens[1, 10], tokens[1, 11:] = 63, 0
    tokens[2, 15] = 63
    with torch.no_grad():
        ref = hf(input_ids=tokens).text_embeds.numpy()
    ours = clip_text.apply(params, cfg, jnp.asarray(tokens.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def test_clip_vit_l14_real_geometry_parity():
    """ViT-L/14 at its REAL geometry (24 layers, width 1024, T=257,
    224px/patch14 — BASELINE config #3's encoder): parity vs the HF torch
    oracle at batch 1. The small-config tests above pin the math; this
    pins the L/14 shape path itself (pos-emb length, head dim 64,
    projection 768) that the config #3 bench runs (VERDICT r3 weak #6)."""
    torch.manual_seed(7)
    cfg = ViTConfig.clip_variant("ViT-L/14")
    hf = CLIPVisionModelWithProjection(
        CLIPVisionConfig(
            image_size=224, patch_size=14, hidden_size=1024,
            num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, projection_dim=768,
            attention_dropout=0.0, attn_implementation="eager",
        )
    ).eval()
    params = clip_vit_from_hf_state_dict(hf.state_dict(), cfg)
    torch.manual_seed(8)
    pixels = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        ref = hf(pixel_values=pixels).image_embeds.numpy()
    ours = vit.apply(params, cfg, jnp.asarray(pixels.numpy()),
                     output="pooled")
    assert cfg.seq_len == 257
    # 24 f32 layers accumulate more rounding than the 2-layer configs
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=1e-3)
