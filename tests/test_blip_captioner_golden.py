"""Gen-B golden gate: BLIP caption generation token-for-token vs HF's
BlipForConditionalGeneration.generate (greedy), sharing weights through the
importer — pixels -> ViT -> cross-attended BERT decoder -> tokens.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from transformers import (
    BlipConfig,
    BlipForConditionalGeneration,
    BlipTextConfig as HFBlipTextConfig,
    BlipVisionConfig as HFBlipVisionConfig,
)

from clipcap_tpu.core.config import BlipTextConfig, ViTConfig
from clipcap_tpu.decode import GenerationSettings, generate
from clipcap_tpu.models import blip_text, vit
from clipcap_tpu.tools.import_weights import (
    blip_text_from_hf_state_dict,
    blip_vit_from_hf_state_dict,
)

VIT_CFG = ViTConfig(image_size=16, patch_size=8, width=24, layers=1, heads=4,
                    mlp_ratio=2.0, output_dim=None, style="blip",
                    layer_norm_epsilon=1e-5)
TEXT_CFG = BlipTextConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                          intermediate_size=64, max_position_embeddings=32,
                          encoder_width=24, layer_norm_epsilon=1e-12)

BOS, EOS, PAD = 60, 61, 0


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    cfg = BlipConfig(
        text_config=HFBlipTextConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=32, encoder_hidden_size=24,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
            sep_token_id=EOS, is_decoder=True, attn_implementation="eager",
        ).to_dict(),
        vision_config=HFBlipVisionConfig(
            image_size=16, patch_size=8, hidden_size=24, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=48, layer_norm_eps=1e-5,
            attention_dropout=0.0, attn_implementation="eager",
        ).to_dict(),
    )
    hf = BlipForConditionalGeneration(cfg).eval()
    sd = hf.state_dict()
    params = {
        "visual": blip_vit_from_hf_state_dict(
            {k[len("vision_model."):]: v for k, v in sd.items()
             if k.startswith("vision_model.")}, VIT_CFG),
        "text": blip_text_from_hf_state_dict(sd, TEXT_CFG, prefix="text_decoder."),
    }
    return hf, params


def torch_greedy_blip(hf, pixels: torch.Tensor, n_new: int):
    """Reference-style loop (sampling.py:166-279 structure, greedy): full
    decoder recompute per token with cross-attention to the ViT tokens."""
    with torch.no_grad():
        img = hf.vision_model(pixel_values=pixels).last_hidden_state
        img_mask = torch.ones(img.shape[:-1], dtype=torch.long)
        inputs = torch.full((pixels.shape[0], 1), BOS, dtype=torch.long)
        for _ in range(n_new):
            logits = hf.text_decoder(
                input_ids=inputs, encoder_hidden_states=img,
                encoder_attention_mask=img_mask,
            ).logits
            nxt = logits[:, -1].argmax(-1, keepdim=True)
            inputs = torch.cat([inputs, nxt], dim=-1)
    return inputs.numpy()


def test_greedy_caption_tokens_match_hf_generate(models):
    hf, params = models
    torch.manual_seed(1)
    pixels = torch.randn(2, 3, 16, 16)
    n_new = 10

    ref = torch_greedy_blip(hf, pixels, n_new)
    ref_generated = ref[:, 1:]

    img = vit.apply(params["visual"], VIT_CFG, jnp.asarray(pixels.numpy()),
                    output="tokens")
    lm = blip_text.decoder_lm(params["text"], TEXT_CFG, img)
    prompt = jnp.full((2, 1), BOS, jnp.int32)
    out = generate(
        lm, params["text"], TEXT_CFG, prompt,
        GenerationSettings(max_new_tokens=n_new, greedy=True, eos_token_id=EOS,
                           max_length=n_new + 1, pad_token_id=PAD),
    )
    got = np.asarray(out["tokens"])
    lengths = np.asarray(out["lengths"])

    for row in range(2):
        ref_row = [int(t) for t in ref_generated[row]]
        got_row = [int(t) for t in got[row][: lengths[row]]]
        # the torch loop keeps decoding past eos; compare up to our stop
        assert got_row == ref_row[: len(got_row)], (
            f"row {row}: ours {got_row} vs hf {ref_row}"
        )
        if lengths[row] < n_new:  # we stopped early => that token was eos
            assert got_row[-1] == EOS
