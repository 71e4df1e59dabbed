"""Captioner forward/loss parity: our mapper+GPT-2 pipeline against a
torch oracle that reproduces the reference's training-step math
(model.py:132-149 forward, :203-209 loss) using HF's GPT2LMHeadModel
for the LM half.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from transformers import GPT2Config as HFGPT2Config, GPT2LMHeadModel

from clipcap_tpu.core.config import CaptionerConfig, GPT2Config, MapperConfig
from clipcap_tpu.models import captioner, gpt2
from clipcap_tpu.tools.import_weights import gpt2_from_state_dict

LM_CFG = GPT2Config(vocab_size=101, n_positions=96, n_embd=48, n_layer=2, n_head=4)
MAP_CFG = MapperConfig(
    dim_clip=24, dim_embedding=48, prefix_length=6, clip_length=4,
    num_layers=2, num_heads=4,
)
CAP_CFG = CaptionerConfig(lm_type="gpt2", mapper=MAP_CFG)


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(
        HFGPT2Config(
            vocab_size=101, n_positions=96, n_embd=48, n_layer=2, n_head=4,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
            attn_implementation="eager",
        )
    ).eval()
    lm_params = gpt2_from_state_dict(hf.state_dict(), LM_CFG)
    params = {
        "mapper": __import__("clipcap_tpu.models.mapper", fromlist=["init"]).init(
            jax.random.PRNGKey(0), MAP_CFG
        ),
        "lm": lm_params,
    }
    return hf, params


def test_caption_loss_matches_torch_oracle(setup):
    hf, params = setup
    rng = np.random.default_rng(0)
    b, t = 3, 10
    prefix = rng.normal(size=(b, MAP_CFG.dim_clip)).astype(np.float32)
    tokens = rng.integers(1, 101, size=(b, t)).astype(np.int64)
    tokens[0, 7:] = -1  # -1 padding (reference create_dataset.py:230-234)
    tokens[1, 4] = 0  # genuine id-0 token: must ALSO be ignored by the loss

    loss, metrics = captioner.caption_loss(
        params, CAP_CFG, LM_CFG, jnp.asarray(tokens), jnp.asarray(prefix)
    )

    # ---- torch oracle -------------------------------------------------------
    tt = torch.from_numpy(tokens.copy())
    mask = tt.ge(0)
    tt[~mask] = 0
    # prefix projections from our mapper (the LM half is the cross-check)
    proj = np.asarray(captioner.project_prefix(params, CAP_CFG, jnp.asarray(prefix)))
    emb_text = hf.transformer.wte(tt)
    cat = torch.cat([torch.from_numpy(proj), emb_text], dim=1)
    full_mask = torch.cat([torch.ones(b, MAP_CFG.prefix_length, dtype=torch.bool), mask], dim=1)
    with torch.no_grad():
        logits = hf(inputs_embeds=cat, attention_mask=full_mask).logits
    sl = logits[:, MAP_CFG.prefix_length - 1 : -1]
    want = F.cross_entropy(sl.reshape(-1, sl.shape[-1]), tt.flatten(), ignore_index=0)

    np.testing.assert_allclose(float(loss), float(want), atol=1e-5, rtol=1e-5)


def test_forward_shapes_and_prefix_mask(setup):
    _, params = setup
    b, t = 2, 8
    tokens = jnp.ones((b, t), jnp.int32)
    prefix = jnp.ones((b, MAP_CFG.dim_clip))
    logits = captioner.forward(params, CAP_CFG, LM_CFG, tokens, prefix)
    assert logits.shape == (b, MAP_CFG.prefix_length + t, LM_CFG.vocab_size)


def test_normalize_prefix(setup):
    _, params = setup
    cfg_norm = CaptionerConfig(lm_type="gpt2", mapper=MAP_CFG, normalize_prefix=True)
    prefix = jnp.asarray(np.random.default_rng(1).normal(size=(2, 24)).astype(np.float32)) * 10
    a = captioner.project_prefix(params, cfg_norm, prefix)
    b = captioner.project_prefix(params, cfg_norm, prefix * 3.7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainable_filter_prefix_only(setup):
    _, params = setup
    cfg = CaptionerConfig(lm_type="gpt2", mapper=MAP_CFG, prefix_only=True)
    filt = captioner.trainable_filter(params, cfg)
    assert all(jax.tree_util.tree_leaves(filt["mapper"]))
    assert not any(jax.tree_util.tree_leaves(filt["lm"]))
    cfg_full = CaptionerConfig(lm_type="gpt2", mapper=MAP_CFG, prefix_only=False)
    filt = captioner.trainable_filter(params, cfg_full)
    assert all(jax.tree_util.tree_leaves(filt["lm"]))
