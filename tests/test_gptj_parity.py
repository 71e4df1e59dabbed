"""GPT-J parity vs HF GPTJForCausalLM (random tiny config, fp32), plus
KV-cache decode consistency.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from transformers import GPTJConfig as HFGPTJConfig, GPTJForCausalLM

from clipcap_tpu.core.config import GPTJConfig
from clipcap_tpu.models import gptj
from clipcap_tpu.tools.import_weights import gptj_from_state_dict

CFG = GPTJConfig(vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4, rotary_dim=8)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    hf = GPTJForCausalLM(
        HFGPTJConfig(
            vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4,
            rotary_dim=8, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
            attn_implementation="eager",
        )
    ).eval()
    params = gptj_from_state_dict(hf.state_dict(), CFG)
    return hf, params


def test_forward_parity(models):
    hf, params = models
    torch.manual_seed(1)
    embeds = torch.randn(2, 10, CFG.n_embd)
    with torch.no_grad():
        ref = hf(inputs_embeds=embeds).logits.numpy()
    ours = gptj.apply(params, CFG, jnp.asarray(embeds.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_forward_parity_with_mask(models):
    hf, params = models
    torch.manual_seed(2)
    embeds = torch.randn(2, 8, CFG.n_embd)
    mask = torch.ones(2, 8, dtype=torch.long)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = hf(inputs_embeds=embeds, attention_mask=mask).logits.numpy()
    ours = gptj.apply(params, CFG, jnp.asarray(embeds.numpy()),
                      attention_mask=jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(ours)[0], ref[0], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours)[1, :6], ref[1, :6], atol=2e-5, rtol=1e-4)


def test_kv_cache_decode(models):
    _, params = models
    embeds = jax.random.normal(jax.random.PRNGKey(0), (2, 12, CFG.n_embd))
    full = gptj.apply(params, CFG, embeds)
    cache = gptj.init_cache(CFG, batch=2, max_len=16)
    logits, cache = gptj.prefill(params, CFG, embeds[:, :7], cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :7]), atol=1e-4, rtol=1e-4)
    for t in range(7, 12):
        step, cache = gptj.decode_step(params, CFG, embeds[:, t : t + 1], cache)
        np.testing.assert_allclose(np.asarray(step), np.asarray(full[:, t]), atol=1e-4, rtol=1e-4)


def test_lm_protocol(models):
    _, params = models
    from clipcap_tpu.lm.registry import get_lm

    assert get_lm("gpt-j") is gptj
    assert gptj.embedding_size(params) == CFG.n_embd
    toks = jnp.asarray([[1, 2, 3]])
    assert gptj.embed_tokens(params, toks).shape == (1, 3, CFG.n_embd)
