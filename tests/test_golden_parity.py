"""The BASELINE.md correctness gate: greedy-decode caption tokens must
match the reference pipeline token-for-token.

The oracle is the reference decode loop run in torch with HF's
GPT2LMHeadModel (the exact LM the reference wraps, lms/GPT2.py): the
visual prefix is produced by OUR mapper (weights shared bit-exactly via
the importer round-trip), concatenated in embedding space, and decoded
greedily with full recompute per token — the reference's generate_beam /
generate_no_beam structure (inference.py:97,249) restricted to argmax.
Our side runs the KV-cached scan engine. fp32 end to end.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from transformers import GPT2Config as HFGPT2Config, GPT2LMHeadModel

from clipcap_tpu.core.config import CaptionerConfig, GPT2Config, MapperConfig
from clipcap_tpu.decode import GenerationSettings, generate
from clipcap_tpu.decode.beam import beam_search
from clipcap_tpu.models import captioner, gpt2
from clipcap_tpu.tools.import_weights import gpt2_from_state_dict

LM_CFG = GPT2Config(vocab_size=211, n_positions=128, n_embd=64, n_layer=3, n_head=4)
MAP_CFG = MapperConfig(dim_clip=32, dim_embedding=64, prefix_length=8,
                       clip_length=4, num_layers=2, num_heads=4)
CAP_CFG = CaptionerConfig(lm_type="gpt2", mapper=MAP_CFG)


@pytest.fixture(scope="module")
def world():
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(
        HFGPT2Config(
            vocab_size=LM_CFG.vocab_size, n_positions=LM_CFG.n_positions,
            n_embd=LM_CFG.n_embd, n_layer=LM_CFG.n_layer, n_head=LM_CFG.n_head,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
            attn_implementation="eager",
        )
    ).eval()
    params = {
        "mapper": __import__("clipcap_tpu.models.mapper", fromlist=["init"]).init(
            jax.random.PRNGKey(0), MAP_CFG
        ),
        "lm": gpt2_from_state_dict(hf.state_dict(), LM_CFG),
    }
    prefix = np.random.default_rng(0).normal(size=(1, MAP_CFG.dim_clip)).astype(np.float32)
    prefix_embed = np.asarray(captioner.project_prefix(params, CAP_CFG, jnp.asarray(prefix)))
    return hf, params, prefix_embed


def torch_greedy(hf, embeds: torch.Tensor, n: int):
    """Reference-style full-recompute greedy loop."""
    tokens = []
    with torch.no_grad():
        for _ in range(n):
            logits = hf(inputs_embeds=embeds).logits[0, -1]
            nxt = int(torch.argmax(logits))
            tokens.append(nxt)
            emb = hf.transformer.wte(torch.tensor([[nxt]]))
            embeds = torch.cat([embeds, emb], dim=1)
    return tokens


def test_greedy_tokens_match_reference_pipeline(world):
    hf, params, prefix_embed = world
    n = 24
    want = torch_greedy(hf, torch.from_numpy(prefix_embed.copy()), n)
    out = generate(
        gpt2, params["lm"], LM_CFG, jnp.asarray(prefix_embed),
        GenerationSettings(max_new_tokens=n, greedy=True),
    )
    got = [int(t) for t in np.asarray(out["tokens"][0])]
    assert got == want, f"token mismatch:\n ours: {got}\n ref:  {want}"


def test_greedy_with_bos_prepend_matches(world):
    """The eval-decoder BOS-prepend variant (evaluate_model.py:123-128)."""
    hf, params, prefix_embed = world
    bos_id = LM_CFG.vocab_size - 1
    bos_embed_t = hf.transformer.wte(torch.tensor([[bos_id]]))
    embeds_t = torch.cat([torch.from_numpy(prefix_embed.copy()), bos_embed_t], dim=1)
    want = torch_greedy(hf, embeds_t, 16)

    bos_embed_j = gpt2.embed_tokens(params["lm"], jnp.asarray([[bos_id]]))
    prompt = jnp.concatenate([jnp.asarray(prefix_embed), bos_embed_j], axis=1)
    out = generate(gpt2, params["lm"], LM_CFG, prompt,
                   GenerationSettings(max_new_tokens=16, greedy=True))
    got = [int(t) for t in np.asarray(out["tokens"][0])]
    assert got == want


def torch_reference_beam(hf, embeds: torch.Tensor, beam_size: int, n: int,
                         stop_token: int = -1):
    """Literal reference generate_beam semantics (inference.py:70-137)."""
    scores = None
    tokens = None
    seq_lengths = torch.ones(beam_size)
    has_stopped = torch.zeros(beam_size, dtype=torch.bool)
    with torch.no_grad():
        for _ in range(n):
            logits = hf(inputs_embeds=embeds).logits
            logits = logits[:, -1, :]
            logits = logits.softmax(-1).log()
            if scores is None:
                scores, next_tokens = logits.topk(beam_size, -1)
                embeds = embeds.expand(beam_size, *embeds.shape[1:])
                next_tokens, scores = next_tokens.permute(1, 0), scores.squeeze(0)
                tokens = next_tokens
            else:
                logits[has_stopped] = -float(np.inf)
                logits[has_stopped, 0] = 0
                scores_sum = scores[:, None] + logits
                seq_lengths[~has_stopped] += 1
                avg = scores_sum / seq_lengths[:, None]
                avg, next_tokens = avg.view(-1).topk(beam_size, -1)
                source = torch.div(next_tokens, scores_sum.shape[1], rounding_mode="trunc")
                seq_lengths = seq_lengths[source]
                next_tokens = (next_tokens % scores_sum.shape[1]).unsqueeze(1)
                tokens = torch.cat([tokens[source], next_tokens], dim=1)
                embeds = embeds[source]
                scores = avg * seq_lengths
                has_stopped = has_stopped[source]
            emb = hf.transformer.wte(next_tokens.reshape(-1)).view(embeds.shape[0], 1, -1)
            embeds = torch.cat([embeds, emb], dim=1)
            has_stopped = has_stopped + next_tokens.reshape(-1).eq(stop_token)
            if has_stopped.all():
                break
    return tokens.numpy(), seq_lengths.numpy(), (scores / seq_lengths).numpy()


def test_beam_tokens_match_reference_pipeline(world):
    hf, params, prefix_embed = world
    n, beam = 12, 4
    ref_tokens, ref_lengths, ref_scores = torch_reference_beam(
        hf, torch.from_numpy(prefix_embed.copy()), beam, n
    )
    out = beam_search(gpt2, params["lm"], LM_CFG, jnp.asarray(prefix_embed),
                      beam_size=beam, max_new_tokens=n)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), ref_tokens)
    np.testing.assert_array_equal(np.asarray(out["seq_lengths"]),
                                  ref_lengths.astype(np.int32))
    np.testing.assert_allclose(np.asarray(out["scores"]), ref_scores, atol=1e-4)
