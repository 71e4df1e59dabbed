"""Committed golden-token fixtures: any change that alters emitted decode
tokens fails here, with no torch oracle needed (VERDICT r1 missing #5).

Pretrained checkpoints are not downloadable in this environment (see
PARITY.md "real-checkpoint constraint"); the fixtures pin deterministic
random-init weights at the REAL GPT-2 vocab size (50257) through every
decode surface: greedy engine, sampled engine with the vocab prefilter,
beam search, and the int8 quantized path. Regenerate deliberately with
`python tests/fixtures/generate_golden.py` after an intended
decode-semantics change.
"""

import json
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clipcap_tpu.core.config import CaptionerConfig, GPT2Config, MapperConfig
from clipcap_tpu.decode import GenerationSettings, generate
from clipcap_tpu.decode.beam import beam_search
from clipcap_tpu.models import captioner, gpt2

FIXTURE = Path(__file__).parent / "fixtures" / "golden_tokens.json"


@pytest.fixture(scope="module")
def world():
    fx = json.loads(FIXTURE.read_text())
    lm_cfg = GPT2Config(**fx["lm_cfg"])
    map_cfg = MapperConfig(**fx["map_cfg"])
    cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=map_cfg)
    params = captioner.init(jax.random.PRNGKey(0), cap_cfg, lm_cfg)
    clip_embed = jax.random.normal(jax.random.PRNGKey(1), (fx["batch"], 512), jnp.float32)
    prefix = captioner.project_prefix(params, cap_cfg, clip_embed)
    return fx, lm_cfg, params, prefix


def test_params_reproduce(world):
    fx, _, params, _ = world
    checksum = float(
        sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(params))
    )
    np.testing.assert_allclose(checksum, fx["param_checksum"], rtol=1e-6)


def test_greedy_tokens_frozen(world):
    fx, lm_cfg, params, prefix = world
    out = generate(gpt2, params["lm"], lm_cfg, prefix,
                   GenerationSettings(max_new_tokens=fx["new_tokens"], greedy=True))
    assert np.asarray(out["tokens"]).tolist() == fx["greedy"]


def test_sampled_tokens_frozen(world):
    fx, lm_cfg, params, prefix = world
    out = generate(
        gpt2, params["lm"], lm_cfg, prefix,
        GenerationSettings(max_new_tokens=fx["new_tokens"], top_p=0.8,
                           repetition_penalty=1.2, vocab_prefilter=512),
        rng=jax.random.PRNGKey(7),
    )
    assert np.asarray(out["tokens"]).tolist() == fx["sampled_top_p"]


def test_beam_tokens_frozen(world):
    fx, lm_cfg, params, prefix = world
    beam = beam_search(gpt2, params["lm"], lm_cfg, prefix[:1], beam_size=4,
                       max_new_tokens=16)
    assert np.asarray(beam["tokens"]).tolist() == fx["beam"]
    assert np.asarray(beam["seq_lengths"]).tolist() == fx["beam_lengths"]


def test_int8_greedy_tokens_frozen(world):
    fx, lm_cfg, params, prefix = world
    params_q = gpt2.quantize_params(params["lm"])
    out = generate(gpt2.gpt2_int8, params_q, lm_cfg, prefix,
                   GenerationSettings(max_new_tokens=fx["new_tokens"], greedy=True))
    assert np.asarray(out["tokens"]).tolist() == fx["greedy_int8"]


def test_gptj_int8_tokens_frozen(world):
    fx = world[0]
    from clipcap_tpu.core.config import GPTJConfig
    from clipcap_tpu.models import gptj

    cfg = GPTJConfig(**fx["gptj_cfg"])
    jp = gptj.init(jax.random.PRNGKey(3), cfg)
    jq = gptj.quantize_params(jp)
    jprefix = jax.random.normal(jax.random.PRNGKey(4), (fx["batch"], 10, cfg.n_embd),
                                jnp.float32)
    out = generate(gptj.gptj_int8, jq, cfg, jprefix.astype(jnp.bfloat16),
                   GenerationSettings(max_new_tokens=fx["new_tokens"], greedy=True))
    assert np.asarray(out["tokens"]).tolist() == fx["gptj_greedy_int8"]


def test_blip_grouped_tokens_frozen(world):
    fx = world[0]
    from clipcap_tpu.core.config import BlipTextConfig
    from clipcap_tpu.models import blip_text

    cfg = BlipTextConfig(**fx["blip_cfg"])
    bp = blip_text.init(jax.random.PRNGKey(5), cfg)
    img = jax.random.normal(jax.random.PRNGKey(6), (2, 8, cfg.encoder_width),
                            jnp.float32)
    lm = blip_text.decoder_lm(bp, cfg, img, repeat=2)
    prompt = jnp.asarray(np.tile(np.asarray([[101, 1037, 3861, 1997]]), (4, 1)))
    out = generate(lm, bp, cfg, prompt,
                   GenerationSettings(max_new_tokens=16, top_p=0.8,
                                      repetition_penalty=1.3, eos_token_id=102,
                                      min_length=4, vocab_prefilter=512),
                   rng=jax.random.PRNGKey(9), prompt_tokens=prompt)
    assert np.asarray(out["tokens"]).tolist() == fx["blip_grouped_sampled"]
    assert np.asarray(out["lengths"]).tolist() == fx["blip_grouped_lengths"]
