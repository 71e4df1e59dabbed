"""Regenerate tests/fixtures/golden_tokens.json.

Random-weight golden decode fixtures (VERDICT r1 missing #5): pretrained
checkpoints are NOT downloadable in this environment (no network; nothing
cached), so the token-level regression gate uses deterministic
random-init weights at the real GPT-2 vocabulary size. The companion
torch-oracle tests (test_golden_parity.py) pin the semantics against the
reference pipeline; THESE fixtures pin the emitted tokens against
ourselves, so any future change that alters decode output fails
tests/test_golden_fixtures.py without needing torch.

Run from the repo root:  python tests/fixtures/generate_golden.py
"""

import json
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")  # deterministic, env-independent

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clipcap_tpu.core.config import CaptionerConfig, GPT2Config, MapperConfig  # noqa: E402
from clipcap_tpu.decode import GenerationSettings, generate  # noqa: E402
from clipcap_tpu.decode.beam import beam_search  # noqa: E402
from clipcap_tpu.models import captioner, gpt2  # noqa: E402

OUT = Path(__file__).parent / "golden_tokens.json"

# realistic vocab (GPT-2's 50257) at a CPU-feasible width — exercises the
# real lm_head scale and the vocab prefilter's candidate math
LM_CFG = dict(vocab_size=50257, n_positions=256, n_embd=256, n_layer=6, n_head=8)
MAP_CFG = dict(dim_clip=512, dim_embedding=256, prefix_length=10, clip_length=10,
               num_layers=4, num_heads=8)
BATCH, NEW = 4, 24


def build():
    lm_cfg = GPT2Config(**LM_CFG)
    map_cfg = MapperConfig(**MAP_CFG)
    cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=map_cfg)
    params = captioner.init(jax.random.PRNGKey(0), cap_cfg, lm_cfg)
    clip_embed = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 512), jnp.float32)
    prefix = captioner.project_prefix(params, cap_cfg, clip_embed)

    fixtures = {"lm_cfg": LM_CFG, "map_cfg": MAP_CFG, "batch": BATCH, "new_tokens": NEW}
    fixtures["param_checksum"] = float(
        sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(params))
    )

    out = generate(gpt2, params["lm"], lm_cfg, prefix,
                   GenerationSettings(max_new_tokens=NEW, greedy=True))
    fixtures["greedy"] = np.asarray(out["tokens"]).tolist()

    out = generate(
        gpt2, params["lm"], lm_cfg, prefix,
        GenerationSettings(max_new_tokens=NEW, top_p=0.8, repetition_penalty=1.2,
                           vocab_prefilter=512),
        rng=jax.random.PRNGKey(7),
    )
    fixtures["sampled_top_p"] = np.asarray(out["tokens"]).tolist()

    beam = beam_search(gpt2, params["lm"], lm_cfg, prefix[:1], beam_size=4,
                       max_new_tokens=16)
    fixtures["beam"] = np.asarray(beam["tokens"]).tolist()
    fixtures["beam_lengths"] = np.asarray(beam["seq_lengths"]).tolist()

    params_q = gpt2.quantize_params(params["lm"])
    out = generate(gpt2.gpt2_int8, params_q, lm_cfg, prefix,
                   GenerationSettings(max_new_tokens=NEW, greedy=True))
    fixtures["greedy_int8"] = np.asarray(out["tokens"]).tolist()

    # GPT-J int8 weight-streaming path (rotary pre-quantization, int8 KV)
    from clipcap_tpu.core.config import GPTJConfig
    from clipcap_tpu.models import gptj

    gptj_cfg = dict(vocab_size=50400, n_positions=256, n_embd=256, n_layer=4,
                    n_head=8, rotary_dim=32)
    fixtures["gptj_cfg"] = gptj_cfg
    jp = gptj.init(jax.random.PRNGKey(3), GPTJConfig(**gptj_cfg))
    jq = gptj.quantize_params(jp)
    jprefix = jax.random.normal(jax.random.PRNGKey(4), (BATCH, 10, 256), jnp.float32)
    out = generate(gptj.gptj_int8, jq, GPTJConfig(**gptj_cfg),
                   jprefix.astype(jnp.bfloat16),
                   GenerationSettings(max_new_tokens=NEW, greedy=True))
    fixtures["gptj_greedy_int8"] = np.asarray(out["tokens"]).tolist()

    # BLIP grouped cross-attention decode (decoder_lm repeat>1, the Gen-B
    # layout): candidates of one image share its cross K/V
    from clipcap_tpu.core.config import BlipTextConfig
    from clipcap_tpu.models import blip_text

    blip_cfg = dict(vocab_size=30522, hidden_size=128, num_layers=3,
                    num_heads=4, intermediate_size=256,
                    max_position_embeddings=128, encoder_width=96, embed_dim=64)
    fixtures["blip_cfg"] = blip_cfg
    bp = blip_text.init(jax.random.PRNGKey(5), BlipTextConfig(**blip_cfg))
    img = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 96), jnp.float32)
    lm = blip_text.decoder_lm(bp, BlipTextConfig(**blip_cfg), img, repeat=2)
    prompt = jnp.asarray(np.tile(np.asarray([[101, 1037, 3861, 1997]]), (4, 1)))
    out = generate(lm, bp, BlipTextConfig(**blip_cfg), prompt,
                   GenerationSettings(max_new_tokens=16, top_p=0.8,
                                      repetition_penalty=1.3, eos_token_id=102,
                                      min_length=4, vocab_prefilter=512),
                   rng=jax.random.PRNGKey(9), prompt_tokens=prompt)
    fixtures["blip_grouped_sampled"] = np.asarray(out["tokens"]).tolist()
    fixtures["blip_grouped_lengths"] = np.asarray(out["lengths"]).tolist()
    return fixtures


if __name__ == "__main__":
    OUT.write_text(json.dumps(build(), indent=1))
    print(f"wrote {OUT}")
