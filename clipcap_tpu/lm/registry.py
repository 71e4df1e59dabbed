"""Unified language-model surface (the reference's lms/ package).

Every LM module implements the same functional protocol:

    init(rng, cfg, dtype)                         -> params
    apply(params, cfg, inputs_embeds, attention_mask=None, remat=False)
                                                  -> logits [B, T, V]
    embed_tokens(params, tokens)                  -> [B, T, D]
    embedding_size(params)                        -> int
    init_cache(cfg, batch, max_len, dtype)        -> cache
    prefill(params, cfg, inputs_embeds, cache)    -> (logits, cache)
    decode_step(params, cfg, token_embed, cache)  -> (logits [B, V], cache)

which is the KV-cached TPU superset of the reference wrappers' surface
(`create/get_embedding_size/get_embedding_text/call`, lms/GPT2.py:6-19,
lms/GPTJ.py:5-20, lms/T0.py:6-20). Name aliases follow the reference CLIs
(train.py:191-198: "gpt2", "gptj"/"gpt-j", "t0"/"t5").
"""

from __future__ import annotations

from ..core.config import GPT2Config, GPTJConfig, T5Config


def normalize_lm_type(lm_type: str) -> str:
    t = lm_type.lower()
    if t == "gpt2":
        return "gpt2"
    if t in ("gptj", "gpt-j"):
        return "gptj"
    if t in ("t0", "t5"):
        return "t5"
    raise ValueError(
        f"invalid language model type {lm_type!r} (expected 'gpt-j' / 'gpt2' / 't0' / 't5')"
    )


def get_lm(lm_type: str):
    """Return the LM module implementing the functional protocol."""
    t = normalize_lm_type(lm_type)
    if t == "gpt2":
        from ..models import gpt2

        return gpt2
    if t == "gptj":
        from ..models import gptj

        return gptj
    if t == "t5":
        from ..models import t5

        return t5
    raise AssertionError(t)


def get_lm_config(lm_type: str, variant: str):
    t = normalize_lm_type(lm_type)
    if t == "gpt2":
        return GPT2Config.variant(variant)
    if t == "gptj":
        return GPTJConfig.variant(variant)
    if t == "t5":
        return T5Config()
    raise AssertionError(t)
