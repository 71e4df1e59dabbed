"""The ClipCap captioner: visual prefix + mapper + causal LM.

Functional rebuild of the reference's CLIPCaptionModel
(reference model.py:25-216) with the exact training semantics:

- forward (model.py:132-149): text-embedding lookup, mapper projection,
  concat [prefix_proj ‖ text_emb], prefix-extended attention mask, LM call;
- training_step quirks (model.py:203-209): tokens are padded with -1, the
  attention mask is `tokens >= 0`, negative tokens are zeroed, and the loss
  is cross-entropy of `logits[:, prefix_length-1:-1]` against the raw
  tokens with ignore_index=0 — so both the zeroed padding positions AND
  genuine token id 0 are excluded (a reference quirk we replicate exactly
  for parity);
- prefix-only training (CLIPCaptionPrefixOnly, model.py:219-226) is a
  gradient partition, not a subclass: `trainable_filter` marks which leaves
  of the param tree receive gradients/optimizer state.

Params layout: {"mapper": ..., "lm": ..., ["visual": ...]}.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import CaptionerConfig
from ..lm.registry import get_lm
from . import mapper as mapper_mod


def init(rng: jax.Array, cfg: CaptionerConfig, lm_cfg, dtype=jnp.float32) -> dict:
    k_map, k_lm = jax.random.split(rng)
    lm = get_lm(cfg.lm_type)
    return {
        "mapper": mapper_mod.init(k_map, cfg.mapper, dtype),
        "lm": lm.init(k_lm, lm_cfg, dtype),
    }


def project_prefix(params: dict, cfg: CaptionerConfig, prefix: jnp.ndarray) -> jnp.ndarray:
    """Visual features -> prefix_length LM pseudo-token embeddings.

    Applies the optional L2 prefix normalization of the preprocessed-shard
    path (reference dataset.py:167-168) before the mapper.
    """
    if cfg.normalize_prefix:
        prefix = prefix / jnp.linalg.norm(prefix, axis=-1, keepdims=True)
    return mapper_mod.apply(params["mapper"], prefix, cfg.mapper)


def forward(
    params: dict,
    cfg: CaptionerConfig,
    lm_cfg,
    tokens: jnp.ndarray,  # [B, T] int (already zeroed where padded)
    prefix: jnp.ndarray,  # [B, dim_clip] or [B, Tc, dim_clip]
    mask: Optional[jnp.ndarray] = None,  # [B, T] text attention mask
    remat: bool = False,
    logits_slice=None,
    lm_apply=None,
) -> jnp.ndarray:
    """Reference model.py:132-149. Returns logits [B, P+T, V] (or the
    logits_slice positions of it — see gpt2.apply).

    lm_apply: optional override for the LM forward — same contract as
    lm.apply minus remat, e.g. parallel/pp.make_gpt2_pp_apply's pipelined
    stack (which bakes remat in at construction).
    """
    lm = get_lm(cfg.lm_type)
    embedding_text = lm.embed_tokens(params["lm"], tokens)
    prefix_projections = project_prefix(params, cfg, prefix).astype(embedding_text.dtype)
    embedding_cat = jnp.concatenate([prefix_projections, embedding_text], axis=1)

    if mask is None:
        mask = jnp.ones(tokens.shape, dtype=bool)
    full_mask = jnp.concatenate(
        [jnp.ones(prefix_projections.shape[:-1], dtype=mask.dtype), mask], axis=1
    )
    if lm_apply is not None:
        return lm_apply(params["lm"], embedding_cat, attention_mask=full_mask,
                        logits_slice=logits_slice)
    return lm.apply(params["lm"], lm_cfg, embedding_cat, attention_mask=full_mask,
                    remat=remat, logits_slice=logits_slice)


def caption_loss(
    params: dict,
    cfg: CaptionerConfig,
    lm_cfg,
    tokens: jnp.ndarray,  # [B, T] int64, padded with -1
    prefix: jnp.ndarray,
    remat: bool = False,
    lm_apply=None,
) -> Tuple[jnp.ndarray, dict]:
    """The training_step CE loss (reference model.py:203-209).

    Returns (scalar loss, metrics dict).
    """
    mask = tokens >= 0
    tokens = jnp.where(mask, tokens, 0)

    # predict token t from position (prefix_length - 1 + t): the head runs
    # on exactly those positions (the slice the reference takes AFTER the
    # full head, model.py:208 — here it moves before the head, which skips
    # the dead prefix fifth of the vocab matmul and its logits memory)
    p = cfg.mapper.prefix_length
    total = p + tokens.shape[1]
    logits = forward(params, cfg, lm_cfg, tokens, prefix, mask, remat=remat,
                     logits_slice=(p - 1, total - 1), lm_apply=lm_apply)

    vocab = logits.shape[-1]
    logits_f = logits.astype(jnp.float32).reshape(-1, vocab)
    labels = tokens.reshape(-1)

    # CE as logsumexp - picked logit: identical value to the log_softmax
    # gather, but never materializes a [B*T, V] f32 normalized matrix
    lse = jax.scipy.special.logsumexp(logits_f, axis=-1)
    picked = jnp.take_along_axis(logits_f, labels[:, None], axis=-1)[:, 0]
    nll = lse - picked
    # ignore_index=0: padding was zeroed above, and true id-0 tokens are
    # also dropped (reference quirk, model.py:209)
    valid = labels != 0
    denom = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / denom

    metrics = {"loss": loss, "valid_tokens": denom}
    return loss, metrics


def trainable_filter(params: dict, cfg: CaptionerConfig):
    """Boolean pytree: which leaves train.

    prefix_only=True reproduces CLIPCaptionPrefixOnly (reference
    model.py:219-226): only the mapper sees the optimizer. The frozen
    visual encoder (reference model.py:45-48) is excluded when present.
    """

    def mark(subtree, flag: bool):
        return jax.tree_util.tree_map(lambda _: flag, subtree)

    out = {"mapper": mark(params["mapper"], True)}
    if "lm" in params:
        out["lm"] = mark(params["lm"], not cfg.prefix_only)
    if "visual" in params:
        out["visual"] = mark(params["visual"], cfg.train_visual_encoder)
    return out
