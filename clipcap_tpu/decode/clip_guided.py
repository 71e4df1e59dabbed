"""CLIP-guided lookahead decoding.

Rebuild of the reference's generate_clip_guided + recursive_branching_topk
(evaluate_model.py:183-310): expand branching_factor^look_ahead greedy
continuations, decode each candidate, embed with the CLIP text tower,
pick the candidate whose embedding is most cosine-similar to the CLIP
image embedding, commit the whole lookahead (or one token with
step_by_step), repeat until a special token or max_decode_length.

The reference expands the tree with one LM forward per node
(branching^depth sequential calls); here each tree *level* is one batched
KV-free forward over all live leaves, and all candidate texts encode in a
single CLIP text batch.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import repetition_penalty


def generate_clip_guided(
    bundle,  # models.bundle.CaptionerBundle
    clip_scoring,  # eval.clip_scoring.ClipScoring
    clip_image_embedding: jnp.ndarray,  # [1, D] or [D]
    prefix_embeds: jnp.ndarray,  # [1, P, D] mapper output
    max_decode_length: int = 75,
    repetition_penalty_value: float = 1.2,
    look_ahead: int = 5,
    branching_factor: int = 3,
    step_by_step: bool = False,
) -> str:
    assert max_decode_length <= 77, "maximum context length for CLIP models is 77"
    tokenizer = bundle.tokenizer
    special = set(tokenizer.all_special_ids)
    lm, params, lm_cfg = bundle.lm_decode, bundle.lm_decode_params, bundle.lm_cfg

    img = jnp.asarray(clip_image_embedding).reshape(-1)
    if img.ndim == 1:
        img = img / jnp.linalg.norm(img)

    # prepend BOS (reference evaluate_model.py:253-257)
    bos = jnp.full((1, 1), tokenizer.bos_token_id, jnp.int32)
    embeds = jnp.concatenate([prefix_embeds, bundle.embed_text(bos)], axis=1)

    committed_tokens: List[int] = []
    committed_embeds = embeds

    def expand(leaf_tokens, leaf_embeds, depth):
        """One batched greedy top-k expansion per level. Returns candidate
        (tokens list, embeds) pairs incl. early-stopped leaves."""
        candidates = []
        tokens_list = [leaf_tokens]
        embeds_batch = leaf_embeds  # [L, T, D]
        for d in range(depth):
            logits = lm.apply(params, lm_cfg, embeds_batch)[:, -1].astype(jnp.float32)
            if repetition_penalty_value != 1.0:
                max_hist = max(max((len(t) for t in tokens_list), default=0), 1)
                hist = np.zeros((len(tokens_list), max_hist), np.int32)
                valid = np.zeros_like(hist, bool)
                for i, t in enumerate(tokens_list):
                    if t:
                        hist[i, : len(t)] = t
                        valid[i, : len(t)] = True
                logits = repetition_penalty(
                    logits, jnp.asarray(hist), repetition_penalty_value,
                    tokens_valid=jnp.asarray(valid),
                )
            _, topk = jax.lax.top_k(logits, branching_factor)
            topk = np.asarray(jax.device_get(topk))  # [L, k]

            new_tokens_list = []
            new_embed_rows = []
            for i, toks in enumerate(tokens_list):
                for k in range(branching_factor):
                    nt = int(topk[i, k])
                    seq = toks + [nt]
                    emb = jnp.concatenate(
                        [embeds_batch[i : i + 1],
                         bundle.embed_text(jnp.asarray([[nt]], jnp.int32))],
                        axis=1,
                    )
                    if nt in special or d == depth - 1:
                        candidates.append((seq, emb, nt in special))
                    else:
                        new_tokens_list.append(seq)
                        new_embed_rows.append(emb)
            if not new_tokens_list:
                break
            tokens_list = new_tokens_list
            embeds_batch = jnp.concatenate(new_embed_rows, axis=0)
        return candidates

    while True:
        depth = min(look_ahead, max_decode_length - len(committed_tokens))
        candidates = expand(list(committed_tokens), committed_embeds, max(depth, 1))

        texts = [tokenizer.decode_tokens([t for t in c[0] if t not in special])
                 for c in candidates]
        text_feats = clip_scoring.embed_text(texts)
        text_feats = text_feats / jnp.linalg.norm(text_feats, axis=-1, keepdims=True)
        sims = text_feats @ img
        best = int(np.asarray(jax.device_get(jnp.argmax(sims))))
        best_tokens, best_embeds, stopped = candidates[best]

        if step_by_step:
            committed_tokens = best_tokens[: len(committed_tokens) + 1]
            committed_embeds = best_embeds[:, : committed_embeds.shape[1] + 1]
            last = committed_tokens[-1]
            if len(committed_tokens) >= max_decode_length or last in special:
                break
        else:
            committed_tokens, committed_embeds = best_tokens, best_embeds
            if stopped or len(committed_tokens) >= max_decode_length:
                break

    out = [t for t in committed_tokens if t not in special]
    return tokenizer.decode_tokens(out)
