"""CLIP-guided lookahead decoding.

Rebuild of the reference's generate_clip_guided + recursive_branching_topk
(evaluate_model.py:183-310): expand branching_factor^look_ahead greedy
continuations, decode each candidate, embed with the CLIP text tower,
pick the candidate whose embedding is most cosine-similar to the CLIP
image embedding, commit the whole lookahead (or one token with
step_by_step), repeat until a special token or max_decode_length.

The reference expands the tree with one LM forward per node
(branching^depth sequential calls); here each tree *level* is ONE jitted
fixed-shape call: embeddings live in a [rows, maxT, D] padded buffer, the
level forward + repetition penalty + top-k + child-embedding scatter all
happen on-device, and the host fetches only the [rows, k] token ids it
needs for bookkeeping (special-token stops, final text decode). Shapes
are static per tree level (rows = branching^d, padded maxT), so the
whole decode compiles look_ahead graphs once and then costs one device
call + one small fetch per level — running this loop eagerly pays a
~30 ms relay round-trip per op and is unusable on the TPU tunnel.
Early-stopped leaves stay in the batch (their children are ignored on
the host) to keep the level shapes static; candidate texts still encode
in a single CLIP text batch.
"""

from __future__ import annotations

from typing import List

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
    # full-precision apply(): the lookahead runs whole-sequence forwards
    # (reference semantics — no KV cache in the tree), which the int8
    # decode modules don't implement
    lm, params, lm_cfg = bundle.lm, bundle.params["lm"], bundle.lm_cfg
    k = branching_factor

    img = jnp.asarray(clip_image_embedding).reshape(-1)
    img = img / jnp.linalg.norm(img)

    # prepend BOS (reference evaluate_model.py:253-257)
    bos = jnp.full((1, 1), tokenizer.bos_token_id, jnp.int32)
    base = jax.device_get(
        jnp.concatenate([prefix_embeds, bundle.embed_text(bos)], axis=1)
    )
    p_len = base.shape[1]
    d_model = base.shape[2]
    max_t = p_len + max_decode_length
    dtype = base.dtype

    # one compiled level step per rows-count (k^0 .. k^(look_ahead-1));
    # embeds are padded to max_t so T never retraces
    def make_level_fn():
        @jax.jit
        def level(params, embeds_pad, n_valid, hist, hist_valid):
            """embeds_pad [R, maxT, D]; n_valid (traced scalar): columns
            filled so far. Returns (topk ids [R, k], children [R*k, maxT, D])."""
            rows = embeds_pad.shape[0]
            mask = jnp.arange(max_t)[None, :] < n_valid
            logits = lm.apply(
                params, lm_cfg, embeds_pad, attention_mask=mask
            ).astype(jnp.float32)
            last = logits[jnp.arange(rows), n_valid - 1]  # [R, V]
            if repetition_penalty_value != 1.0:
                last = repetition_penalty(
                    last, hist, repetition_penalty_value, tokens_valid=hist_valid
                )
            _, topk = jax.lax.top_k(last, k)  # [R, k]
            emb_new = lm.embed_tokens(params, topk).astype(dtype)  # [R, k, D]
            children = jnp.repeat(embeds_pad, k, axis=0)  # [R*k, maxT, D]
            children = jax.lax.dynamic_update_slice(
                children, emb_new.reshape(rows * k, 1, d_model),
                (0, n_valid.astype(jnp.int32), 0),
            )
            return topk, children

        return level

    # the compiled closure bakes in branching_factor / repetition penalty /
    # lm+cfg, so every one of those keys the cache; living on the bundle
    # object ties the cache lifetime to the bundle (no id() reuse after GC)
    cache_store = bundle.__dict__.setdefault("_clip_guided_level_cache", {})
    cache_key = (max_t, k, repetition_penalty_value, id(lm))
    level_fn = cache_store.get(cache_key)
    if level_fn is None:
        level_fn = make_level_fn()
        if len(cache_store) > 16:
            cache_store.clear()
        cache_store[cache_key] = level_fn

    def pad_rows(arr_np):  # [R, T, D] -> [R, maxT, D]
        out = np.zeros((arr_np.shape[0], max_t, d_model), dtype)
        out[:, : arr_np.shape[1]] = arr_np
        return out

    committed_tokens: List[int] = []
    committed_pad = jnp.asarray(pad_rows(base))  # [1, maxT, D]

    def expand(leaf_tokens, leaf_pad, depth):
        """Greedy top-k tree expansion, one jitted call per level.

        Each candidate records (tokens, ITS OWN level's children array,
        row, stopped): early-stopped leaves come from earlier levels whose
        row indices do not address the final level's array."""
        candidates = []  # (token list, children array, row, stopped)
        tokens_list = [leaf_tokens]
        live = [True]
        embeds_pad = leaf_pad
        for d in range(depth):
            n_valid = p_len + len(leaf_tokens) + d
            # hist padded to the static maximum so the level never retraces
            hist = np.zeros((len(tokens_list), max_decode_length), np.int32)
            valid = np.zeros_like(hist, bool)
            for i, t in enumerate(tokens_list):
                if t:
                    hist[i, : len(t)] = t
                    valid[i, : len(t)] = True
            topk, children = level_fn(
                params, embeds_pad, jnp.asarray(n_valid, jnp.int32),
                jnp.asarray(hist), jnp.asarray(valid)
            )
            topk = np.asarray(jax.device_get(topk))  # the ONE fetch per level

            new_tokens, new_live, keep_rows = [], [], []
            for i, toks in enumerate(tokens_list):
                for j in range(k):
                    row = i * k + j
                    if not live[i]:
                        # child of an early-stopped leaf: dead padding row,
                        # kept on device for static shapes, ignored here
                        new_tokens.append(toks)
                        new_live.append(False)
                        continue
                    nt = int(topk[i, j])
                    seq = toks + [nt]
                    if nt in special or d == depth - 1:
                        candidates.append((seq, children, row, nt in special))
                        new_tokens.append(seq)
                        new_live.append(False)
                    else:
                        new_tokens.append(seq)
                        new_live.append(True)
                        keep_rows.append(row)
            tokens_list, live, embeds_pad = new_tokens, new_live, children
            if not keep_rows:
                break
        return candidates

    while True:
        depth = min(look_ahead, max_decode_length - len(committed_tokens))
        candidates = expand(list(committed_tokens), committed_pad, max(depth, 1))

        texts = [tokenizer.decode_tokens([t for t in c[0] if t not in special])
                 for c in candidates]
        text_feats = clip_scoring.embed_text(texts)
        # eps guard is a DELIBERATE divergence from the reference, which
        # normalizes with a bare torch.norm divide (evaluate_model.py:284-285)
        # and would NaN-poison its own argmax on an all-special candidate
        # (zero text feature -> 0/0); clamping the norm keeps the argmax
        # well-defined without changing any non-degenerate score
        text_feats = text_feats / jnp.maximum(
            jnp.linalg.norm(text_feats, axis=-1, keepdims=True), 1e-8
        )
        best = int(np.asarray(jax.device_get(jnp.argmax(text_feats @ img))))
        best_tokens, best_children, best_row, stopped = candidates[best]
        best_pad = best_children[best_row : best_row + 1]

        if step_by_step:
            committed_tokens = best_tokens[: len(committed_tokens) + 1]
            # re-extend from the committed prefix only: zero the tail
            keep = p_len + len(committed_tokens)
            col = jnp.arange(max_t)[None, :, None] < keep
            committed_pad = jnp.where(col, best_pad, 0).astype(best_pad.dtype)
            last = committed_tokens[-1]
            if len(committed_tokens) >= max_decode_length or last in special:
                break
        else:
            committed_tokens, committed_pad = best_tokens, best_pad
            if stopped or len(committed_tokens) >= max_decode_length:
                break

    out = [t for t in committed_tokens if t not in special]
    return tokenizer.decode_tokens(out)
