"""CLIP-guided lookahead decoding.

Rebuild of the reference's generate_clip_guided + recursive_branching_topk
(evaluate_model.py:183-310): expand branching_factor^look_ahead greedy
continuations, decode each candidate, embed with the CLIP text tower,
pick the candidate whose embedding is most cosine-similar to the CLIP
image embedding, commit the whole lookahead (or one token with
step_by_step), repeat until a special token or max_decode_length.

The reference expands the tree with one LM forward per node
(branching^depth sequential calls); here the WHOLE lookahead tree (all
`depth` levels) is ONE jitted fixed-shape call: embeddings live in a
[rows, maxT, D] padded buffer, each unrolled level runs the forward +
repetition penalty (history maintained on device) + top-k +
child-embedding scatter, and the host fetches the per-level [k^d, k]
token-id stacks in ONE transfer for bookkeeping (special-token stops,
final text decode). Shapes are static (rows = branching^d per level,
padded maxT), so the decode compiles one graph per depth and then costs
one device dispatch + one fetch per COMMITTED CHUNK — the TPU relay
charges ~30 ms per synced call, so per-level (let alone per-node) sync
is unusable on the tunnel. Early-stopped leaves stay in the batch
(their descendants are ignored on the host — junk columns they write
sit beyond the candidate's n_valid, are never unmasked, and are
overwritten column-exactly by later levels / the next chunk); candidate
texts still encode in a single CLIP text batch.
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

    # the whole depth-level tree in ONE compiled call: per-level forward,
    # device-resident repetition-penalty history, top-k, child scatter.
    # Levels unroll (rows = k^d is static per level); only the per-level
    # topk id stacks and the FINAL level's embedding buffer come back —
    # an early-stopped candidate's row maps to its first descendant in
    # that buffer (identical columns up to the candidate's length)
    def make_expand_fn(depth: int):
        @jax.jit
        def expand_all(params, embeds_pad, n_valid, hist, hist_valid):
            """embeds_pad [1, maxT, D]; n_valid (traced scalar): columns
            filled so far; hist/hist_valid [1, max_decode_length]: committed
            token history for the repetition penalty. Returns
            (tuple of topk ids [k^d, k] per level, final children
            [k^depth, maxT, D])."""
            outs = []
            for d in range(depth):
                rows = embeds_pad.shape[0]
                nv = n_valid + d
                mask = jnp.arange(max_t)[None, :] < nv
                logits = lm.apply(
                    params, lm_cfg, embeds_pad, attention_mask=mask
                ).astype(jnp.float32)
                last = logits[jnp.arange(rows), nv - 1]  # [R, V]
                if repetition_penalty_value != 1.0:
                    last = repetition_penalty(
                        last, hist, repetition_penalty_value,
                        tokens_valid=hist_valid,
                    )
                _, topk = jax.lax.top_k(last, k)  # [R, k]
                outs.append(topk)
                emb_new = lm.embed_tokens(params, topk).astype(dtype)
                children = jnp.repeat(embeds_pad, k, axis=0)  # [R*k, maxT, D]
                embeds_pad = jax.lax.dynamic_update_slice(
                    children, emb_new.reshape(rows * k, 1, d_model),
                    (0, nv.astype(jnp.int32), 0),
                )
                if d + 1 < depth:
                    # per-row history gains the chosen token (dead rows
                    # accumulate junk — their topk are ignored on the host)
                    col = (nv - p_len).astype(jnp.int32)
                    hist = jax.lax.dynamic_update_slice(
                        jnp.repeat(hist, k, axis=0),
                        topk.reshape(rows * k, 1), (0, col))
                    hist_valid = jax.lax.dynamic_update_slice(
                        jnp.repeat(hist_valid, k, axis=0),
                        jnp.ones((rows * k, 1), bool), (0, col))
            return tuple(outs), embeds_pad

        return expand_all

    # the compiled closure bakes in branching_factor / depth / repetition
    # penalty / lm+cfg, so every one of those keys the cache; living on the
    # bundle object ties the cache lifetime to the bundle (no id() reuse
    # after GC)
    cache_store = bundle.__dict__.setdefault("_clip_guided_level_cache", {})

    def expand_fn_for(depth: int):
        cache_key = (max_t, k, depth, repetition_penalty_value, id(lm))
        fn = cache_store.get(cache_key)
        if fn is None:
            fn = make_expand_fn(depth)
            if len(cache_store) > 16:
                cache_store.clear()
            cache_store[cache_key] = fn
        return fn

    def pad_rows(arr_np):  # [R, T, D] -> [R, maxT, D]
        out = np.zeros((arr_np.shape[0], max_t, d_model), dtype)
        out[:, : arr_np.shape[1]] = arr_np
        return out

    committed_tokens: List[int] = []
    committed_pad = jnp.asarray(pad_rows(base))  # [1, maxT, D]

    def expand(leaf_tokens, leaf_pad, depth):
        """Greedy top-k tree expansion: ONE device dispatch + ONE fetch.

        Each candidate records (tokens, the FINAL level's children array,
        mapped row, stopped): an early-stopped leaf at level d maps to its
        first descendant row (row * k^(depth-1-d)) in that array, whose
        buffer columns are identical up to the candidate's own length (the
        descendants' extra writes sit beyond n_valid, masked and later
        overwritten column-exactly)."""
        n_valid = p_len + len(leaf_tokens)
        hist = np.zeros((1, max_decode_length), np.int32)
        valid = np.zeros_like(hist, bool)
        if leaf_tokens:
            hist[0, : len(leaf_tokens)] = leaf_tokens
            valid[0, : len(leaf_tokens)] = True
        topk_levels, final_children = expand_fn_for(depth)(
            params, leaf_pad, jnp.asarray(n_valid, jnp.int32),
            jnp.asarray(hist), jnp.asarray(valid)
        )
        topk_levels = [np.asarray(x) for x in
                       jax.device_get(topk_levels)]  # the ONE fetch

        candidates = []  # (token list, children array, row, stopped)
        tokens_list = [leaf_tokens]
        live = [True]
        for d in range(depth):
            topk = topk_levels[d]
            desc = k ** (depth - 1 - d)  # level-d row -> final-level row
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
                        candidates.append(
                            (seq, final_children, row * desc, nt in special))
                        new_tokens.append(seq)
                        new_live.append(False)
                    else:
                        new_tokens.append(seq)
                        new_live.append(True)
                        keep_rows.append(row)
            tokens_list, live = new_tokens, new_live
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
