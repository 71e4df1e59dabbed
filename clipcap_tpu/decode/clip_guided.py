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

BATCHING ACROSS IMAGES (generate_clip_guided_batch): the per-chunk relay
sync + the weight-stream cost of the tree forwards are the whole cost of
this sampler (measured r4: 2.08 s/image at branching=3, look_ahead=2,
len=40, XL bf16 — ~20 chunks x (~60 ms sync + ~40 ms device)). Both
amortize over images: every LIVE image commits exactly `depth` tokens
per chunk (an image whose chosen candidate early-stops FINISHES), so all
live images share one scalar n_valid and the N trees stack into one
[N*k^d, maxT, D] buffer — the device math is row-generic, the host
bookkeeping runs per image over its block of rows, candidate texts of
all images encode in one CLIP batch, and finished images keep riding as
junk rows (static shapes; their outputs are ignored). The selected
children never leave the device: the next chunk's committed buffer is a
device gather of host-chosen rows ([N, maxT, D] would be tens of MB per
chunk through the relay otherwise).
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
    return generate_clip_guided_batch(
        bundle, clip_scoring,
        jnp.asarray(clip_image_embedding).reshape(1, -1),
        prefix_embeds,
        max_decode_length=max_decode_length,
        repetition_penalty_value=repetition_penalty_value,
        look_ahead=look_ahead,
        branching_factor=branching_factor,
        step_by_step=step_by_step,
    )[0]


def generate_clip_guided_batch(
    bundle,  # models.bundle.CaptionerBundle
    clip_scoring,  # eval.clip_scoring.ClipScoring
    clip_image_embeddings: jnp.ndarray,  # [N, D]
    prefix_embeds: jnp.ndarray,  # [N, P, D] mapper output
    max_decode_length: int = 75,
    repetition_penalty_value: float = 1.2,
    look_ahead: int = 5,
    branching_factor: int = 3,
    step_by_step: bool = False,
) -> List[str]:
    """N independent clip-guided decodes sharing every dispatch.

    Per-image results match N single calls exactly on CPU f32 (pinned in
    tests/test_clip_guided.py); on TPU bf16 the batched forward may
    resolve top-k near-ties differently than the single-image shapes
    (kernel tiling changes the reduction rounding — same caveat as
    decode/speculative.py's chunked verification).
    """
    assert max_decode_length <= 77, "maximum context length for CLIP models is 77"
    tokenizer = bundle.tokenizer
    special = set(tokenizer.all_special_ids)
    # full-precision apply(): the lookahead runs whole-sequence forwards
    # (reference semantics — no KV cache in the tree), which the int8
    # decode modules don't implement
    lm, params, lm_cfg = bundle.lm, bundle.params["lm"], bundle.lm_cfg
    k = branching_factor
    n_img = prefix_embeds.shape[0]

    imgs = jnp.asarray(clip_image_embeddings).reshape(n_img, -1)
    imgs = imgs / jnp.linalg.norm(imgs, axis=-1, keepdims=True)

    # prepend BOS (reference evaluate_model.py:253-257)
    bos = jnp.full((n_img, 1), tokenizer.bos_token_id, jnp.int32)
    base = jax.device_get(
        jnp.concatenate([prefix_embeds, bundle.embed_text(bos)], axis=1)
    )
    p_len = base.shape[1]
    d_model = base.shape[2]
    max_t = p_len + max_decode_length
    dtype = base.dtype

    # the whole depth-level tree in ONE compiled call: per-level forward,
    # device-resident repetition-penalty history, top-k, child scatter.
    # Levels unroll (rows = N*k^d is static per level); only the per-level
    # topk id stacks come back — the FINAL level's embedding buffer stays
    # on device, and an early-stopped candidate's row maps to its first
    # descendant row (identical columns up to the candidate's length)
    def make_expand_fn(depth: int):
        @jax.jit
        def expand_all(params, embeds_pad, n_valid, hist, hist_valid):
            """embeds_pad [R, maxT, D]; n_valid (traced scalar): columns
            filled so far (uniform across rows); hist/hist_valid
            [R, max_decode_length]: committed token history for the
            repetition penalty. Returns (tuple of topk ids [R*k^d, k] per
            level, final children [R*k^depth, maxT, D], rows image-blocked
            throughout)."""
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
    # penalty / lm+cfg, so every one of those keys the cache (jit handles
    # the row-count = N retrace itself); living on the bundle object ties
    # the cache lifetime to the bundle (no id() reuse after GC)
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

    # per-chunk device-side helpers (cached on the bundle like the levels):
    # select each image's chosen child row WITHOUT fetching the children
    # buffer, and (step_by_step) re-zero the uncommitted tail
    helper_key = "_clip_guided_helper_cache"
    helpers = bundle.__dict__.setdefault(helper_key, {})
    if "gather" not in helpers:
        helpers["gather"] = jax.jit(lambda c, idx: c[idx])
        helpers["gather_trim"] = jax.jit(
            lambda c, idx, keep: jnp.where(
                jnp.arange(c.shape[1])[None, :, None] < keep, c[idx], 0
            ).astype(c.dtype)
        )
    gather, gather_trim = helpers["gather"], helpers["gather_trim"]

    def pad_rows(arr_np):  # [N, T, D] -> [N, maxT, D]
        out = np.zeros((arr_np.shape[0], max_t, d_model), dtype)
        out[:, : arr_np.shape[1]] = arr_np
        return out

    committed: List[List[int]] = [[] for _ in range(n_img)]
    done = [False] * n_img
    committed_len = 0  # uniform across live images (see module docstring)
    committed_pad = jnp.asarray(pad_rows(base))  # [N, maxT, D]

    def expand(committed_pad, depth):
        """Greedy top-k tree expansion for every image: ONE device
        dispatch + ONE fetch.

        Per image, each candidate records (tokens, global final-level row,
        stopped): an early-stopped leaf at level d maps to its first
        descendant row (i*k^depth + row*k^(depth-1-d)) in the device-
        resident final children array, whose buffer columns are identical
        up to the candidate's own length (the descendants' extra writes
        sit beyond n_valid, masked and later overwritten column-exactly).
        Finished images contribute an empty candidate list."""
        n_valid = p_len + committed_len
        hist = np.zeros((n_img, max_decode_length), np.int32)
        valid = np.zeros_like(hist, bool)
        for i, toks in enumerate(committed):
            if toks:
                hist[i, : len(toks)] = toks
                valid[i, : len(toks)] = True
        topk_levels, final_children = expand_fn_for(depth)(
            params, committed_pad, jnp.asarray(n_valid, jnp.int32),
            jnp.asarray(hist), jnp.asarray(valid)
        )
        topk_levels = [np.asarray(x) for x in
                       jax.device_get(topk_levels)]  # the ONE fetch

        per_image = []  # list of [(token list, global row, stopped)]
        kd = k ** depth
        for i in range(n_img):
            if done[i]:
                per_image.append([])
                continue
            candidates = []
            tokens_list = [committed[i]]
            live = [True]
            for d in range(depth):
                rd = k ** d  # rows per image at this level
                topk = topk_levels[d][i * rd : (i + 1) * rd]
                desc = k ** (depth - 1 - d)  # level-d child -> final row
                new_tokens, new_live, any_kept = [], [], False
                for r, toks in enumerate(tokens_list):
                    for j in range(k):
                        row = r * k + j
                        if not live[r]:
                            # child of an early-stopped leaf: dead padding
                            # row, kept on device for static shapes
                            new_tokens.append(toks)
                            new_live.append(False)
                            continue
                        nt = int(topk[r, j])
                        seq = toks + [nt]
                        if nt in special or d == depth - 1:
                            candidates.append(
                                (seq, i * kd + row * desc, nt in special))
                            new_tokens.append(seq)
                            new_live.append(False)
                        else:
                            new_tokens.append(seq)
                            new_live.append(True)
                            any_kept = True
                tokens_list, live = new_tokens, new_live
                if not any_kept:
                    break
            per_image.append(candidates)
        return per_image, final_children

    while True:
        depth = min(look_ahead, max_decode_length - committed_len)
        per_image, final_children = expand(committed_pad, max(depth, 1))

        # one CLIP text batch over every live image's candidates
        texts, slices = [], [None] * n_img
        for i, cands in enumerate(per_image):
            if not cands:
                continue
            start = len(texts)
            texts.extend(
                tokenizer.decode_tokens([t for t in c[0] if t not in special])
                for c in cands
            )
            slices[i] = (start, len(texts))
        text_feats = clip_scoring.embed_text(texts)
        # eps guard is a DELIBERATE divergence from the reference, which
        # normalizes with a bare torch.norm divide (evaluate_model.py:284-285)
        # and would NaN-poison its own argmax on an all-special candidate
        # (zero text feature -> 0/0); clamping the norm keeps the argmax
        # well-defined without changing any non-degenerate score
        text_feats = text_feats / jnp.maximum(
            jnp.linalg.norm(text_feats, axis=-1, keepdims=True), 1e-8
        )
        scores = np.asarray(
            jax.device_get(text_feats @ imgs.T), np.float32)  # [C, N]

        rows_idx = np.zeros(n_img, np.int64)
        for i, cands in enumerate(per_image):
            if not cands:
                continue
            lo, hi = slices[i]
            best = int(np.argmax(scores[lo:hi, i]))
            best_tokens, best_row, stopped = cands[best]
            rows_idx[i] = best_row
            if step_by_step:
                committed[i] = best_tokens[: committed_len + 1]
                last = committed[i][-1]
                if committed_len + 1 >= max_decode_length or last in special:
                    done[i] = True
            else:
                committed[i] = best_tokens
                if stopped or len(best_tokens) >= max_decode_length:
                    done[i] = True

        if all(done):
            break
        if step_by_step:
            committed_len += 1
            # re-extend from the committed prefix only: zero the tail
            # (done/finished rows gather junk — never read again)
            committed_pad = gather_trim(
                final_children, jnp.asarray(rows_idx), p_len + committed_len)
        else:
            committed_len += depth
            committed_pad = gather(final_children, jnp.asarray(rows_idx))

    return [
        tokenizer.decode_tokens([t for t in toks if t not in special])
        for toks in committed
    ]
