"""CLIP-guided lookahead decoding — KV-cached tree expansion.

Rebuild of the reference's generate_clip_guided + recursive_branching_topk
(evaluate_model.py:183-310): expand branching_factor^look_ahead greedy
continuations, decode each candidate, embed with the CLIP text tower,
pick the candidate whose embedding is most cosine-similar to the CLIP
image embedding, commit the whole lookahead (or one token with
step_by_step), repeat until a special token or max_decode_length.

The reference expands the tree with one WHOLE-SEQUENCE LM forward per
node (branching^depth sequential full recomputes, evaluate_model.py:213)
— and so did this module through r4. Now the tree is KV-cached: the
committed prefix lives in a batch-N decode cache carried across chunks,
and each tree level is one `decode_step` over the live rows (N, N*k,
... N*k^(depth-1)) — at branch points the cache rows replicate k-fold on
the batch axis, so a chunk costs `depth` decode steps instead of
hundreds of TFLOP of full-sequence recompute (GPT2-XL at N=16, b=3,
la=2 was ~16 TFLOP/chunk of forwards; the cached tree streams weights
depth times over small-row steps). The selection after the final level
needs no forward: the chosen candidate's LAST token is carried to the
next chunk as `tok_last` and processed there as that chunk's level-0
decode step, so the cache handed across chunks always covers positions
[0, nv-1) with tok_last the token at position nv-1.

The whole depth-level tree is still ONE jitted fixed-shape dispatch per
committed chunk, and the per-level [rows, k] token-id stacks come back
in ONE fetch (the TPU relay charges ~30 ms per synced call; per-level
sync is unusable on the tunnel). Early-stopped leaves stay in the batch
(their descendant rows are ignored on the host — junk cache entries
they write sit at positions the next chunk either overwrites
column-exactly or masks behind the causal bias). Candidate texts still
encode in a single CLIP text batch.

Chunk-to-chunk cache carry:
- non-step_by_step: the chosen candidate's level-(depth-1) PARENT row
  already holds exactly positions [0, nv+depth-1) of the committed
  path (every level-d token's K/V was written by the level-(d+1)
  decode step before branching diverged below it), so the next chunk's
  cache is a device gather of parent rows — the cache never transits
  the relay.
- step_by_step commits one token: any row of the image holds the
  committed positions [0, nv) (branching only happens after the
  level-0 write), so the same parent-row gather applies with the cache
  index RESET to nv; the junk the tree wrote at [nv, nv+depth-1) is
  overwritten column-exactly by the next chunk's level writes or
  masked by the causal bias before ever being attended.

Runs on `bundle.lm_decode` / `bundle.lm_decode_params`, so
`bundle.enable_int8_decode()` switches the tree to int8 weight
streaming + int8 KV automatically (self-attention cache LMs:
gpt2/gptj, bf16/f32 or int8 — cross-attention caches are rejected).

BATCHING ACROSS IMAGES (generate_clip_guided_batch): the per-chunk
relay sync (~2 round-trips: tree fetch + CLIP score fetch) and the
per-step weight stream amortize over images: every LIVE image commits
exactly `depth` tokens per chunk (an image whose chosen candidate
early-stops FINISHES), so all live images share one scalar n_valid and
the N trees stack into one row-blocked batch — the device math is
row-generic, the host bookkeeping runs per image over its block of
rows, candidate texts of all images encode in one CLIP batch, and
finished images keep riding as junk rows (static shapes; their outputs
are ignored).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import repetition_penalty
from .beam import _map_beam_axis


def _replicate_rows(cache, k: int):
    """Replicate every self-attention cache slab k-fold on the batch
    axis (axis 1 of the stacked [L, B, ...] arrays) — children of row r
    land contiguously at rows [r*k, (r+1)*k), matching the host's
    image-blocked candidate indexing."""
    if hasattr(cache, "cross_k") or hasattr(cache, "enc_hidden"):
        raise NotImplementedError(
            "clip-guided decode supports self-attention cache LMs "
            "(gpt2/gptj); cross-attention caches are per-image and do "
            "not follow the tree's row replication"
        )
    return _map_beam_axis(cache, lambda x: jnp.repeat(x, k, axis=1))


def _gather_rows(cache, idx, new_index):
    """Select cache rows on the batch axis and reset the write index
    (step_by_step rewinds it below junk tree positions)."""
    out = _map_beam_axis(cache, lambda x: jnp.take(x, idx, axis=1))
    return out._replace(index=new_index)


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

    Width bound: keep N * branching_factor**look_ahead <= ~512 — past
    ~512 rows XLA's layout assignment flips decode_step's activation
    chain batch-minor and the step pays ~1.7x (measured r5, CLAUDE.md
    "Beam N=128 regression"). N=56 at the default k=3, la=2.
    """
    assert max_decode_length <= 77, "maximum context length for CLIP models is 77"
    tokenizer = bundle.tokenizer
    special = set(tokenizer.all_special_ids)
    lm, params, lm_cfg = bundle.lm_decode, bundle.lm_decode_params, bundle.lm_cfg
    k = branching_factor
    n_img = prefix_embeds.shape[0]

    imgs = jnp.asarray(clip_image_embeddings).reshape(n_img, -1)
    imgs = imgs / jnp.linalg.norm(imgs, axis=-1, keepdims=True)

    bos_id = int(tokenizer.bos_token_id)
    # BOS is prepended after the prefix (reference evaluate_model.py:253-257)
    # but is NOT prefetched into the cache: it is the first chunk's
    # tok_last, processed by that chunk's level-0 decode step
    p_len = prefix_embeds.shape[1] + 1
    max_t = p_len + max_decode_length
    act_dtype = prefix_embeds.dtype

    # the whole depth-level tree in ONE compiled call per depth: level-0
    # decode step on tok_last, device-resident repetition-penalty history,
    # top-k, k-fold cache replication at each branch. Only the per-level
    # topk id stacks come back — the cache stays on device.
    def make_expand_fn(depth: int):
        @jax.jit
        def expand_all(params, cache, tok_last, hist, hist_valid):
            """cache: committed positions [0, nv-1); tok_last [R0] int32
            token ids at position nv-1; hist/hist_valid
            [R0, max_decode_length]: committed token history for the
            repetition penalty. Returns (tuple of topk ids [R0*k^d, k]
            per level, final cache at R0*k^(depth-1) rows covering
            [0, nv+depth-1), rows image-blocked throughout)."""
            tok = tok_last
            c0 = cache.index + 1 - p_len  # committed count (scatter col base)
            outs = []
            for d in range(depth):
                rows = tok.shape[0]
                emb = lm.embed_tokens(params, tok[:, None]).astype(act_dtype)
                logits, cache = lm.decode_step(params, lm_cfg, emb, cache)
                logits = logits.astype(jnp.float32)  # [R, V]
                if repetition_penalty_value != 1.0:
                    logits = repetition_penalty(
                        logits, hist, repetition_penalty_value,
                        tokens_valid=hist_valid,
                    )
                _, topk = jax.lax.top_k(logits, k)  # [R, k]
                outs.append(topk)
                if d + 1 < depth:
                    cache = _replicate_rows(cache, k)
                    tok = topk.reshape(rows * k)
                    # per-row history gains the chosen token (dead rows
                    # accumulate junk — their topk are ignored on the host)
                    col = (c0 + d).astype(jnp.int32)
                    hist = jax.lax.dynamic_update_slice(
                        jnp.repeat(hist, k, axis=0), tok[:, None], (0, col))
                    hist_valid = jax.lax.dynamic_update_slice(
                        jnp.repeat(hist_valid, k, axis=0),
                        jnp.ones((rows * k, 1), bool), (0, col))
            return tuple(outs), cache

        return expand_all

    # the compiled closure bakes in branching_factor / depth / repetition
    # penalty / lm+cfg / p_len, so every one of those keys the cache (jit
    # handles the row-count = N retrace itself); living on the bundle
    # object ties the cache lifetime to the bundle (no id() reuse after GC)
    cache_store = bundle.__dict__.setdefault("_clip_guided_level_cache", {})

    def expand_fn_for(depth: int):
        cache_key = (k, depth, repetition_penalty_value, id(lm), p_len,
                     max_decode_length, str(act_dtype))
        fn = cache_store.get(cache_key)
        if fn is None:
            fn = make_expand_fn(depth)
            if len(cache_store) > 16:
                cache_store.clear()
            cache_store[cache_key] = fn
        return fn

    # per-chunk device-side helpers (cached on the bundle like the levels):
    # prefill the shared prefix once, and select each image's chosen
    # parent row + reset the index WITHOUT fetching the cache
    helpers = bundle.__dict__.setdefault("_clip_guided_helper_cache", {})
    hk = (id(lm), max_t, str(act_dtype))
    if helpers.get("key") != hk:
        helpers.clear()
        helpers["key"] = hk
        helpers["prefill"] = jax.jit(
            lambda p, px: lm.prefill(
                p, lm_cfg, px,
                lm.init_cache(lm_cfg, batch=px.shape[0], max_len=max_t,
                              dtype=px.dtype),
            )[1]
        )
        helpers["gather"] = jax.jit(_gather_rows)
    prefill_cache, gather_cache = helpers["prefill"], helpers["gather"]

    committed: List[List[int]] = [[] for _ in range(n_img)]
    done = [False] * n_img
    committed_len = 0  # uniform across live images (see module docstring)
    # cache covers [0, p_len-1) = the mapper prefix; tok_last = BOS
    cache = prefill_cache(params, jnp.asarray(prefix_embeds, act_dtype))
    tok_last = np.full(n_img, bos_id, np.int32)

    def expand(cache, tok_last, depth):
        """Greedy top-k tree expansion for every image: ONE device
        dispatch + ONE fetch.

        Per image, each candidate records (tokens, global final-level row,
        stopped): an early-stopped leaf at level d maps to its first
        descendant row (i*k^depth + row*k^(depth-1-d)) — the PARENT
        (row // k) of that final row in the device-resident cache holds
        the candidate's committed positions (identical up to the
        candidate's own length; descendants' extra writes sit beyond
        n_valid, masked and later overwritten column-exactly).
        Finished images contribute an empty candidate list."""
        hist = np.zeros((n_img, max_decode_length), np.int32)
        valid = np.zeros_like(hist, bool)
        for i, toks in enumerate(committed):
            if toks:
                hist[i, : len(toks)] = toks
                valid[i, : len(toks)] = True
        topk_levels, cache_out = expand_fn_for(depth)(
            params, cache, jnp.asarray(tok_last),
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
        return per_image, cache_out

    while True:
        depth = max(min(look_ahead, max_decode_length - committed_len), 1)
        per_image, cache_out = expand(cache, tok_last, depth)

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

        rows_parent = (np.arange(n_img, dtype=np.int64)
                       * k ** max(depth - 1, 0))  # default for done images
        for i, cands in enumerate(per_image):
            if not cands:
                continue
            lo, hi = slices[i]
            best = int(np.argmax(scores[lo:hi, i]))
            best_tokens, best_row, stopped = cands[best]
            # the candidate's level-(depth-1) parent row holds its
            # committed cache positions (see module docstring)
            rows_parent[i] = best_row // k
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
        committed_len += 1 if step_by_step else depth
        # next chunk's cache covers [0, p_len + committed_len - 1);
        # step_by_step rewinds the index below the tree's junk writes
        cache = gather_cache(
            cache_out, jnp.asarray(rows_parent),
            jnp.asarray(p_len + committed_len - 1, jnp.int32))
        tok_last = np.asarray(
            [committed[i][-1] if committed[i] else bos_id
             for i in range(n_img)], np.int32)

    return [
        tokenizer.decode_tokens([t for t in toks if t not in special])
        for toks in committed
    ]
