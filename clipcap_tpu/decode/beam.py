"""Beam search over prefix embeddings — KV-cached, fixed-shape.

Reproduces the decode semantics of the reference's generate_beam
(inference.py:70-148): log-softmax scores, length-normalized selection
(scores_sum / seq_lengths), stopped-beam freezing (stopped rows contribute
a single 0-logprob continuation at column 0), '.'-token stopping, and
final ordering by normalized score. The reference re-feeds the whole
embedding sequence every step (inference.py:97); here beams live in the
batch dimension of a KV cache and each step reorders the cache along the
batch axis with a gather.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp


#: cross-attention / encoder cache fields, with the axis their batch dim
#: lives on. All beams decode the SAME image/prompt, so these tensors are
#: replicated once across beams at expansion time and then left alone:
#: every beam's row is identical, so reordering them by `source` would be
#: a (costly) no-op — only the self-attention slabs follow beam reorder.
_CROSS_FIELDS = {"cross_k": 1, "cross_v": 1, "cross_bias": 0,
                 "enc_hidden": 0, "enc_bias": 0}


def _map_beam_axis(cache, fn):
    """Apply fn to every SELF-attention cache slab that follows beam
    reordering (axis 1 of the stacked [L, B, ...] arrays): the bf16
    KVCache's k/v and the int8 caches' k/v/ks/vs scale slabs.
    Cross-attention fields are beam-invariant (see _CROSS_FIELDS)."""
    upd = {name: fn(getattr(cache, name))
           for name in ("k", "v", "ks", "vs") if hasattr(cache, name)}
    return cache._replace(**upd)


def _reorder_cache_tail(cache, global_source, p_len: int):
    """Beam-reorder the cache batch axis, moving ONLY the generated tail
    (time positions [p_len:)): prefill rows are identical across an image's
    beams (expanded from one prefilled row by _expand_beams) and the gather
    is block-diagonal, so gathering the prefix positions is bitwise the
    identity. Skipping them cuts the per-step gather to NT/maxT of the
    cache bytes — the whole-cache take at 320 GPT2-XL int8 rows demanded
    17 GB of gather temps on a 16 GB chip (measured r4, CLAUDE.md), forcing
    XLA into a remat-compressed ~90 ms/step schedule.

    The gather runs on a [L, B, tail_elems] flat view of the tail slice:
    s8 slabs whose minor dim is 64 tile to (32,128) with 2x padding when
    XLA materializes gather copies; the flat view's minor dim is a multiple
    of 128, so the copies stay unpadded.
    """
    t_axis = 3 if hasattr(cache, "ks") else 2  # int8: [L,B,H,T,*]; bf16: [L,B,T,H,*]

    def take(x):
        tail = jax.lax.slice_in_dim(x, p_len, x.shape[t_axis], axis=t_axis)
        shp = tail.shape
        flat = tail.reshape(shp[0], shp[1], -1)
        flat = jnp.take(flat, global_source, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(
            x, flat.reshape(shp), p_len, axis=t_axis
        )

    return _map_beam_axis(cache, take)


def _expand_beams(cache, beam_size: int):
    """Replicate a batch-1 prefilled cache to beam_size rows: self-attn
    slabs on their [L, B, ...] batch axis, cross/encoder fields on their
    own batch axis (axis 0 or 1 per _CROSS_FIELDS)."""
    cache = _map_beam_axis(cache, lambda x: jnp.repeat(x, beam_size, axis=1))
    upd = {}
    for name, axis in _CROSS_FIELDS.items():
        val = getattr(cache, name, None)
        if val is not None:
            upd[name] = jnp.repeat(val, beam_size, axis=axis)
    return cache._replace(**upd) if upd else cache


def _topk_iter(x: jnp.ndarray, k: int):
    """Exact per-row top-k by k iterated masked argmaxes: [N, M] -> ([N, k],
    [N, k]) values/indices, values descending, ties broken lowest-index-first
    — the same total order lax.top_k documents.

    lax.top_k lowers to a FULL SORT of the row on TPU (~18 ms at
    [256, 50257] regardless of k — the measured fact that killed sort-based
    sampling filters, see ops/sampling threshold bisection). k reduction
    passes are O(k·M) memory-bound sweeps instead (~0.2 ms each at beam
    vocab widths), which is what makes the batched beam step affordable:
    per-image selection runs over [N, beam·V] every token.

    Selecting past a row's supply of finite values would re-pick a masked
    -inf entry (index 0); beam search never does — every beam row
    contributes at least one finite column (stopped rows score 0 at column
    0, live rows a finite log-softmax argmax), so k = beam picks are
    always backed by >= beam finite entries."""
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        v = jnp.take_along_axis(x, i[:, None], axis=-1)[:, 0]
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        x = jnp.where(
            jnp.arange(x.shape[-1])[None, :] == i[:, None], -jnp.inf, x
        )
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def beam_search_batched(
    lm: Any,
    params: dict,
    lm_cfg: Any,
    prompt_embeds: jnp.ndarray,  # [N, P, D] ([N, P] ids for token-id LMs)
    beam_size: int = 5,
    max_new_tokens: int = 67,
    temperature: float = 1.0,
    stop_token_id: Optional[int] = None,
    cache_constraint=None,  # cache -> cache (multi-chip hook, see engine.generate)
) -> dict:
    """Beam search over N images in ONE executable: returns
    {tokens [N, beam, n], seq_lengths [N, beam], scores [N, beam]}.

    Per-image semantics are exactly beam_search's (the reference's
    generate_beam, inference.py:70-148, is batch-1; batching images x beams
    into [N*beam] rows is the TPU-shaped version — the weight stream
    amortizes over all rows instead of leaving the MXU idle at 5 rows).
    Beams of image i live in the contiguous row block [i*beam, (i+1)*beam);
    selection is per-image (block-diagonal: a beam can only descend from
    its own image's beams), via k iterated argmaxes instead of lax.top_k's
    full-row sort (see _topk_iter).

    scores are the length-normalized log-probs used for the final ordering
    (reference inference.py:139-144); the best beam of image i is
    argmax(scores[i]).

    Works for every protocol LM: self-attention caches (gpt2/gptj, bf16 or
    int8) reorder their KV slabs per step; cross-attention caches
    (t5 — the reference's T0 beam path, lms/T0.py — and the BLIP decoder
    adapter) carry beam-invariant encoder tensors that are replicated once
    (_expand_beams) and never reordered (within-image gathers permute
    identical rows). Token-id adapters (`lm.takes_token_ids`, e.g.
    blip_text.decoder_lm) get ids instead of embeddings, like
    engine.generate; for those, `prompt_embeds` is the [N, P] int prompt.
    """
    token_mode = bool(getattr(lm, "takes_token_ids", False))
    n_img = prompt_embeds.shape[0]
    p_len = prompt_embeds.shape[1]
    n = max_new_tokens
    temp = temperature if temperature > 0 else 1.0

    # token-id adapters pick their own cache dtype (from the image features)
    cache_dtype = None if token_mode else prompt_embeds.dtype
    cache = lm.init_cache(
        lm_cfg, batch=n_img, max_len=p_len + n, dtype=cache_dtype
    )
    if cache_constraint is not None:
        cache = cache_constraint(cache)
    logits, cache = lm.prefill(params, lm_cfg, prompt_embeds, cache)
    logp = jax.nn.log_softmax(
        logits[:, -1].astype(jnp.float32) / temp, axis=-1
    )  # [N, V]

    # ---- first expansion (reference :102-110) -------------------------------
    scores, first_tokens = _topk_iter(logp, beam_size)  # [N, beam]
    tokens = jnp.zeros((n_img, beam_size, n), jnp.int32)
    tokens = tokens.at[:, :, 0].set(first_tokens)
    seq_lengths = jnp.ones((n_img, beam_size), jnp.float32)
    has_stopped = (
        first_tokens == stop_token_id
        if stop_token_id is not None
        else jnp.zeros((n_img, beam_size), bool)
    )

    # Shared-prefix beam cache (optional LM capability, e.g. gpt2 int8):
    # the prefill K/V stays per-image and each beam row carries only its
    # generated tail — see gpt2.Int8BeamCache. Bitwise-equal tokens to the
    # replicated-cache fallback by construction. Multi-chip runs
    # (cache_constraint) keep the fallback: the constraint's shardings are
    # written for the full-cache pytree.
    shared_prefix = (
        hasattr(lm, "beam_prefix_cache") and cache_constraint is None
    )
    if shared_prefix:
        cache = lm.beam_prefix_cache(lm_cfg, cache, beam_size, p_len)
        decode_fn = lm.decode_step_beam
    else:
        # replicate each image's cache row across its beam block (jnp.repeat
        # on the batch axis keeps blocks contiguous: row i*beam+b is image i)
        cache = _expand_beams(cache, beam_size)
        decode_fn = lm.decode_step

    def step_input(tok):  # tok [N*beam]
        if token_mode:
            return tok[:, None].astype(jnp.int32)
        return lm.embed_tokens(params, tok)[:, None, :].astype(
            prompt_embeds.dtype)

    logits, cache = decode_fn(
        params, lm_cfg, step_input(first_tokens.reshape(-1)), cache
    )
    vocab = logits.shape[-1]
    img_base = jnp.arange(n_img, dtype=jnp.int32)[:, None] * beam_size

    def step_fn(carry, step):
        cache, logits, tokens, scores, seq_lengths, has_stopped = carry

        logp = jax.nn.log_softmax(logits.astype(jnp.float32) / temp, axis=-1)
        logp = logp.reshape(n_img, beam_size, vocab)
        # freeze stopped beams: -inf everywhere, 0 at column 0 (reference :112-113)
        col0 = jnp.arange(vocab)[None, None, :] == 0
        logp = jnp.where(
            has_stopped[:, :, None], jnp.where(col0, 0.0, -jnp.inf), logp
        )

        scores_sum = scores[:, :, None] + logp
        seq_lengths = seq_lengths + (~has_stopped).astype(jnp.float32)
        avg = scores_sum / seq_lengths[:, :, None]

        top_avg, flat_idx = _topk_iter(
            avg.reshape(n_img, beam_size * vocab), beam_size
        )
        source = flat_idx // vocab  # [N, beam], within-image beam index
        next_tok = flat_idx % vocab

        tokens = jnp.take_along_axis(tokens, source[:, :, None], axis=1)
        tokens = tokens.at[:, :, step].set(next_tok)
        seq_lengths = jnp.take_along_axis(seq_lengths, source, axis=1)
        has_stopped = jnp.take_along_axis(has_stopped, source, axis=1)
        scores = top_avg * seq_lengths

        global_source = (img_base + source).reshape(-1)  # block-diagonal
        if shared_prefix:
            cache = lm.reorder_beam_tail(cache, global_source)
        else:
            cache = _reorder_cache_tail(cache, global_source, p_len)
        if stop_token_id is not None:
            has_stopped = has_stopped | (next_tok == stop_token_id)

        logits, cache = decode_fn(
            params, lm_cfg, step_input(next_tok.reshape(-1)), cache
        )
        return (cache, logits, tokens, scores, seq_lengths, has_stopped), None

    init = (cache, logits, tokens, scores, seq_lengths, has_stopped)
    (cache, logits, tokens, scores, seq_lengths, has_stopped), _ = jax.lax.scan(
        step_fn, init, jnp.arange(1, n)
    )

    return {
        "tokens": tokens,
        "seq_lengths": seq_lengths.astype(jnp.int32),
        "scores": scores / seq_lengths,  # final normalization (reference :139)
    }


def beam_search(
    lm: Any,
    params: dict,
    lm_cfg: Any,
    prompt_embeds: jnp.ndarray,  # [1, P, D]
    beam_size: int = 5,
    max_new_tokens: int = 67,
    temperature: float = 1.0,
    stop_token_id: Optional[int] = None,
    cache_constraint=None,
) -> dict:
    """Single-image beam search (the reference generate_beam contract,
    inference.py:70-148): returns {tokens [beam, n], seq_lengths [beam],
    scores [beam]}. Thin wrapper over beam_search_batched at N=1 — the
    selection math is identical (iterated argmax == top_k's documented
    lowest-index-first tie order)."""
    if prompt_embeds.shape[0] != 1:
        raise ValueError(
            "beam_search expects a single prompt (batch 1); use "
            "beam_search_batched for N images in one executable"
        )
    out = beam_search_batched(
        lm, params, lm_cfg, prompt_embeds, beam_size=beam_size,
        max_new_tokens=max_new_tokens, temperature=temperature,
        stop_token_id=stop_token_id, cache_constraint=cache_constraint,
    )
    return {k: v[0] for k, v in out.items()}


def best_beam_text(result: dict, tokenizer) -> str:
    """Host-side: decode the highest-scoring beam (reference :140-144)."""
    # one bundled transfer (a device fetch costs a full relay round-trip)
    tokens, lengths, scores = jax.device_get(
        (result["tokens"], result["seq_lengths"], result["scores"])
    )
    order = scores.argsort()[::-1]
    best = int(order[0])
    ids = [int(t) for t in tokens[best][: int(lengths[best])]]
    return tokenizer.decode_tokens(ids)


def best_beam_texts(result: dict, tokenizer) -> list:
    """Host-side: best beam per image from a beam_search_batched result —
    ONE bundled device fetch for the whole batch (per-image fetches cost a
    ~30 ms relay round-trip each)."""
    tokens, lengths, scores = jax.device_get(
        (result["tokens"], result["seq_lengths"], result["scores"])
    )
    out = []
    for i in range(tokens.shape[0]):
        best = int(scores[i].argmax())
        ids = [int(t) for t in tokens[i, best][: int(lengths[i, best])]]
        out.append(tokenizer.decode_tokens(ids))
    return out
