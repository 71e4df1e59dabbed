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


def beam_search(
    lm: Any,
    params: dict,
    lm_cfg: Any,
    prompt_embeds: jnp.ndarray,  # [1, P, D]
    beam_size: int = 5,
    max_new_tokens: int = 67,
    temperature: float = 1.0,
    stop_token_id: Optional[int] = None,
    cache_constraint=None,  # cache -> cache (multi-chip hook, see engine.generate)
) -> dict:
    """Returns {tokens [beam, N], seq_lengths [beam], scores [beam]}.

    scores are the length-normalized log-probs used for the final ordering
    (reference inference.py:139-144); the best beam is argmax(scores).

    Works for every protocol LM: self-attention caches (gpt2/gptj, bf16 or
    int8) reorder their KV slabs per step; cross-attention caches
    (t5 — the reference's T0 beam path, lms/T0.py — and the BLIP decoder
    adapter) carry beam-invariant encoder tensors that are replicated once
    (_expand_beams). Token-id adapters (`lm.takes_token_ids`, e.g.
    blip_text.decoder_lm) get ids instead of embeddings, like
    engine.generate; for those, `prompt_embeds` is the [1, P] int prompt.
    """
    if prompt_embeds.shape[0] != 1:
        raise ValueError("beam_search expects a single prompt (batch 1)")
    token_mode = bool(getattr(lm, "takes_token_ids", False))
    p_len = prompt_embeds.shape[1]
    n = max_new_tokens
    temp = temperature if temperature > 0 else 1.0

    # token-id adapters pick their own cache dtype (from the image features)
    cache_dtype = None if token_mode else prompt_embeds.dtype
    cache = lm.init_cache(lm_cfg, batch=1, max_len=p_len + n, dtype=cache_dtype)
    if cache_constraint is not None:
        cache = cache_constraint(cache)
    logits, cache = lm.prefill(params, lm_cfg, prompt_embeds, cache)
    logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32) / temp, axis=-1)  # [1, V]

    # ---- first expansion (reference :102-110) -------------------------------
    scores, first_tokens = jax.lax.top_k(logp[0], beam_size)  # [beam]
    tokens = jnp.zeros((beam_size, n), jnp.int32)
    tokens = tokens.at[:, 0].set(first_tokens.astype(jnp.int32))
    seq_lengths = jnp.ones((beam_size,), jnp.float32)
    has_stopped = (
        first_tokens == stop_token_id
        if stop_token_id is not None
        else jnp.zeros((beam_size,), bool)
    )

    # replicate the singleton cache across beams
    cache = _expand_beams(cache, beam_size)

    def step_input(tok):
        if token_mode:
            return tok[:, None].astype(jnp.int32)
        return lm.embed_tokens(params, tok)[:, None, :].astype(prompt_embeds.dtype)

    logits, cache = lm.decode_step(params, lm_cfg, step_input(first_tokens), cache)
    vocab = logits.shape[-1]

    def step_fn(carry, step):
        cache, logits, tokens, scores, seq_lengths, has_stopped = carry

        logp = jax.nn.log_softmax(logits.astype(jnp.float32) / temp, axis=-1)
        # freeze stopped beams: -inf everywhere, 0 at column 0 (reference :112-113)
        col0 = jnp.arange(vocab)[None, :] == 0
        logp = jnp.where(has_stopped[:, None], jnp.where(col0, 0.0, -jnp.inf), logp)

        scores_sum = scores[:, None] + logp
        seq_lengths = seq_lengths + (~has_stopped).astype(jnp.float32)
        avg = scores_sum / seq_lengths[:, None]

        top_avg, flat_idx = jax.lax.top_k(avg.reshape(-1), beam_size)
        source = flat_idx // vocab
        next_tok = (flat_idx % vocab).astype(jnp.int32)

        tokens = tokens[source]
        tokens = tokens.at[:, step].set(next_tok)
        seq_lengths = seq_lengths[source]
        has_stopped = has_stopped[source]
        scores = top_avg * seq_lengths

        cache = _map_beam_axis(cache, lambda x: jnp.take(x, source, axis=1))
        if stop_token_id is not None:
            has_stopped = has_stopped | (next_tok == stop_token_id)

        logits, cache = lm.decode_step(params, lm_cfg, step_input(next_tok), cache)
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
