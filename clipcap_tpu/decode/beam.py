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


#: cache fields beam search cannot handle: cross-attention / encoder
#: tensors stay at image-batch size while beam queries are beam_size-wide,
#: so the models' attention einsums would fail at trace time (nothing in
#: blip_text/t5 groups beams over shared K/V — that layout exists only via
#: decoder_lm repeat=, which beam_search does not use).
_CROSS_FIELDS = ("cross_k", "cross_v", "cross_bias", "enc_hidden", "enc_bias")


def _map_beam_axis(cache, fn):
    """Apply fn to every SELF-attention cache slab that follows beam
    reordering (axis 1 of the stacked [L, B, ...] arrays): the bf16
    KVCache's k/v and the int8 caches' k/v/ks/vs scale slabs.

    Beam search supports self-attention-only caches (gpt2/gptj, bf16 or
    int8). Caches carrying cross-attention tensors (blip_text, t5) are
    rejected up front in beam_search — see _CROSS_FIELDS."""
    upd = {name: fn(getattr(cache, name))
           for name in ("k", "v", "ks", "vs") if hasattr(cache, name)}
    return cache._replace(**upd)


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
    """
    if prompt_embeds.shape[0] != 1:
        raise ValueError("beam_search expects a single prompt (batch 1)")
    p_len = prompt_embeds.shape[1]
    n = max_new_tokens
    temp = temperature if temperature > 0 else 1.0

    cache = lm.init_cache(lm_cfg, batch=1, max_len=p_len + n, dtype=prompt_embeds.dtype)
    present_cross = [f for f in _CROSS_FIELDS
                     if getattr(cache, f, None) is not None]
    if present_cross:
        raise NotImplementedError(
            "beam_search supports self-attention-only KV caches (gpt2/gptj, "
            f"bf16 or int8); this cache carries cross-attention fields "
            f"{present_cross} whose image-batch axis does not follow beam "
            "reordering. Use decode/engine.generate (optionally with "
            "decoder_lm repeat=) for BLIP/T5-style cross-attention decoders."
        )
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

    # replicate the singleton cache across beams (batch axis of k/v is axis 1)
    def rep(x):
        return jnp.repeat(x, beam_size, axis=1) if x.ndim > 0 else x

    cache = _map_beam_axis(cache, rep)

    embeds = lm.embed_tokens(params, first_tokens)[:, None, :].astype(prompt_embeds.dtype)
    logits, cache = lm.decode_step(params, lm_cfg, embeds, cache)
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

        embeds = lm.embed_tokens(params, next_tok)[:, None, :].astype(prompt_embeds.dtype)
        logits, cache = lm.decode_step(params, lm_cfg, embeds, cache)
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
