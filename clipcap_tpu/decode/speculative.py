"""Speculative greedy decoding: a small draft LM proposes, the target verifies.

TPU-native implementation of the technique the retrieved literature
recommends for autoregressive caption decoding (PAPERS.md: "Fast
Inference from Transformers via Speculative Decoding", "SpecVLM"):
instead of one target forward per token, the draft model decodes
`gamma` tokens cheaply, then ONE chunked target forward scores all of
them; the longest prefix where the target's own argmax agrees is
accepted, plus the target's token at the first disagreement (or the
bonus continuation when everything agreed). For GREEDY decoding the
output matches plain target-only greedy decode for ANY draft — the
draft only controls speed (tests/test_speculative.py pins exact
equality with a deliberately unrelated draft). One caveat on
"identical": verification scores the chunk through the models'
multi-token attention path while plain greedy uses the squeezed
single-token path — different FP reduction orders — so in low precision
a position whose top-2 logits are within kernel rounding noise can
resolve differently. Exact in the f32 test regime; near-ties are
measure-zero but not impossible with real bf16 checkpoints.

Design notes (single chip, lm/registry protocol):
- the whole loop is ONE jitted lax.while_loop: each iteration runs
  gamma+1 KV-cached draft steps (lax.scan) and one (gamma+1)-token
  target chunk forward through the models' cached multi-token path —
  per-iteration host round-trips would cost ~30 ms each through the TPU
  relay;
- rejection rewinds the caches by *index only* (cache._replace(index=...)):
  stale K/V beyond the index are excluded by the causal-over-cache bias
  and overwritten by the next chunk's dynamic_update_slice;
- batch 1: speculative decoding is a LATENCY technique, and per-row
  acceptance lengths would need per-row cache indices;
- prompts are embeddings in each model's own space (a ClipCap draft
  needs its own mapper trained against the draft LM) — callers pass the
  draft and target prompts separately; the models must share a
  tokenizer/vocab.

Greedy only: the stochastic variant needs the rejection-sampling
correction scheme; the reference pipeline's quality-bearing decodes
(beam, ranked Gen-B) are deterministic rankings anyway.

Measured (v5e, bf16, batch 1, gamma=4 — bench._bench_speculative, r3):
plain GPT2-XL greedy 5.53 ms/token; GPT-2-small plain 0.80; self-draft
(target drafts for itself -> 100% acceptance with an equal-cost draft)
7.39 — i.e. the acceptance/rewind machinery itself costs 1.34x, the
equal-cost draft can never win; adversarial draft (near-zero acceptance)
8.57 — the overhead floor. With the measured small-draft step cost the
analytic ceiling at full acceptance is (4*0.80 + 5.53)/4 = 2.18 ms/token
(2.5x over plain): a chunk costs ~8.7 ms against 5.53/token plain, so a
real small draft PAYS on this chip once it averages > ~1.6 accepted
tokens per 4-token chunk (~40% per-position agreement) and approaches
2.5x at high agreement. Needs real trained draft/target checkpoints to
realize; with random weights only the bounds are measurable.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def speculative_greedy(
    target_lm: Any,
    target_params: dict,
    target_cfg: Any,
    draft_lm: Any,
    draft_params: dict,
    draft_cfg: Any,
    target_prompt: jnp.ndarray,  # [1, P, D_target] embeddings
    draft_prompt: jnp.ndarray,  # [1, Pd, D_draft] embeddings (same token content)
    max_new_tokens: int = 32,
    gamma: int = 4,
    eos_token_id: Optional[int] = None,
    target_cache_constraint=None,  # cache -> cache (multi-chip hook,
    # e.g. parallel/tp.py constrain_cache — see engine.generate)
) -> dict:
    """Returns {"tokens" [1, N] int32, "lengths" [1], "chunks" [1]}.

    tokens match target-only greedy decode (pad 0 after a stop; see the
    module docstring for the low-precision near-tie caveat); `chunks`
    counts target forwards used — plain greedy uses `lengths` of them,
    so lengths/chunks is the realized target-model speedup.
    """
    if target_prompt.shape[0] != 1:
        raise ValueError("speculative decoding is batch-1 (latency path)")
    n = max_new_tokens
    g = gamma
    buf = n + g + 1  # emit buffer with chunk overshoot headroom

    t_cache = target_lm.init_cache(
        target_cfg, batch=1, max_len=target_prompt.shape[1] + buf,
        dtype=target_prompt.dtype,
    )
    if target_cache_constraint is not None:
        t_cache = target_cache_constraint(t_cache)
    d_cache = draft_lm.init_cache(
        draft_cfg, batch=1, max_len=draft_prompt.shape[1] + buf,
        dtype=draft_prompt.dtype,
    )
    t_logits, t_cache = target_lm.prefill(target_params, target_cfg,
                                          target_prompt, t_cache)
    _, d_cache = draft_lm.prefill(draft_params, draft_cfg, draft_prompt, d_cache)
    first = jnp.argmax(t_logits[:, -1], axis=-1).astype(jnp.int32)[0]

    tokens0 = jnp.zeros((buf,), jnp.int32).at[0].set(first)
    done0 = (first == eos_token_id) if eos_token_id is not None else jnp.asarray(False)

    def draft_step(cache, tok):
        emb = draft_lm.embed_tokens(draft_params, tok[None])[:, None, :].astype(
            draft_prompt.dtype
        )
        logits, cache = draft_lm.decode_step(draft_params, draft_cfg, emb, cache)
        return cache, jnp.argmax(logits[0], axis=-1).astype(jnp.int32)

    def draft_propose(d_cache, last):
        """g+1 chained draft steps fed [last, p1..pg]; returns P = [p1..pg]
        (the g proposals) with the draft cache covering through pg's
        position, so full acceptance needs no draft catch-up."""

        def step(carry, _):
            tok, cache = carry
            cache, nxt = draft_step(cache, tok)
            return (nxt, cache), nxt

        (_, d_cache), drafted = jax.lax.scan(
            step, (last, d_cache), None, length=g + 1
        )
        return d_cache, drafted[:g]

    def body(state):
        tokens, count, done, chunks, t_cache, d_cache = state
        last = tokens[count - 1]

        d_cache, proposal = draft_propose(d_cache, last)  # [g]

        # one target forward over [last, p1..pg-1... , pg] = g+1 tokens:
        # slot i's argmax is the target's choice FOLLOWING chunk token i
        chunk_tokens = jnp.concatenate([last[None], proposal])  # [g+1]
        chunk_emb = target_lm.embed_tokens(
            target_params, chunk_tokens[None]
        ).astype(target_prompt.dtype)
        logits, t_cache = _chunk_forward(
            target_lm, target_params, target_cfg, chunk_emb, t_cache
        )
        t_argmax = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [g+1]

        # longest agreeing prefix of proposals; t_argmax[n_accept] is the
        # correction at the first disagreement, or the bonus token when
        # every proposal agreed
        agree = (proposal == t_argmax[:g]).astype(jnp.int32)
        n_accept = jnp.sum(jnp.cumprod(agree))  # 0..g
        next_tok = t_argmax[n_accept]
        emit = jnp.where(jnp.arange(g + 1) < n_accept,
                         jnp.concatenate([proposal, proposal[-1:]]),
                         next_tok)  # [g+1]; slots > n_accept are padding
        n_emit = n_accept + 1

        tokens = jax.lax.dynamic_update_slice(tokens, emit, (count,))
        if eos_token_id is not None:
            idx = jnp.arange(g + 1)
            hit = (emit == eos_token_id) & (idx < n_emit)
            eos_at = jnp.min(jnp.where(hit, idx, buf))
            n_emit = jnp.minimum(n_emit, eos_at + 1)
            done = done | jnp.any(hit)

        # rewind both caches to cover exactly the emitted history minus
        # the newest token (the invariant at loop entry) — computed from
        # the EOS-TRUNCATED n_emit so the invariant also holds on the
        # exiting iteration (a mid-chunk EOS shrinks the emitted history;
        # rewinding by the pre-truncation amount would leave both caches
        # up to g positions ahead, a trap for any future continuation
        # extension even though done=True exits the loop today)
        t_cache = _rewind(t_cache, (g + 1) - n_emit)
        d_cache = _rewind(d_cache, (g + 1) - n_emit)
        count = count + n_emit
        done = done | (count >= n)
        return tokens, count, done, chunks + 1, t_cache, d_cache

    def cond(state):
        _, count, done, _, _, _ = state
        return jnp.logical_not(done) & (count < n)

    tokens, count, _, chunks, _, _ = jax.lax.while_loop(
        cond, body, (tokens0, jnp.asarray(1, jnp.int32), done0,
                     jnp.asarray(1, jnp.int32), t_cache, d_cache)
    )
    count = jnp.minimum(count, n)
    # zero the tail like the engine's pad so tokens are comparable
    tokens = jnp.where(jnp.arange(buf) < count, tokens, 0)
    return {
        "tokens": tokens[:n][None],
        "lengths": count[None],
        "chunks": chunks[None],
    }


def _chunk_forward(lm, params, cfg, chunk_emb, cache):
    """Multi-token cached forward returning full per-position logits.

    The registry prefill() requires a fresh cache; the models' shared
    _forward_cached handles t>1 continuation (gpt2/gptj), so drive it
    directly when exposed. Falls back to a per-token decode_step scan
    for adapters without the hook (same tokens, g+1 separate forwards) —
    NOTE for weight-streaming targets (the int8 modules) that fallback
    re-streams the full weights per chunk position, so speculative
    decode cannot beat plain greedy there; pair a bf16 target with a
    small draft instead."""
    fwd = getattr(lm, "_forward_cached", None)
    if fwd is not None:
        return fwd(params, cfg, chunk_emb, cache)

    def step(cache, emb):
        logits, cache = lm.decode_step(params, cfg, emb[None][None], cache)
        return cache, logits[0]

    cache, logits = jax.lax.scan(step, cache, chunk_emb[0])
    return logits[None], cache


def _rewind(cache, n_back):
    """Roll the cache index back (stale K/V beyond the index are masked
    by the causal-over-cache bias and overwritten by the next chunk)."""
    return cache._replace(index=cache.index - n_back)
