"""Logit filters and penalties for decoding — TPU-shaped.

These reproduce the semantics of the reference's sampling math but as
fixed-shape, batched, jit-compatible functions:

- top_k_top_p_filter: the batched filter with *per-sample* top_k / top_p
  (reference sampling.py:114-162 `top_k_top_p_filtering_batch`, incl. the
  fractional-top_k convention where 0 < k < 1 means a fraction of the
  vocabulary). The reference's per-row Python loop becomes one sorted
  scan over the whole batch.
- typical_filter: typical decoding (Meister et al. 2022,
  reference sampling.py:72-102).
- repetition_penalty: CTRL-style sign-aware gather/scale/scatter
  (reference sampling.py:65-69), with a validity mask instead of ragged
  token lists.
- sentence_length_penalty: scales the stop-token logit by
  (current_length / desired_length) * length_factor. NOTE: the reference
  (inference.py:59-68) compares logit *values* against the stop-token id
  (`tok_logits == stop_token`), which never fires in practice; we
  implement the documented intent (scale the stop token's logit).

All filters take logits of shape [B, V] (use [1, V] for single samples)
and return filtered logits with masked entries set to -inf. Hyperparameters
may be Python scalars or per-row vectors of shape [B].
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float("-inf")

Scalar = Union[float, int, jnp.ndarray]


def _concrete_value(x) -> Optional[np.ndarray]:
    """np array for trace-time-concrete inputs, None for tracers."""
    if isinstance(x, jax.core.Tracer):
        return None
    try:
        return np.asarray(x, dtype=np.float64)
    except Exception:
        return None


def _per_row(x: Scalar, batch: int, dtype=jnp.float32) -> jnp.ndarray:
    x = jnp.asarray(x, dtype=dtype)
    if x.ndim == 0:
        x = jnp.broadcast_to(x, (batch,))
    return x.reshape(batch)


def _unsort_mask(sorted_mask: jnp.ndarray, sorted_indices: jnp.ndarray) -> jnp.ndarray:
    """Scatter a boolean mask computed in sorted order back to original order."""
    inv = jnp.argsort(sorted_indices, axis=-1)
    return jnp.take_along_axis(sorted_mask, inv, axis=-1)


def top_k_top_p_filter(
    logits: jnp.ndarray,
    top_k: Scalar = 0,
    top_p: Scalar = 0.0,
    filter_value: float = NEG_INF,
    prefilter_k: int = 0,
    _tail_lse=None,
) -> jnp.ndarray:
    """Batched top-k + nucleus filtering with per-sample parameters.

    top_k semantics (matching reference sampling.py:126-148):
      k <= 0        -> disabled
      0 < k < 1     -> keep max(1, floor(k * V)) tokens (fraction of vocab)
      k >= 1        -> keep floor(k) tokens
    top_p semantics (reference sampling.py:149-160): p <= 0 disables; keeps
    the smallest set of top tokens whose cumulative probability exceeds p,
    always including the first token above the threshold.

    prefilter_k > 0 is the TPU fast path for large vocabularies: the filter
    logic runs on the lax.top_k(prefilter_k) candidate set instead of a
    full-vocab sort (sorts dominate big-vocab decode steps). Exact whenever
    every top_k <= prefilter_k (fractional top_k excluded) and the nucleus
    boundary lies within the candidate set — tokens beyond it carry the
    tail probability mass and are removed by either semantics.
    """
    batch, vocab = logits.shape
    logits = logits.astype(jnp.float32)

    if prefilter_k and prefilter_k < vocab:
        # exactness guard (ADVICE r1): when the hyperparameters are concrete
        # at trace time, silently-inexact configurations fall back to the
        # full-vocab path instead of diverging from reference semantics —
        # an effective top_k (incl. fractional k resolving to floor(k*V))
        # larger than the candidate set, or a nucleus threshold so close to
        # 1.0 that its boundary may lie outside the candidates. Traced
        # hyperparameters can't be inspected; callers passing those should
        # size prefilter_k with headroom.
        k_conc = _concrete_value(top_k)
        p_conc = _concrete_value(top_p)
        if k_conc is not None:
            k_abs_conc = np.where(
                (k_conc > 0) & (k_conc < 1),
                np.maximum(1.0, np.floor(k_conc * vocab)),
                k_conc,
            )
            if (k_abs_conc > prefilter_k).any():
                prefilter_k = 0
        if prefilter_k and p_conc is not None and (p_conc >= 0.995).any():
            prefilter_k = 0

    if prefilter_k and prefilter_k < vocab:
        # resolve fractional top_k against the TRUE vocab before reducing
        k_in = _per_row(top_k, batch)
        k_abs = jnp.where(
            (k_in > 0) & (k_in < 1),
            jnp.maximum(1.0, jnp.floor(k_in * vocab)),
            k_in,
        )
        vals, idx = jax.lax.top_k(logits, prefilter_k)  # [B, N] descending
        # nucleus denominators must include the probability mass of the
        # excluded tail for rows WITHOUT an active top-k (an active top-k
        # <= N removes the tail anyway, matching the full-vocab semantics)
        lse_full = jax.scipy.special.logsumexp(logits, axis=-1)
        lse_top = jax.scipy.special.logsumexp(vals, axis=-1)
        delta = jnp.clip(lse_top - lse_full, None, -1e-9)
        tail_lse = lse_full + jnp.log1p(-jnp.exp(delta))
        tail_lse = jnp.where(k_abs > 0, -jnp.inf, tail_lse)
        filtered = top_k_top_p_filter(vals, k_abs, top_p, filter_value,
                                      prefilter_k=0, _tail_lse=tail_lse)
        full = jnp.full((batch, vocab), filter_value, jnp.float32)
        return full.at[jnp.arange(batch)[:, None], idx].set(filtered)

    k = _per_row(top_k, batch)
    p = _per_row(top_p, batch)

    sorted_idx = jnp.argsort(-logits, axis=-1)  # descending, stable
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)

    # ---- top-k: per-row cutoff at the k-th largest value -------------------
    k_eff = jnp.where((k > 0) & (k < 1), jnp.maximum(1.0, jnp.floor(k * vocab)), jnp.floor(k))
    k_eff = jnp.clip(k_eff, 0, vocab).astype(jnp.int32)
    # cutoff value = sorted_logits[k_eff - 1] (only meaningful when k_eff > 0)
    gather_at = jnp.clip(k_eff - 1, 0, vocab - 1)[:, None]
    cutoff = jnp.take_along_axis(sorted_logits, gather_at, axis=-1)  # [B, 1]
    k_active = (k_eff > 0)[:, None]
    # reference removes logits strictly below the cutoff (ties survive)
    logits = jnp.where(k_active & (logits < cutoff), filter_value, logits)

    # ---- top-p (nucleus) ----------------------------------------------------
    # recompute sorted view of the (possibly top-k-filtered) logits
    sorted_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
    if _tail_lse is None:
        probs = jax.nn.softmax(sorted_logits, axis=-1)
    else:
        # prefilter fast path: normalize against the full-vocab mass
        lse_here = jax.scipy.special.logsumexp(sorted_logits, axis=-1)
        denom = jnp.logaddexp(lse_here, _tail_lse)
        probs = jnp.exp(sorted_logits - denom[:, None])
    cum = jnp.cumsum(probs, axis=-1)
    remove = cum > p[:, None]
    # shift right so the first token crossing the threshold is kept
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[:, :1]), remove[:, :-1]], axis=-1
    )
    p_active = (p > 0.0)[:, None]
    remove = remove & p_active
    remove = _unsort_mask(remove, sorted_idx)
    return jnp.where(remove, filter_value, logits)


def _bisect_desc(pred, lo, hi, iters: int):
    """Vectorized per-row bisection: pred is monotone decreasing in t;
    returns the largest t (within (hi-lo)/2^iters) where pred(t) holds."""

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        ok = pred(mid)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo, hi


def top_k_top_p_filter_threshold(
    logits: jnp.ndarray,
    top_k: Scalar = 0,
    top_p: Scalar = 0.0,
    filter_value: float = NEG_INF,
    iters: int = 40,
) -> jnp.ndarray:
    """Sort-free top-k + nucleus filtering via per-row threshold bisection.

    Same semantics as top_k_top_p_filter (reference sampling.py:114-162)
    computed WITHOUT any sort: the k-th-largest logit / the nucleus
    boundary are found by binary search on a cutoff value, each step one
    masked reduction over [B, V]. On a 50k vocab at B=256 this is ~1.7 ms
    vs ~300 ms for the full-vocab sort and ~48 ms for the lax.top_k
    prefilter (which itself lowers to a sort) — and unlike the prefilter
    it is EXACT full-vocab semantics, up to bisection epsilon
    ((max-min)/2^iters) at the cutoff and the tie rule: sort order keeps
    the first of exactly-tied boundary tokens, thresholding keeps all of
    them (ties at the boundary are measure-zero for real logits).
    """
    batch, vocab = logits.shape
    logits = logits.astype(jnp.float32)
    k = _per_row(top_k, batch)
    p = _per_row(top_p, batch)
    k_conc = _concrete_value(top_k)
    p_conc = _concrete_value(top_p)

    neg = jnp.asarray(filter_value, jnp.float32)
    finite_min = jnp.min(jnp.where(jnp.isfinite(logits), logits, jnp.inf),
                         axis=-1, keepdims=True)
    hi0 = jnp.max(logits, axis=-1, keepdims=True)

    # ---- top-k: cutoff = k-th largest value (ties survive) -----------------
    if k_conc is None or (k_conc != 0).any():
        k_eff = jnp.where((k > 0) & (k < 1), jnp.maximum(1.0, jnp.floor(k * vocab)),
                          jnp.floor(k))
        k_eff = jnp.clip(k_eff, 0, vocab)[:, None]

        def count_pred(mid):
            return jnp.sum((logits >= mid).astype(jnp.float32), axis=-1,
                           keepdims=True) >= k_eff

        lo, _ = _bisect_desc(count_pred, finite_min, hi0, iters)
        k_active = (k_eff > 0)
        logits = jnp.where(k_active & (logits < lo), neg, logits)

    # ---- top-p: nucleus boundary over the (top-k-filtered) distribution ----
    if p_conc is None or (p_conc != 0).any():
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        probs = jnp.exp(logits - lse)

        def mass_pred(mid):
            return jnp.sum(jnp.where(logits >= mid, probs, 0.0), axis=-1,
                           keepdims=True) > p[:, None]

        lo, _ = _bisect_desc(mass_pred, hi0 - 100.0, hi0, iters)
        keep = (logits >= lo) | (p[:, None] <= 0.0)
        logits = jnp.where(keep, logits, neg)

    return logits


def typical_filter_threshold(
    logits: jnp.ndarray,
    typ_p: Scalar = 0.0,
    filter_value: float = NEG_INF,
    iters: int = 40,
) -> jnp.ndarray:
    """Sort-free typical filter (same semantics as typical_filter): keep
    the tokens whose surprise |−log p − H| is smallest, until their
    cumulative probability reaches typ_p (boundary token included)."""
    batch, vocab = logits.shape
    logits = logits.astype(jnp.float32)
    t = _per_row(typ_p, batch)[:, None]

    logp = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(logp)
    entropy = -jnp.sum(jnp.where(probs > 0, probs * logp, 0.0), axis=-1, keepdims=True)
    score = jnp.abs(-logp - entropy)  # ascending = more typical

    # find the smallest score cutoff s with mass(score <= s) >= typ_p:
    # pred(s) = mass(score <= s) < typ_p is monotone decreasing in s, so
    # bisection's hi endpoint converges to the boundary from above
    lo = jnp.zeros_like(entropy)
    hi = jnp.max(jnp.where(jnp.isfinite(score), score, 0.0), axis=-1, keepdims=True)

    def pred(mid):
        return jnp.sum(jnp.where(score <= mid, probs, 0.0), axis=-1,
                       keepdims=True) < t

    _, hi_f = _bisect_desc(pred, lo, hi, iters)
    keep = (score <= hi_f) | (t <= 0.0)
    return jnp.where(keep, logits, jnp.asarray(filter_value, jnp.float32))


def typical_filter(
    logits: jnp.ndarray,
    typ_p: Scalar = 0.0,
    min_tokens_to_keep: int = 1,
    filter_value: float = NEG_INF,
) -> jnp.ndarray:
    """Typical decoding filter (reference sampling.py:72-102).

    Keeps the tokens whose -log p is closest to the distribution entropy,
    accumulating probability mass until typ_p. typ_p <= 0 disables.
    """
    batch, vocab = logits.shape
    logits = logits.astype(jnp.float32)
    tp = _per_row(typ_p, batch)

    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    # -inf logits give p=0, log_probs=-inf -> 0 * -inf = nan; nansum semantics
    plogp = jnp.where(probs > 0, log_probs * probs, 0.0)
    entropy = -jnp.sum(plogp, axis=-1, keepdims=True)
    shifted = jnp.abs(log_probs + entropy)  # distance from typicality

    order = jnp.argsort(shifted, axis=-1)  # ascending, stable
    sorted_scores = jnp.take_along_axis(shifted, order, axis=-1)
    sorted_p = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_p, axis=-1)

    last_ind = jnp.sum(cum < tp[:, None], axis=-1, keepdims=True)
    last_ind = jnp.clip(last_ind, 0, vocab - 1)
    cutoff_score = jnp.take_along_axis(sorted_scores, last_ind, axis=-1)
    sorted_remove = sorted_scores > cutoff_score
    if min_tokens_to_keep > 1:
        keep = jnp.arange(vocab)[None, :] < min_tokens_to_keep
        sorted_remove = sorted_remove & ~keep

    active = (tp > 0.0)[:, None]
    remove = _unsort_mask(sorted_remove, order) & active
    return jnp.where(remove, filter_value, logits)


def token_occurrence_mask(
    tokens: jnp.ndarray,  # [B, T] token ids
    vocab: int,
    tokens_valid: Optional[jnp.ndarray] = None,  # [B, T] bool
) -> jnp.ndarray:
    """[B, V] bool: which vocab ids appear in each row's (valid) tokens.

    The repetition penalty's occurrence scatter, shared with the fused
    Pallas step sampler (ops/pallas/fused_sampler.fused_step_sample),
    which applies the penalty in-kernel on the same mask."""
    batch = tokens.shape[0]
    if tokens_valid is None:
        tokens_valid = jnp.ones(tokens.shape, dtype=bool)
    appears = jnp.zeros((batch, vocab), dtype=bool)
    safe_tokens = jnp.clip(tokens, 0, vocab - 1)
    batch_idx = jnp.arange(batch)[:, None]
    return appears.at[batch_idx, safe_tokens].max(tokens_valid)


def repetition_penalty(
    logits: jnp.ndarray,  # [B, V]
    tokens: jnp.ndarray,  # [B, T] already-generated token ids
    penalty: Scalar,
    tokens_valid: Optional[jnp.ndarray] = None,  # [B, T] bool
) -> jnp.ndarray:
    """CTRL-style repetition penalty (reference sampling.py:65-69).

    Logits of already-generated tokens are multiplied by `penalty` when
    negative and divided when positive. `tokens_valid` masks padding slots
    of the fixed-shape token buffer (the reference's ragged `tokens` list).
    """
    batch, vocab = logits.shape
    logits = logits.astype(jnp.float32)
    appears = token_occurrence_mask(tokens, vocab, tokens_valid)
    pen = _per_row(penalty, batch)[:, None]
    penalized = jnp.where(logits < 0, logits * pen, logits / pen)
    return jnp.where(appears, penalized, logits)


def sentence_length_penalty(
    logits: jnp.ndarray,  # [B, V]
    stop_token: int,
    current_length: Scalar,
    desired_length: int,
    length_factor: float = 1.0,
) -> jnp.ndarray:
    """Scale the stop token's logit by (current_length/desired_length)*factor.

    Implements the documented intent of reference inference.py:59-68 (whose
    value-vs-index comparison bug makes it a no-op there; see module doc).
    """
    batch, vocab = logits.shape
    logits = logits.astype(jnp.float32)
    scale = (_per_row(current_length, batch) / desired_length) * length_factor
    stop_col = logits[:, stop_token] * scale
    return logits.at[:, stop_token].set(stop_col)


def sample_categorical(
    rng: jax.Array, logits: jnp.ndarray, num_samples: int = 1
) -> jnp.ndarray:
    """Multinomial sampling without replacement via the Gumbel-top-k trick.

    Matches torch.multinomial(p, num_samples, replacement=False) in
    distribution. Returns [B, num_samples] int32.
    """
    gumbel = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    perturbed = logits.astype(jnp.float32) + gumbel
    _, idx = jax.lax.top_k(perturbed, num_samples)
    return idx.astype(jnp.int32)
