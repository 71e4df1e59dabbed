"""KV-cached autoregressive generation engine (lax.scan, fixed shapes).

The single decode loop behind every sampler in the framework. It replaces
the reference's assorted token-by-token Python loops, all of which
recompute the full sequence each step with no KV cache:

- inference.py:219-292 generate_no_beam (batch-1, top_p sweep rerun per
  value) -> here the sweep is one batch with a per-row top_p vector;
- evaluate_model.py:104-179 generate_no_beam (BOS prepend, max_stops '.'
  counting, stop on special tokens);
- sampling.py:166-279 generate (the Gen-B batched heterogeneous sampler:
  per-sample top_p/top_k/typ_p/min/max-length tensors, min-length EOS
  suppression, force-EOS early stop, alternate-token continuation, and
  *dynamic batch shrinking*) -> finished rows are masked, never spliced
  out, so every shape is static for XLA.

All hyperparameters accept scalars or per-row [B] vectors.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..ops import sampling as S

Scalar = Union[float, int, jnp.ndarray]
BIG = jnp.iinfo(jnp.int32).max


@dataclasses.dataclass(frozen=True)
class GenerationSettings:
    """Decode hyperparameters (scalars broadcast; arrays are per-row)."""

    max_new_tokens: int = 67  # reference inference.py entry_length default
    temperature: float = 1.0
    top_k: Scalar = 0
    top_p: Scalar = 0.0
    typ_p: Scalar = 0.0
    repetition_penalty: float = 1.0
    greedy: bool = False

    # '.'-style stopping (reference inference.py:284, evaluate_model.py:169)
    stop_token_id: Optional[int] = None
    max_stops: int = 1
    stop_on_special: Tuple[int, ...] = ()  # tokenizer.all_special_ids

    # Gen-B controls (reference sampling.py:166-279)
    eos_token_id: Optional[int] = None
    min_length: Scalar = 0  # suppress EOS before this many new tokens
    max_length: Scalar = BIG  # per-row cap on new tokens
    force_eos_log_prob: float = 0.0  # < 0 activates early stop on high raw EOS prob
    min_alternate_prob: float = 0.0  # alternate-token continuation threshold

    # sentence-length penalty (reference inference.py:59-68 intent)
    desired_sentence_length: int = 0  # 0 = off
    sentence_length_factor: float = 1.0

    # logit-filter implementation:
    #   "fused" (default): on TPU, the SAMPLED path runs one Pallas kernel
    #     (ops/pallas/fused_sampler.py) doing threshold filtering + Gumbel
    #     top-2 sampling on VMEM-resident logits with the on-core PRNG —
    #     ~1 HBM pass/step instead of ~40 (measured ~6 ms -> ~1 ms at
    #     [512, 50257]). Filter semantics match "threshold"; the sampling
    #     STREAM differs from jax.random (same distribution, different
    #     draws). Falls back to "threshold" whenever the kernel does not
    #     apply: non-TPU backends (CPU tests keep bit-stable trajectories),
    #     greedy decode, active typ_p, or an active sentence-length
    #     penalty (applied between filter and sample).
    #   "threshold": sort-free per-row cutoff bisection — exact full-vocab
    #     semantics at ~1.7 ms/step on a 50k vocab (B=256) vs ~300 ms for
    #     the sort path (ops/sampling.*_threshold);
    #   "sort": the sort-based reference transcription; honors
    #     vocab_prefilter (> 0 = run on the lax.top_k(N) candidate set,
    #     exact while the nucleus fits; 0 = full-vocab sorts).
    filter_method: str = "fused"
    vocab_prefilter: int = 0

    # NOTE: an attend_quantum/attend_len segmentation (read only the
    # written KV prefix per decode segment) existed through r2 and was
    # REMOVED in r3: XLA materializes narrowed cache slices instead of
    # fusing them (12% slower end-to-end), and the Pallas manual-DMA
    # decode-attention kernel that could narrow the read for real streams
    # int8 KV slabs at ~30-37 GB/s on this chip regardless of minor-dim
    # packing (64/128/256 probed) vs ~408 GB/s for the fused XLA
    # full-width read — an order of magnitude short of paying for the
    # ~20% traffic it saves. See CLAUDE.md performance facts.

    pad_token_id: int = 0


def _rows(x: Scalar, b: int, dtype=jnp.float32):
    x = jnp.asarray(x, dtype)
    return jnp.broadcast_to(x, (b,)) if x.ndim == 0 else x.reshape(b)


def _statically_active(x) -> bool:
    """True unless the setting is concretely all-zero at trace time.

    Only tracer values (whose concreteness genuinely can't be inspected)
    default to "active"; anything else non-numeric (e.g. a string passed
    by mistake) raises instead of silently enabling a full-vocab sort per
    decode step.
    """
    if isinstance(x, (bool, int, float)):
        return x != 0
    if isinstance(x, jax.core.Tracer):
        return True  # traced values: assume active
    import numpy as np

    try:
        arr = np.asarray(x)
    except Exception as err:
        raise TypeError(
            f"invalid sampling setting {x!r}: expected a number or array"
        ) from err
    if not jnp.issubdtype(arr.dtype, jnp.number) and arr.dtype != bool:
        raise TypeError(
            f"invalid sampling setting {x!r} (dtype {arr.dtype}): expected numeric"
        )
    return bool((arr != 0).any())


def filter_and_sample(
    settings: GenerationSettings,
    logits: jnp.ndarray,  # [B, V] f32, post rep-penalty / EOS suppression
    top_k: jnp.ndarray,  # [B]
    top_p: jnp.ndarray,  # [B]
    typ_p: jnp.ndarray,  # [B]
    sample_key: jax.Array,
    step,  # scalar step counter (sentence-length penalty input)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Temperature -> filters -> sample: the per-step logits pipeline.

    Shared by generate() and the continuous-batching ServingEngine
    (decode/serving.py) so both run the identical filter semantics and the
    identical fused-Pallas/threshold/sort path selection. Returns
    (next_token, alt_token, alt_prob), each [B] (alt_prob is zeros unless
    min_alternate_prob is active on the sampled path).
    """
    b = logits.shape[0]
    t = settings.temperature
    logits = logits / (t if t > 0 else 1.0)
    topk_active = _statically_active(settings.top_k)
    topp_active = _statically_active(settings.top_p)
    typp_active = _statically_active(settings.typ_p)
    slp_active = (
        settings.desired_sentence_length > 0
        and settings.stop_token_id is not None
    )
    want_alt = (not settings.greedy) and settings.min_alternate_prob > 0
    # fused Pallas path: filter + Gumbel top-2 sampling in one kernel
    # (ops/pallas/fused_sampler.py). Only for the sampled path on TPU
    # with no typical filter and no sentence-length penalty (both sit
    # between filtering and sampling in the reference order).
    use_fused = (
        settings.filter_method == "fused"
        and not settings.greedy
        and not typp_active
        and not slp_active
        and jax.default_backend() == "tpu"
    )

    if use_fused:
        from ..ops.pallas.fused_sampler import fused_filter_sample

        seed = jax.random.randint(
            sample_key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
        next_token, alt_token, alt_prob = fused_filter_sample(
            logits, top_k, top_p, seed,
            do_topk=topk_active, do_topp=topp_active,
            want_alt_prob=want_alt,
        )
        return (next_token.astype(jnp.int32), alt_token.astype(jnp.int32),
                alt_prob)

    # static gating: skip filters whose settings are Python-level
    # zeros — each active filter costs full-vocab passes per step
    threshold_filters = settings.filter_method != "sort"
    if topk_active or topp_active:
        if threshold_filters:
            logits = S.top_k_top_p_filter_threshold(logits, top_k, top_p)
        else:
            logits = S.top_k_top_p_filter(
                logits, top_k, top_p, prefilter_k=settings.vocab_prefilter
            )
    if typp_active:
        if threshold_filters:
            logits = S.typical_filter_threshold(logits, typ_p)
        else:
            logits = S.typical_filter(logits, typ_p)

    if slp_active:
        logits = S.sentence_length_penalty(
            logits,
            settings.stop_token_id,
            current_length=step,
            desired_length=settings.desired_sentence_length,
            length_factor=settings.sentence_length_factor,
        )

    if settings.greedy:
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        alt_token = next_token
        alt_prob = jnp.zeros((b,), jnp.float32)
    else:
        samples = S.sample_categorical(sample_key, logits, num_samples=2)
        next_token, alt_token = samples[:, 0], samples[:, 1]
        if want_alt:
            probs = jax.nn.softmax(logits, axis=-1)
            alt_prob = jnp.take_along_axis(
                probs, alt_token[:, None], axis=-1
            )[:, 0]
        else:
            alt_prob = jnp.zeros((b,), jnp.float32)
    return next_token, alt_token, alt_prob


def generate(
    lm: Any,  # LM module implementing the lm/registry protocol
    params: dict,
    lm_cfg: Any,
    prompt_embeds: jnp.ndarray,  # [B, P, D] embeddings — or [B, P] token ids
    settings: GenerationSettings,
    rng: Optional[jax.Array] = None,
    prompt_tokens: Optional[jnp.ndarray] = None,  # [B, Tp] fed to rep-penalty
    cache_constraint=None,  # cache -> cache; e.g. tp.GPTJDecodeShardings.constrain_cache
) -> dict:
    """Generate settings.max_new_tokens tokens after prompt_embeds.

    `cache_constraint` is the multi-chip hook: a function applied to the
    freshly created KV cache inside the traced computation (typically
    jax.lax.with_sharding_constraint via parallel/tp.py), so tensor- or
    data-parallel decode keeps the cache sharded across every step.

    When `lm.takes_token_ids` is set (e.g. the BLIP decoder adapter, whose
    embedding layer owns positions+LayerNorm), `prompt_embeds` is a [B, P]
    int array of token ids and each step feeds ids instead of embeddings.

    Returns dict with:
      tokens      [B, N] int32 (pad_token_id after a row stops)
      lengths     [B] number of generated tokens incl. the stopping token
      stopped     [B] bool
      eos_logprob [B, N] raw log P(eos) per step (Gen-B stat,
                  reference sampling.py:228-235) — present iff eos_token_id.
    """
    token_mode = bool(getattr(lm, "takes_token_ids", False))
    b, p_len = prompt_embeds.shape[:2]
    n = settings.max_new_tokens
    if rng is None:
        rng = jax.random.PRNGKey(0)

    top_k = _rows(settings.top_k, b)
    top_p = _rows(settings.top_p, b)
    typ_p = _rows(settings.typ_p, b)
    min_len = _rows(settings.min_length, b, jnp.int32)
    max_len = _rows(settings.max_length, b, jnp.int32)

    n_prompt_tok = 0 if prompt_tokens is None else prompt_tokens.shape[1]
    # token history buffer for the repetition penalty: prompt tokens + generated
    hist = jnp.zeros((b, n_prompt_tok + n), jnp.int32)
    hist_valid = jnp.zeros((b, n_prompt_tok + n), bool)
    if prompt_tokens is not None:
        hist = hist.at[:, :n_prompt_tok].set(prompt_tokens.astype(jnp.int32))
        hist_valid = hist_valid.at[:, :n_prompt_tok].set(True)

    # token-id adapters pick their own cache dtype (from the image features)
    cache_dtype = None if token_mode else prompt_embeds.dtype
    cache = lm.init_cache(lm_cfg, batch=b, max_len=p_len + n, dtype=cache_dtype)
    if cache_constraint is not None:
        cache = cache_constraint(cache)
    prefill_logits, cache = lm.prefill(params, lm_cfg, prompt_embeds, cache)
    last_logits = prefill_logits[:, -1].astype(jnp.float32)

    # "fused_step": run the ENTIRE per-step logit pipeline (raw eos
    # logprob, min-length eos suppression, repetition penalty, temperature,
    # filters, sampling) as one Pallas kernel on a single VMEM residency —
    # the eos logsumexp and penalty passes are otherwise 2-3 more
    # full-vocab HBM round-trips per step. Opt-in (the benched default
    # stays "fused"); falls back to the threshold path wherever the fused
    # sampler itself would (greedy, typ_p, sentence-length penalty, or a
    # non-TPU backend), plus when the penalty/temperature are not static
    # scalars (the kernel bakes them in as constants).
    pen = settings.repetition_penalty
    pen = 1.0 if pen in (None, 0.0) else pen
    use_fused_step = (
        settings.filter_method == "fused_step"
        and not settings.greedy
        and not _statically_active(settings.typ_p)
        and not (settings.desired_sentence_length > 0
                 and settings.stop_token_id is not None)
        and isinstance(pen, (int, float))
        and isinstance(settings.temperature, (int, float))
        and jax.default_backend() == "tpu"
    )

    def step_fn(carry, step):
        cache, last_logits, hist, hist_valid, stopped, stops, rng = carry
        rng, sample_key = jax.random.split(rng)

        logits = last_logits  # [B, V] f32
        if use_fused_step:
            from ..ops.pallas.fused_sampler import fused_step_sample

            appears = None
            if pen != 1.0:
                appears = S.token_occurrence_mask(
                    hist, logits.shape[1], tokens_valid=hist_valid
                )
            suppress_eos = (
                (step < min_len) if settings.eos_token_id is not None else None
            )
            seed = jax.random.randint(
                sample_key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            t = settings.temperature
            next_token, alt_token, alt_prob, raw_eos_lp = fused_step_sample(
                logits, top_k, top_p, seed,
                appears=appears, penalty=float(pen),
                temperature=float(t if t > 0 else 1.0),
                eos_token_id=settings.eos_token_id,
                suppress_eos=suppress_eos,
                want_eos_lp=settings.eos_token_id is not None,
                do_topk=_statically_active(settings.top_k),
                do_topp=_statically_active(settings.top_p),
                want_alt_prob=(not settings.greedy)
                and settings.min_alternate_prob > 0,
            )
            next_token = next_token.astype(jnp.int32)
            alt_token = alt_token.astype(jnp.int32)
        else:
            # raw (pre-filter) log P(eos) is the only Gen-B statistic
            # needing the unfiltered distribution — one logsumexp pass,
            # not a full [B, V] log_softmax materialization
            if settings.eos_token_id is not None:
                raw_eos_lp = (
                    logits[:, settings.eos_token_id]
                    - jax.scipy.special.logsumexp(logits, axis=-1)
                )
            else:
                raw_eos_lp = None

            # min-length EOS suppression on raw logits (reference
            # sampling.py:205-206)
            if settings.eos_token_id is not None:
                suppress = step < min_len
                logits = logits.at[:, settings.eos_token_id].set(
                    jnp.where(suppress, -jnp.inf,
                              logits[:, settings.eos_token_id])
                )

            if settings.repetition_penalty not in (None, 0.0, 1.0):
                logits = S.repetition_penalty(
                    logits, hist, settings.repetition_penalty,
                    tokens_valid=hist_valid
                )

            next_token, alt_token, alt_prob = filter_and_sample(
                settings, logits, top_k, top_p, typ_p, sample_key, step
            )

        # ---- completion logic -------------------------------------------------
        completed = jnp.zeros((b,), bool)
        over_length = jnp.zeros((b,), bool)
        eos_lp = jnp.zeros((b,), jnp.float32)
        if settings.eos_token_id is not None:
            eos_lp = raw_eos_lp
            completed |= next_token == settings.eos_token_id
            # the reference splices length-capped rows out BEFORE appending
            # the sampled token (sampling.py:252-268), so this step's token
            # is suppressed, not emitted
            over_length = max_len <= step
            completed |= over_length
            if settings.force_eos_log_prob < 0:
                force_eos = eos_lp > settings.force_eos_log_prob
                completed |= force_eos
                over_length = over_length | force_eos  # suppress this token too

            # alternate-token continuation (reference sampling.py:240-250)
            if settings.min_alternate_prob > 0 and not settings.greedy:
                cont = (
                    completed
                    & (max_len > step)
                    & (alt_token != settings.eos_token_id)
                    & (alt_prob > settings.min_alternate_prob)
                )
                next_token = jnp.where(cont, alt_token, next_token)
                completed = completed & ~cont

        new_stops = stops
        if settings.stop_token_id is not None:
            new_stops = stops + (next_token == settings.stop_token_id).astype(jnp.int32)
            completed |= new_stops >= settings.max_stops
        for sid in settings.stop_on_special:
            completed |= next_token == sid

        suppress = stopped | over_length
        emitted = jnp.where(suppress, settings.pad_token_id, next_token)
        # history gets real tokens only while the row is live
        hist = hist.at[:, n_prompt_tok + step].set(emitted)
        hist_valid = hist_valid.at[:, n_prompt_tok + step].set(~suppress)
        newly_live = ~suppress
        stopped = stopped | completed

        if token_mode:
            step_in = emitted[:, None]
        else:
            step_in = lm.embed_tokens(params, emitted)[:, None, :].astype(
                prompt_embeds.dtype
            )
        logits_next, cache = lm.decode_step(params, lm_cfg, step_in, cache)

        out = (emitted, newly_live, eos_lp)
        return (cache, logits_next.astype(jnp.float32), hist, hist_valid, stopped, new_stops, rng), out

    carry = (
        cache,
        last_logits,
        hist,
        hist_valid,
        jnp.zeros((b,), bool),
        jnp.zeros((b,), jnp.int32),
        rng,
    )
    carry, (tok_steps, live_steps, eos_steps) = jax.lax.scan(
        step_fn, carry, jnp.arange(n)
    )
    stopped = carry[4]

    tokens = tok_steps.T  # [B, N]
    live = live_steps.T
    eos_lp = eos_steps
    result = {
        "tokens": tokens,
        "lengths": jnp.sum(live, axis=-1).astype(jnp.int32),
        "stopped": stopped,
    }
    if settings.eos_token_id is not None:
        result["eos_logprob"] = eos_lp.T
    return result


def trim_and_decode(
    result: dict,
    tokenizer,
    strip_special: bool = True,
    skip_ids: Sequence[int] = (),
) -> list:
    """Host-side: turn a generate() result into caption strings.

    Mirrors the reference's output handling: tokens after the stop are
    dropped, and special tokens are stripped when requested
    (reference evaluate_model.py:174).
    """
    # one bundled transfer (a device fetch costs a full relay round-trip)
    tokens, lengths = jax.device_get((result["tokens"], result["lengths"]))
    special = set(getattr(tokenizer, "all_special_ids", ())) if strip_special else set()
    special |= set(skip_ids)
    texts = []
    for row, ln in zip(tokens, lengths):
        ids = [int(t) for t in row[: int(ln)] if int(t) not in special]
        texts.append(tokenizer.decode_tokens(ids))
    return texts
