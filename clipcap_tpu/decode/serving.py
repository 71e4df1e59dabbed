"""Continuous-batching serving engine (beyond-reference, production path).

The static engine (decode/engine.py) runs every batch for the full
`max_new_tokens` scan: rows that hit EOS (or their per-request length cap)
early are masked but still pay every remaining step, and a new request
can't start until the whole batch finishes. On variable-length caption
workloads that wastes (max - mean)/max of the chip. This engine keeps a
fixed batch of B *slots* hot and refills a slot with the next queued
request the moment its occupant finishes — throughput tracks the MEAN
output length instead of the max.

TPU-first design (every shape static):

- The KV cache's time axis is a RING of size prefix_len+max_new_tokens+1
  shared by all slots at a single global write index, so the per-layer
  cache write stays ONE dynamic_update_slice slab — the layout measured
  1.6-2x faster than any per-row alternative (models/gpt2.py
  _forward_cached docstring). Per-slot isolation comes from a [B, T]
  attention bias window computed from the global index and a per-row
  window start (models/gpt2.py _ring_layout).
- Refills reuse the standard fresh-prefill executable on a small [R, P]
  cache, then paste the R rows into a CONTIGUOUS block of cache rows
  (models/gpt2.py scatter_refill -> ops/ring.py paste_rows). Contiguity
  is the load-bearing choice: slots retire FIFO (a slot finishing early
  waits as a dead "zombie" until the retire pointer sweeps it), so every
  refill write is a dynamic_update_slice. The r2 design refilled
  arbitrary free slots by XLA scatter — measured ~2/3 of total serving
  wall time at slots=512 (per-index scatter lowering, 254 ms per 256-row
  refill vs ~18 ms contiguous) and an HBM-OOM relayout copy at R=256.
  Refill batches come in a small ladder of sizes (one executable each);
  a queue-tail batch pads up to the next ladder size with dead rows, and
  sub-`min_refill` batches wait a sync for a bigger block (a dispatch
  pays a fixed ~60 ms prefill floor; zombie slot-steps are cheaper).
- The host syncs once per `steps_per_sync` decode steps (a bundled fetch
  costs one ~30 ms relay round-trip regardless of payload — CLAUDE.md),
  harvesting finished slots and submitting refills between chunks.
- The serve loop is PIPELINED (depth `pipeline_depth`, default 2): chunk
  k+1 is dispatched before chunk k's results are fetched, so the per-chunk
  host round-trip (fetch + harvest loop + refill decisions) overlaps the
  device computing the next chunk instead of idling it (~30 ms of relay
  round-trip per chunk hidden behind ~100-160 ms of device decode).
  Refills consequently land one chunk later than the harvest that freed
  the slots; per-slot token streams are unaffected (each slot's stream
  depends only on its own window, and a harvested slot is a stopped
  zombie emitting nothing until its refill executes). Per-slot generation
  counters keep late-processed chunk outputs from being misread as the
  refilled occupant's.

Sampling semantics are the static engine's exactly: the per-step filter/
sample pipeline is the shared engine.filter_and_sample (same fused-Pallas
/threshold/sort selection), and completion (EOS, min/max length, stop-
token counting, special-token stops, force-EOS, alternate-token
continuation) mirrors engine.generate step for step with the scan counter
replaced by each slot's own counters (emitted tokens for the length
logic, steps-since-refill for the scan bound — they differ when the
alternate-token continuation rescues a suppressed completion). The
sentence-length penalty is the one exclusion (it needs the batch-global step counter,
which has no meaning across slots at different points in their requests).

Supported LMs: any module exposing `decode_step_ring` + `scatter_refill`:
gpt2 (absolute positions), gptj (rotary at each row's own logical
position), t5 (per-row relative-position buckets from the ring
timesteps; the per-request encoder output swaps in at refill for its
cross-attention) — each in bf16 and int8 — and the BLIP decoder via
blip_text.serving_decoder_lm (token-id mode: the per-request prefix is
the image FEATURES its prefill turns into cross-attention K/V, while a
fixed decoder prompt occupies the ring — pass prefix_len=image tokens,
prompt_len=prompt ids).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sampling as S
from .engine import (BIG, GenerationSettings, _rows, _statically_active,
                     filter_and_sample)


# module-level so the executable caches across serve() calls — a jit
# wrapper created inside serve() recompiles each (pool, r) shape on EVERY
# call, and each relay compile costs seconds (measured: the timed second
# bench pass spent more time re-compiling gathers than decoding)
@jax.jit
def _gather_rows(pool, ix):
    return jnp.take(pool, ix, axis=0)


@dataclasses.dataclass(frozen=True)
class Request:
    """One serving request: a prefix (mapper output) and optional caps.

    `prefix_embeds` is a [P, D] host array — or, when `serve()` is given a
    `prefix_pool`, an int row index into that device-resident pool (the
    production shape: the mapper's output batch stays on device; shipping
    per-request prefixes from the host would pay the ~21 MB/s relay upload
    on every refill)."""

    request_id: Any
    prefix_embeds: Any  # [P, D] array, or int index into serve()'s prefix_pool
    max_length: Optional[int] = None  # per-request new-token cap


class ServingState(NamedTuple):
    cache: Any
    last_logits: jnp.ndarray  # [B, V] f32
    start: jnp.ndarray  # [B] i32 global timestep of each row's window start
    pos: jnp.ndarray  # [B] i32 logical position of the NEXT fed token
    gen_count: jnp.ndarray  # [B] i32 tokens emitted for the current request
    age: jnp.ndarray  # [B] i32 decode steps taken since refill (engine scan bound)
    hist: jnp.ndarray  # [B, N] i32 generated-token history (rep penalty)
    hist_valid: jnp.ndarray  # [B, N] bool
    stopped: jnp.ndarray  # [B] bool (incl. the max_new_tokens cap)
    nat_stopped: jnp.ndarray  # [B] bool completed naturally (engine's `stopped`)
    stops: jnp.ndarray  # [B] i32 stop-token count
    live: jnp.ndarray  # [B] bool slot holds an unfinished request
    max_len: jnp.ndarray  # [B] i32 per-request new-token cap
    rng: jax.Array


class ServingEngine:
    """Slot-based continuous batching over a ring KV cache.

    Build once per (lm, settings, batch geometry); `serve()` any number of
    request streams. Every executable (init-prefill, K-step decode chunk,
    one refill per ladder size) has fixed shapes, so nothing recompiles
    between streams; `warmup()` precompiles them all up front.
    """

    def __init__(
        self,
        lm: Any,
        lm_cfg: Any,
        prefix_len: int,
        settings: GenerationSettings,
        prompt_len: Optional[int] = None,
        slots: int = 256,
        refill_size: Optional[int] = None,
        steps_per_sync: int = 8,
        dtype=jnp.bfloat16,
        cache_constraint=None,
        refill_sizes=None,
        min_refill: Optional[int] = None,
        pipeline_depth: int = 2,
        max_request_length: Optional[int] = None,
        chunk_sizes=None,
    ):
        if not hasattr(lm, "decode_step_ring") or not hasattr(lm, "scatter_refill"):
            raise TypeError(
                f"LM module {lm!r} does not support ring decode "
                "(needs decode_step_ring + scatter_refill; see models/gpt2.py)"
            )
        # token-id adapters (blip_text.serving_decoder_lm) feed ids instead
        # of embeddings; their prefix is still an array per request (the
        # image features their prefill consumes)
        self.token_mode = bool(getattr(lm, "takes_token_ids", False))
        if settings.desired_sentence_length > 0:
            raise ValueError(
                "the sentence-length penalty needs the batch-global step "
                "counter and is not available under continuous batching"
            )
        for name in ("top_k", "top_p", "typ_p", "min_length"):
            if np.ndim(getattr(settings, name)) != 0:
                raise ValueError(
                    f"per-row {name} vectors are batch-positional and do not "
                    "survive slot refills; ServingEngine takes scalars "
                    "(use per-request max_length on Request for length caps)"
                )
        self.lm = lm
        self.cfg = lm_cfg
        self.settings = settings
        self.prefix_len = int(prefix_len)
        # self-attention positions the prefill consumes; differs from
        # prefix_len only for token-id adapters, whose prefix rows are
        # image FEATURES while the fixed decoder prompt occupies the ring
        self.prompt_len = int(prompt_len if prompt_len is not None
                              else prefix_len)
        self.slots = int(slots)
        self.refill_size = int(refill_size or max(1, slots // 8))
        self.steps_per_sync = int(steps_per_sync)
        # in-flight decode chunks in serve() (1 = fully synchronous loop);
        # see the module docstring's pipelining note
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.dtype = dtype
        # multi-chip hook, same contract as engine.generate: applied to the
        # freshly created ring cache inside the traced init (e.g.
        # parallel/dp.DPDecodeShardings.constrain_cache — batch-sharded
        # slots decode data-parallel; slots must divide the data axis)
        self.cache_constraint = cache_constraint
        # ring capacity: the longest-lived row still needs its window-start
        # entry on the step whose write overwrites timestep index - T.
        # A row refilled at index I0 claims [I0-P, I0-1] and its step k
        # reads P+k entries, so T >= P + lifetime + 1; lifetime is bounded
        # by the scan cap n — or, when the caller DECLARES that every
        # request carries max_length <= max_request_length, by
        # min(cap+1, n). Declaring it shrinks the per-step KV stream
        # proportionally (every decode step reads the WHOLE ring — the
        # fused full read beats any narrowed read, see decode/engine.py
        # attend_len NOTE), e.g. entry_length=67 serving with declared
        # caps <= 30 streams ring 72 instead of 108 per step (~33% less,
        # measured 418.5 -> 481.2 c/s at 512 slots). serve() rejects
        # requests whose effective cap exceeds the declaration.
        n = settings.max_new_tokens
        self.max_request_length = (
            None if max_request_length is None else int(max_request_length))
        if (self.max_request_length is not None
                and self.max_request_length < n
                and settings.eos_token_id is None):
            # caps bind through the engine-parity completion logic, which
            # only evaluates when eos handling is on — without it rows run
            # to the scan cap and outlive the declaration-sized ring
            raise ValueError(
                "max_request_length < max_new_tokens requires "
                "settings.eos_token_id (length caps bind through the "
                "engine's eos/completion logic)"
            )
        lifetime = (n if self.max_request_length is None
                    else min(n, self.max_request_length + 1))
        self.ring_len = self.prompt_len + lifetime + 1

        # OPT-IN graduated decode-chunk lengths. When a ladder is passed,
        # the serve loop dispatches the largest chunk that does not cross
        # the next slot block's guaranteed-retirement boundary (host
        # arithmetic — see serve), so refills land the moment a block is
        # device-guaranteed stopped. One executable per length, compiled
        # on first use; rng streams are split once per STEP from the
        # carried state rng, so chunk boundaries never change a trajectory
        # — only refill timing does (the documented sampled-stream caveat).
        #
        # The DEFAULT stays one fixed steps_per_sync chunk: cap-aligned
        # fine chunks were MEASURED WORSE on this stack (r5, GPT2-XL int8,
        # 512 slots, 2048 reqs: 293 c/s vs 414 fixed-8). Two fixed costs
        # dominate any zombie-step savings: (a) each dispatch pays ~75-100
        # ms of host/relay overhead (1-core arg traversal + round-trip),
        # and the min-remaining boundary collapses to 1-step chunks on a
        # staggered-block workload (34 of 45 dispatches); (b) fine syncs
        # retire slots in small runs, so refills shrink from 256-row
        # blocks to 64-row blocks and pay 4x the fixed prefill floors
        # (24 x 223 ms vs 8 big refills). Occupancy under fixed-8 chunks
        # is already ~0.8 (bench serving sched stats) — at most ~20%
        # zombie steps were recoverable, far less than the overheads.
        if chunk_sizes is not None:
            self._chunk_sizes = sorted({int(k) for k in chunk_sizes},
                                       reverse=True)
            if self._chunk_sizes[0] > self.steps_per_sync:
                raise ValueError("chunk sizes cannot exceed steps_per_sync")
        else:
            self._chunk_sizes = [self.steps_per_sync]
        self._init_fn = jax.jit(self._init)
        # state MUST be donated: chunk/refill are dispatched repeatedly from
        # the host loop, and without in/out aliasing every call holds TWO
        # copies of the ring state (the KV cache alone is ~5.7 GB at
        # slots=512 GPT2-XL int8) — that double-buffer is what
        # RESOURCE_EXHAUSTEDed the 16 GB chip. Callers rebind `state` at
        # every call site, so the donated input is never reused.
        self._chunk_fns = {}
        self._pinned_fmts = None
        # per-serve() scheduling/phase counters (read by bench.py)
        self.last_stats = None
        # graduated refill sizes (default powers of two up to refill_size).
        # Every scatter TARGET slot must be distinct (duplicate scatter
        # indices have undefined write order), but refill ROWS may be
        # padding: pad rows target distinct FREE slots and land dead
        # (live=False — see _refill), so one executable covers any partial
        # batch up to its size. A sparser explicit ladder trades padded
        # prefill rows for fewer compiled prefill sizes; it must contain 1
        # so a single free slot can always be filled.
        if refill_sizes is not None:
            self._refill_sizes = sorted(int(k) for k in refill_sizes)
            if not self._refill_sizes or self._refill_sizes[0] != 1:
                raise ValueError("refill_sizes must include 1")
            if self._refill_sizes[-1] > self.slots:
                raise ValueError("refill sizes cannot exceed the slot count")
        else:
            self._refill_sizes = []
            k = 1
            while k <= self.refill_size:
                self._refill_sizes.append(k)
                k *= 2
        # below this many queued-and-retirable requests, wait a sync for a
        # bigger block instead of dispatching: every refill pays a fixed
        # prefill floor (~60 ms on the v5e), which dwarfs the zombie
        # slot-steps of waiting. Queue tails and wrap-boundary fills are
        # exempt (see serve()).
        self.min_refill = int(min_refill) if min_refill is not None else max(
            1, min(self._refill_sizes[-1] // 4, self.slots))
        # r is static: one executable per refill size, compiled on first use
        # (state donated for the same aliasing reason as the chunk execs)
        self._refill_jit = jax.jit(self._refill, static_argnums=0,
                                   donate_argnums=(2,))
        # on TPU the executables are re-pinned to XLA's preferred state
        # layout on first use — see _pin_layouts
        self._layouts_pinned = False

    # ---- jitted bodies -----------------------------------------------------

    def _init(self, params, prefixes, live, max_len, rng):
        """Prefill the first B requests into a fresh ring cache."""
        b = self.slots
        n = self.settings.max_new_tokens
        cache = self.lm.init_cache(
            self.cfg, batch=b, max_len=self.ring_len, dtype=self.dtype
        )
        if self.cache_constraint is not None:
            cache = self.cache_constraint(cache)
        logits, cache = self.lm.prefill(params, self.cfg, prefixes, cache)
        return ServingState(
            cache=cache,
            last_logits=logits[:, -1].astype(jnp.float32),
            start=jnp.zeros((b,), jnp.int32),
            pos=jnp.full((b,), self.prompt_len, jnp.int32),
            gen_count=jnp.zeros((b,), jnp.int32),
            age=jnp.zeros((b,), jnp.int32),
            hist=jnp.zeros((b, n), jnp.int32),
            hist_valid=jnp.zeros((b, n), bool),
            stopped=~live,
            nat_stopped=jnp.zeros((b,), bool),
            stops=jnp.zeros((b,), jnp.int32),
            live=live,
            max_len=max_len,
            rng=rng,
        )

    def _chunk(self, params, state: ServingState, n_steps: int = None):
        """n_steps (<= steps_per_sync) decode steps; engine.generate
        semantics per slot. One executable per length (see ctor
        chunk_sizes note)."""
        if n_steps is None:
            n_steps = self.steps_per_sync
        settings = self.settings
        b = self.slots
        n = settings.max_new_tokens
        min_len = _rows(settings.min_length, b, jnp.int32)
        top_k = _rows(settings.top_k, b)
        top_p = _rows(settings.top_p, b)
        typ_p = _rows(settings.typ_p, b)
        row_ix = jnp.arange(b)

        # "fused_step": the whole pre-filter pipeline in the Pallas sampler
        # kernel — same opt-in + fallback rules as engine.generate (the
        # ctor already guarantees scalar settings here)
        pen = settings.repetition_penalty
        pen = 1.0 if pen in (None, 0.0) else pen
        use_fused_step = (
            settings.filter_method == "fused_step"
            and not settings.greedy
            and not _statically_active(settings.typ_p)
            and isinstance(pen, (int, float))
            and isinstance(settings.temperature, (int, float))
            and jax.default_backend() == "tpu"
        )

        def step_fn(carry, _):
            st = carry
            rng, sample_key = jax.random.split(st.rng)
            logits = st.last_logits

            if use_fused_step:
                from ..ops.pallas.fused_sampler import fused_step_sample

                appears = None
                if pen != 1.0:
                    appears = S.token_occurrence_mask(
                        st.hist, logits.shape[1], tokens_valid=st.hist_valid
                    )
                seed = jax.random.randint(
                    sample_key, (), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
                t = settings.temperature
                next_token, alt_token, alt_prob, raw_eos_lp = fused_step_sample(
                    logits, top_k, top_p, seed,
                    appears=appears, penalty=float(pen),
                    temperature=float(t if t > 0 else 1.0),
                    eos_token_id=settings.eos_token_id,
                    suppress_eos=(
                        (st.age < min_len)
                        if settings.eos_token_id is not None else None
                    ),
                    want_eos_lp=settings.eos_token_id is not None,
                    do_topk=_statically_active(settings.top_k),
                    do_topp=_statically_active(settings.top_p),
                    want_alt_prob=(not settings.greedy)
                    and settings.min_alternate_prob > 0,
                )
                next_token = next_token.astype(jnp.int32)
                alt_token = alt_token.astype(jnp.int32)
            else:
                if settings.eos_token_id is not None:
                    raw_eos_lp = (
                        logits[:, settings.eos_token_id]
                        - jax.scipy.special.logsumexp(logits, axis=-1)
                    )
                    # the engine's min-length gate compares its SCAN counter
                    # (decode steps), not emitted tokens — the two differ
                    # once an alternate-rescued row runs with suppressed
                    # emission
                    suppress_eos = st.age < min_len
                    logits = logits.at[:, settings.eos_token_id].set(
                        jnp.where(
                            suppress_eos, -jnp.inf,
                            logits[:, settings.eos_token_id],
                        )
                    )

                if settings.repetition_penalty not in (None, 0.0, 1.0):
                    logits = S.repetition_penalty(
                        logits, st.hist, settings.repetition_penalty,
                        tokens_valid=st.hist_valid,
                    )

                next_token, alt_token, alt_prob = filter_and_sample(
                    settings, logits, top_k, top_p, typ_p, sample_key, step=0
                )

            # completion — engine.generate's logic with the scan counter
            # replaced by the slot's own gen_count
            completed = jnp.zeros((b,), bool)
            over_length = jnp.zeros((b,), bool)
            if settings.eos_token_id is not None:
                completed |= next_token == settings.eos_token_id
                # engine parity: length comparisons use its scan counter
                # == this slot's age (not emitted tokens; see min_len note)
                over_length = st.max_len <= st.age
                completed |= over_length
                if settings.force_eos_log_prob < 0:
                    force_eos = raw_eos_lp > settings.force_eos_log_prob
                    completed |= force_eos
                    over_length = over_length | force_eos
                if settings.min_alternate_prob > 0 and not settings.greedy:
                    cont = (
                        completed
                        & (st.max_len > st.age)
                        & (alt_token != settings.eos_token_id)
                        & (alt_prob > settings.min_alternate_prob)
                    )
                    next_token = jnp.where(cont, alt_token, next_token)
                    completed = completed & ~cont

            new_stops = st.stops
            if settings.stop_token_id is not None:
                new_stops = st.stops + (
                    next_token == settings.stop_token_id
                ).astype(jnp.int32)
                completed |= new_stops >= settings.max_stops
            for sid in settings.stop_on_special:
                completed |= next_token == sid

            suppress = st.stopped | ~st.live | over_length
            emitted = jnp.where(suppress, settings.pad_token_id, next_token)
            emit_valid = ~suppress

            hpos = jnp.minimum(st.gen_count, n - 1)
            hist = st.hist.at[row_ix, hpos].set(
                jnp.where(emit_valid, emitted, st.hist[row_ix, hpos])
            )
            hist_valid = st.hist_valid.at[row_ix, hpos].set(
                st.hist_valid[row_ix, hpos] | emit_valid
            )
            gen_count = st.gen_count + emit_valid.astype(jnp.int32)
            # the engine's lifetime bound is its SCAN length — n steps, not
            # n emitted tokens. The two differ when a completion is rescued
            # by the alternate-token continuation after a force-EOS
            # suppression: the row continues without emitting. Bounding by
            # gen_count alone would let such a row outlive its ring window
            # (> prompt+n steps) and start attending overwritten entries.
            age = st.age + (st.live & ~st.stopped).astype(jnp.int32)
            nat_stopped = st.nat_stopped | (completed & ~st.stopped)
            stopped = st.stopped | completed | (age >= n)

            if self.token_mode:
                step_in = emitted[:, None]
            else:
                step_in = self.lm.embed_tokens(params, emitted)[
                    :, None, :
                ].astype(self.dtype)
            logits_next, cache = self.lm.decode_step_ring(
                params, self.cfg, step_in, st.cache, st.pos, st.start
            )
            # dead slots keep stepping until refilled; clamp their logical
            # position inside the table for absolute-position models
            # (relative-position models — t5 — have no n_positions)
            limit = (getattr(self.cfg, "n_positions", None)
                     or getattr(self.cfg, "max_position_embeddings", None))
            pos = st.pos + 1 if limit is None else jnp.minimum(st.pos + 1,
                                                               limit - 1)

            new_state = ServingState(
                cache=cache,
                last_logits=logits_next.astype(jnp.float32),
                start=st.start,
                pos=pos,
                gen_count=gen_count,
                age=age,
                hist=hist,
                hist_valid=hist_valid,
                stopped=stopped,
                nat_stopped=nat_stopped,
                stops=new_stops,
                live=st.live,
                max_len=st.max_len,
                rng=rng,
            )
            return new_state, (emitted, emit_valid)

        state, (emitted, emit_valid) = jax.lax.scan(
            step_fn, state, None, length=n_steps
        )
        # the stop flags are ALSO returned as uint8 COPIES: serve()'s
        # pipelined loop holds them across the next chunk dispatch, which
        # donates the whole state pytree — a held reference into the
        # donated state would be invalidated. The dtype change forces XLA
        # to materialize distinct (tiny, [B]) buffers.
        return (state, emitted, emit_valid,
                state.stopped.astype(jnp.uint8),
                state.nat_stopped.astype(jnp.uint8))

    def _refill(self, r: int, params, state: ServingState, prefixes, q,
                new_max_len, n_real):
        """Prefill r new requests into the CONTIGUOUS slot block [q, q+r).

        Contiguity is load-bearing: every per-slot write here (cache rows
        and state vectors) lowers to a dynamic_update_slice. Arbitrary
        free-slot scatters were the dominant serving cost and OOM at
        useful block sizes — see ops/ring.py paste_rows. The host keeps
        blocks contiguous by retiring slots FIFO (see serve()).

        `n_real` (traced) marks how many leading rows are real requests;
        the tail rows are PADDING that lets one big executable service a
        partial batch. Padding rows land dead: live=False, stopped=True,
        so they emit nothing. One traced scalar instead of per-count
        executables keeps the compile count at one per ladder size."""
        small = self.lm.init_cache(
            self.cfg, batch=r, max_len=self.prompt_len, dtype=self.dtype
        )
        logits, small = self.lm.prefill(params, self.cfg, prefixes, small)
        cache = self.lm.scatter_refill(state.cache, small, q)
        idx = state.cache.index
        real = jnp.arange(r) < n_real

        def put(vec, new):
            dst = (q,) + (0,) * (vec.ndim - 1)
            return jax.lax.dynamic_update_slice(
                vec, new.astype(vec.dtype), dst)

        return ServingState(
            cache=cache,
            last_logits=put(state.last_logits, logits[:, -1].astype(jnp.float32)),
            start=put(state.start, jnp.full((r,), idx - self.prompt_len)),
            pos=put(state.pos, jnp.full((r,), self.prompt_len, jnp.int32)),
            gen_count=put(state.gen_count, jnp.zeros((r,), jnp.int32)),
            age=put(state.age, jnp.zeros((r,), jnp.int32)),
            hist=put(state.hist, jnp.zeros((r,) + state.hist.shape[1:],
                                           state.hist.dtype)),
            hist_valid=put(state.hist_valid,
                           jnp.zeros((r,) + state.hist_valid.shape[1:], bool)),
            stopped=put(state.stopped, ~real),
            nat_stopped=put(state.nat_stopped, jnp.zeros((r,), bool)),
            stops=put(state.stops, jnp.zeros((r,), jnp.int32)),
            live=put(state.live, real),
            max_len=put(state.max_len, new_max_len),
            rng=state.rng,
        )

    def _pin_layouts(self, params, prefixes):
        """Pin every executable to XLA's preferred ServingState layout.

        With default (row-major) boundary layouts, XLA prefers the ring
        cache BATCH-MINOR inside the decode chunk (the per-step K/V slab
        write at one timestep is then one contiguous block) and inserts
        full relayout copies of the donated cache at the chunk's entry and
        exit — pure overhead at ring=73 and a compile-time HBM OOM at
        ring=108 (2 x 3.96 GB temps; entry_length=67 serving would not
        compile at slots=512 at all). Compiling the chunk with AUTO
        layouts instead (temp 0.19 GB, measured) and pinning init/refill
        to the chunk's chosen formats keeps the state in that layout
        across the whole serve loop — no boundary copies anywhere.

        TPU-only (single-device): the CPU path (tests, the multichip
        dryrun with cache_constraint shardings) keeps plain jit.
        """
        if self._layouts_pinned:
            return
        self._layouts_pinned = True
        if jax.default_backend() != "tpu" or self.cache_constraint is not None:
            return
        from jax.experimental.layout import Format, Layout

        def aval(x):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)

        params_aval = jax.tree_util.tree_map(aval, params)
        b = self.slots
        pre_aval = aval(prefixes)
        live_a = jax.ShapeDtypeStruct((b,), jnp.bool_)
        caps_a = jax.ShapeDtypeStruct((b,), jnp.int32)
        rng_a = jax.ShapeDtypeStruct((2,), jnp.uint32)
        state_aval = jax.eval_shape(
            self._init, params_aval, pre_aval, live_a, caps_a, rng_a)

        import functools

        auto = Format(Layout.AUTO)
        state_auto = jax.tree_util.tree_map(lambda _: auto, state_aval)
        n_max = self._chunk_sizes[0]
        chunk_body = functools.partial(self._chunk, n_steps=n_max)
        out_aval = jax.eval_shape(chunk_body, params_aval, state_aval)
        out_auto = jax.tree_util.tree_map(lambda _: auto, out_aval)
        chunk_c = jax.jit(
            chunk_body, donate_argnums=(1,),
            in_shardings=(None, state_auto), out_shardings=out_auto,
        ).lower(params_aval, state_aval).compile()
        # chunk in/out state formats are identical (verified on-chip), so
        # the pinned state round-trips the loop without conversion; the
        # shorter chunk-ladder executables are pinned to the same formats
        # when first dispatched (_chunk_exec)
        fmts = chunk_c.input_formats[0][1]
        self._pinned_fmts = fmts
        self._chunk_fns = {n_max: chunk_c}
        self._init_fn = jax.jit(self._init, out_shardings=fmts)
        self._refill_jit = jax.jit(
            self._refill, static_argnums=0, donate_argnums=(2,),
            in_shardings=(None, fmts, None, None, None, None),
            out_shardings=fmts,
        )

    def _chunk_exec(self, n_steps: int):
        """The n_steps-long decode-chunk executable, compiled on first use
        and pinned to the serve loop's state layout (see _pin_layouts)."""
        import functools

        fn = self._chunk_fns.get(n_steps)
        if fn is None:
            body = functools.partial(self._chunk, n_steps=n_steps)
            if self._pinned_fmts is not None:
                fn = jax.jit(
                    body, donate_argnums=(1,),
                    in_shardings=(None, self._pinned_fmts),
                    out_shardings=(self._pinned_fmts,
                                   None, None, None, None),
                )
            else:
                fn = jax.jit(body, donate_argnums=(1,))
            self._chunk_fns[n_steps] = fn
        return fn

    # ---- host loop ---------------------------------------------------------

    def warmup(self, params, embed_dim: Optional[int] = None):
        """Compile every executable (init-prefill, decode chunk, all refill
        sizes) against dummy data so no request stream pays a compile.
        embed_dim defaults to the LM embedding width; pass it explicitly
        for token-id adapters whose prefix rows are encoder features of a
        different width."""
        if embed_dim is None:
            embed_dim = self.lm.embedding_size(params)
        b = self.slots
        zeros = jnp.zeros((b, self.prefix_len, embed_dim), self.dtype)
        live = jnp.ones((b,), bool)
        caps = jnp.full((b,), self.settings.max_new_tokens, jnp.int32)
        self._pin_layouts(params, zeros)
        state = self._init_fn(params, zeros, live, caps, jax.random.PRNGKey(0))
        for n in self._chunk_sizes:
            state, _, _, _, _ = self._chunk_exec(n)(params, state)
        for r in self._refill_sizes:
            state = self._refill_jit(
                r, params, state, zeros[:r],
                jnp.asarray(0, jnp.int32), caps[:r],
                jnp.asarray(r, jnp.int32),
            )
        jax.block_until_ready(state.stopped)
        return self

    def serve(self, requests: Iterable[Request], params, rng=None,
              prefix_pool=None, on_result=None, admission: str = "fifo",
              admission_lookahead: Optional[int] = None) -> dict:
        """Run every request to completion; returns {request_id: result}.

        result = {"tokens": [int], "length": int, "stopped": bool,
        "latency_s": float} with the same token semantics as
        engine.generate (the stopping token is included; suppressed
        over-length tokens are not; `stopped` means the request completed
        naturally rather than hitting the max_new_tokens scan cap).
        latency_s is wall time from slot assignment to result
        finalization — the serving-side p50/p99 metric (queue wait before
        assignment is the caller's to measure). Two lags inflate it
        relative to pure device time: the harvest of a stopping chunk
        trails its dispatch by up to `pipeline_depth` chunks, and
        t_assign is stamped at host refill DISPATCH (the device executes
        it up to depth-1 chunks later) — latencies are therefore not
        comparable across pipeline_depth values; compare at depth=1.

        `prefix_pool`: optional [n, P, D] DEVICE array; each request's
        prefix_embeds is then an int row index and prefix batches are
        gathered on device (no per-refill host upload).

        `on_result`: optional callback (request_id, result) fired the
        moment each request is harvested — results stream out in
        completion order instead of waiting for the whole batch.

        `requests` may be any iterable, including a lazy generator: it is
        consumed FIFO and pulled only as slots free up, so an online
        producer can keep generating while earlier requests decode.

        `admission`: "fifo" assigns requests to slots in arrival order.
        "length" sorts the pulled look-ahead window by effective length
        cap (ascending; arrival order within equal caps), so FIFO-retired
        refill blocks hold near-equal caps and retire together instead of
        idling behind one straggler — worth ~2x utilization on
        caption-length workloads (see bench serving detail). Token
        streams per request are unchanged under greedy decoding (each
        slot's stream depends only on its own window); sampled streams
        draw different step rngs than fifo order would (same
        distribution — the same caveat as pipeline_depth below).

        Scheduling is EAGERLY RETIRED: `max_length` is known at
        admission, and a slot is device-GUARANTEED stopped once
        min(cap, max_new_tokens) + 1 decode steps have been dispatched
        after its (re)fill (over_length fires at age >= cap; the scan
        bound at age >= n; both before any later dispatched step runs —
        device program order). Refills therefore never wait for the
        harvest round-trip: a slot whose guarantee has elapsed is
        refilled immediately, and its not-yet-harvested generation moves
        to a pending map keyed (slot, generation) whose tokens drain from
        the still-in-flight chunks. Natural-EOS stops earlier than the
        cap are still discovered (and retired) at harvest, whichever
        comes first.

        Sampled (non-greedy) token streams are NOT bit-stable across
        pipeline_depth or admission policy once refills occur: refill
        timing/order changes which global per-step rng split each
        request's steps consume (same distribution, different rng
        alignment). Greedy streams are invariant — only greedy
        equivalence is contractual (tests/test_serving.py).
        """
        settings = self.settings
        b, p = self.slots, self.prefix_len
        req_iter = iter(requests)
        buffered: list = []  # look-ahead pulled from req_iter
        if admission not in ("fifo", "length"):
            raise ValueError(f"unknown admission policy {admission!r}")
        lookahead = int(admission_lookahead) if admission_lookahead else (
            2 * b if admission == "length" else 0)
        arrival = [0]  # stable tiebreak for the length sort

        def pull(n: int) -> int:
            """Ensure up to n requests are buffered; returns len(buffered).

            Under admission="length" the buffer is kept sorted by
            effective cap (stable: arrival order within equal caps); the
            producer is still consumed strictly FIFO."""
            n = max(n, lookahead)
            grew = False
            while len(buffered) < n:
                try:
                    buffered.append((arrival[0], next(req_iter)))
                    arrival[0] += 1
                    grew = True
                except StopIteration:
                    break
            if grew and admission == "length":
                buffered.sort(key=lambda ar: (eff_cap(ar[1]), ar[0]))
            return len(buffered)

        def pop_next() -> Request:
            return buffered.pop(0)[1]

        if rng is None:
            rng = jax.random.PRNGKey(0)

        if prefix_pool is not None:
            pool = jnp.asarray(prefix_pool, self.dtype)

            def stack_prefixes(reqs, pad_to):
                ix = [int(r.prefix_embeds) if r is not None else 0 for r in reqs]
                ix += [0] * (pad_to - len(ix))
                return _gather_rows(pool, jnp.asarray(ix, jnp.int32))
        else:
            def stack_prefixes(reqs, pad_to):
                d = next(
                    np.asarray(r.prefix_embeds).shape[-1]
                    for r in reqs if r is not None
                )
                zeros = np.zeros((p, d), np.float32)
                rows = [np.asarray(r.prefix_embeds, np.float32)
                        if r is not None else zeros for r in reqs]
                rows += [zeros] * (pad_to - len(rows))
                return jnp.asarray(np.stack(rows), self.dtype)

        default_cap = settings.max_length
        if not isinstance(default_cap, (int, np.integer)):
            default_cap = BIG

        def req_cap(req):
            cap = (req.max_length if req.max_length is not None
                   else default_cap)
            if (self.max_request_length is not None
                    and min(cap, settings.max_new_tokens)
                    > self.max_request_length):
                raise ValueError(
                    f"request {req.request_id!r} has effective cap {cap} > "
                    f"the engine's declared max_request_length "
                    f"{self.max_request_length} (its ring is sized for the "
                    "declaration; route longer requests to an engine "
                    "without one)"
                )
            return cap

        n_steps_cap = settings.max_new_tokens

        def eff_cap(req):
            """Decode steps after which the slot is device-guaranteed
            stopped: min(cap, scan bound) + 1 (the step ENTERING at
            age == cap flips stopped; age after k steps is k)."""
            return min(req_cap(req), n_steps_cap - 1) + 1

        # ---- initial fill
        pull(b)
        first = [pop_next() if buffered else None for _ in range(b)]
        if all(req is None for req in first):
            return {}
        live = np.array([req is not None for req in first])
        caps = np.array(
            [req_cap(req) if req is not None else 0 for req in first],
            np.int32,
        )
        first_prefixes = stack_prefixes(first, b)
        self._pin_layouts(params, first_prefixes)
        state = self._init_fn(
            params, first_prefixes, jnp.asarray(live),
            jnp.asarray(caps), rng,
        )

        slot_req = list(first)  # per-slot current Request (None = free)
        harvested = [False] * b  # result recorded; slot awaits FIFO retire
        # per-slot refill generation: chunk outputs are interpreted against
        # the generation active when that chunk was DISPATCHED — with the
        # pipelined loop a slot can be harvested and refilled while an
        # older chunk is still in flight, and that chunk's zombie
        # stopped=True output must not be misread as the NEW occupant
        # finishing with zero tokens
        slot_gen = [0] * b
        bufs = [[] for _ in range(b)]
        t_assign = [time.time()] * b
        # eager-retirement bookkeeping: decode steps dispatched in total,
        # and the count at each slot's last (re)fill. The slot is
        # device-guaranteed stopped once steps_dispatched - refill_step
        # >= guarantee (eff_cap) — every step past the guarantee was
        # dispatched AFTER the stopping step in device program order.
        steps_dispatched = 0
        refill_step = [0] * b
        guarantee = [eff_cap(req) if req is not None else 0 for req in first]
        # generations eagerly retired (refilled over) before their
        # stopping chunk was harvested: (slot, gen) -> in-progress record.
        # Their stopping chunk is always already in `inflight` when they
        # move here (eligibility requires it dispatched), so draining
        # inflight finalizes every pending record.
        pending: dict = {}
        results = {}
        # FIFO retire pointer: refills target the contiguous run of
        # retirable slots starting here (every device-side slot write is
        # then a dynamic_update_slice — see _refill). A slot that finishes
        # early waits as a retired "zombie" (stopped on device, emits
        # nothing) until the pointer sweeps past it; the device-time cost
        # of that wait is far below what arbitrary-slot scatter refills
        # paid (measured, see ops/ring.py paste_rows).
        fifo_q = 0

        def retirable(s):
            return (slot_req[s] is None or harvested[s]
                    or steps_dispatched - refill_step[s] >= guarantee[s])

        def device_live():
            """Some slot may still be emitting (host knowledge)."""
            return any(
                req is not None and not harvested[s]
                and steps_dispatched - refill_step[s] < guarantee[s]
                for s, req in enumerate(slot_req)
            )

        def unfinished():
            return pending or any(
                req is not None and not harvested[s]
                for s, req in enumerate(slot_req)
            )

        # ---- pipelined chunk loop: up to pipeline_depth chunks in flight.
        # Dispatch is async (device starts immediately); the blocking fetch
        # of chunk k's outputs then overlaps chunk k+1's device time
        # instead of idling the chip for the relay round-trip + host
        # harvest work. Refill timing is host-computed (eager retirement,
        # see serve docstring), so the harvest round-trip is entirely off
        # the scheduling critical path — only natural-EOS-earlier-than-cap
        # retirement waits on a fetch.
        inflight: list = []  # (em, ev, stopped_u8, nat_u8, gen snapshot)
        # phase/scheduling counters for this serve() (self.last_stats):
        # live_slot_steps counts a slot live if the HOST believes its
        # occupant may still be emitting at dispatch time (an upper bound —
        # natural-EOS stops inside the chunk still count), so occupancy =
        # live/total slot-steps bounds real utilization from above.
        stats = {
            "chunks": {}, "refills": {}, "refill_pad_rows": 0,
            "steps": 0, "live_slot_steps": 0, "slot_steps": 0,
            "harvest_wait_s": 0.0, "dispatch_s": 0.0, "refill_dispatch_s": 0.0,
        }
        t_serve0 = time.perf_counter()

        def pick_chunk_len() -> int:
            """Largest ladder chunk not crossing the next slot block's
            guaranteed-retirement boundary, so refills land the step a
            block retires instead of up to a chunk later (cap-aligned
            chunks; admission="length" makes live blocks near-uniform in
            cap, so one boundary covers whole blocks)."""
            nxt = None
            for s in range(b):
                if slot_req[s] is not None and not harvested[s]:
                    rem = refill_step[s] + guarantee[s] - steps_dispatched
                    if rem > 0 and (nxt is None or rem < nxt):
                        nxt = rem
            if nxt is None:
                return self._chunk_sizes[0]
            for k in self._chunk_sizes:  # descending
                if k <= nxt:
                    return k
            return self._chunk_sizes[-1]

        def dispatch_chunk():
            nonlocal state, steps_dispatched
            n = pick_chunk_len()
            live_now = sum(
                1 for s in range(b)
                if slot_req[s] is not None and not harvested[s]
                and steps_dispatched - refill_step[s] < guarantee[s]
            )
            t0 = time.perf_counter()
            state, em, ev, st_u8, nat_u8 = self._chunk_exec(n)(params, state)
            stats["dispatch_s"] += time.perf_counter() - t0
            inflight.append((em, ev, st_u8, nat_u8, list(slot_gen)))
            steps_dispatched += n
            stats["chunks"][n] = stats["chunks"].get(n, 0) + 1
            stats["steps"] += n
            stats["live_slot_steps"] += live_now * n
            stats["slot_steps"] += b * n

        def finalize(req, buf, t0, nat):
            results[req.request_id] = res = {
                "tokens": buf,
                "length": len(buf),
                "stopped": bool(nat),
                "latency_s": time.time() - t0,
            }
            if on_result is not None:
                on_result(req.request_id, res)

        def harvest_oldest():
            em, ev, st_u8, nat_u8, sgen = inflight.pop(0)
            # ONE bundled fetch per chunk (each sync costs a full relay
            # round-trip regardless of payload)
            t0 = time.perf_counter()
            em, ev, stopped, nat = jax.device_get((em, ev, st_u8, nat_u8))
            stats["harvest_wait_s"] += time.perf_counter() - t0
            for slot in range(b):
                g = sgen[slot]
                if g == slot_gen[slot]:
                    req = slot_req[slot]
                    if req is None or harvested[slot]:
                        continue
                    bufs[slot].extend(int(t) for t in em[ev[:, slot], slot])
                    if stopped[slot]:
                        finalize(req, bufs[slot], t_assign[slot], nat[slot])
                        harvested[slot] = True
                        bufs[slot] = []
                elif (slot, g) in pending:
                    # an eagerly retired generation: its slot was refilled
                    # while this chunk was in flight
                    req, buf, t0 = pending[(slot, g)]
                    buf.extend(int(t) for t in em[ev[:, slot], slot])
                    if stopped[slot]:
                        finalize(req, buf, t0, nat[slot])
                        del pending[(slot, g)]

        def do_refills():
            nonlocal state, fifo_q
            while pull(self._refill_sizes[-1]):
                # contiguous retirable run at the pointer, split at the
                # slot-ring wrap boundary (blocks must not wrap: the
                # device write is a dynamic_update_slice)
                run = 0
                while run < b and retirable((fifo_q + run) % b):
                    run += 1
                avail = min(run, b - fifo_q)
                n = min(avail, len(buffered))
                if n == 0:
                    break
                fits = [k for k in self._refill_sizes if k <= avail]
                tail = len(buffered) == n  # queue empties after this batch
                if (n < self.min_refill and not tail and avail == run
                        and device_live()):
                    # wait for a bigger block: a small dispatch costs ~a
                    # fixed prefill floor; zombie slot-steps are cheaper.
                    # Exempt: wrap-boundary fills (avail < run splits a
                    # big run), queue tails, and an otherwise-idle device
                    # (nothing possibly emitting -> waiting would starve).
                    break
                cover = [k for k in fits if k >= n]
                if tail and cover:
                    r = min(cover)  # pad the queue tail up a ladder size
                else:
                    r = max(k for k in fits if k <= n)  # no mid-stream pad
                n_real = min(r, n)
                batch = [pop_next() for _ in range(n_real)]
                caps = np.array(
                    [req_cap(req) for req in batch] + [0] * (r - n_real),
                    np.int32,
                )
                now = time.time()
                for i in range(r):
                    s = fifo_q + i
                    req = batch[i] if i < n_real else None
                    old = slot_req[s]
                    if old is not None and not harvested[s]:
                        # eagerly retired: stopping chunk still in flight
                        pending[(s, slot_gen[s])] = (old, bufs[s],
                                                     t_assign[s])
                    slot_req[s] = req
                    harvested[s] = False
                    slot_gen[s] += 1
                    bufs[s] = []
                    t_assign[s] = now
                    refill_step[s] = steps_dispatched
                    guarantee[s] = eff_cap(req) if req is not None else 0
                t0 = time.perf_counter()
                state = self._refill_jit(
                    r, params, state, stack_prefixes(batch, r),
                    jnp.asarray(fifo_q, jnp.int32), jnp.asarray(caps),
                    jnp.asarray(n_real, jnp.int32),
                )
                stats["refill_dispatch_s"] += time.perf_counter() - t0
                stats["refills"][r] = stats["refills"].get(r, 0) + 1
                stats["refill_pad_rows"] += r - n_real
                fifo_q = (fifo_q + r) % b

        # Progress argument: each iteration either dispatches work,
        # harvests a chunk (strictly draining inflight), or exits. When
        # the device may still be emitting, the pipeline is topped up;
        # refills are dispatched the moment their block's guarantee
        # elapses (host arithmetic — no fetch on the scheduling path).
        while True:
            do_refills()
            while device_live() and len(inflight) < self.pipeline_depth:
                dispatch_chunk()
            if inflight:
                harvest_oldest()
            elif not unfinished() and not pull(1):
                break
        stats["wall_s"] = time.perf_counter() - t_serve0
        stats["occupancy"] = (
            round(stats["live_slot_steps"] / stats["slot_steps"], 4)
            if stats["slot_steps"] else None)
        self.last_stats = stats
        return results
