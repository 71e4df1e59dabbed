"""Fused per-step logit filter + categorical sampler (Pallas, TPU).

One decode step's sampling tail — top-k/top-p threshold filtering
(reference sampling.py:114-162 semantics, the sort-free bisection of
ops/sampling.top_k_top_p_filter_threshold) followed by Gumbel top-2
categorical sampling (torch.multinomial(replacement=False) semantics,
reference sampling.py:225-250) — as ONE Pallas kernel.

Why: the XLA threshold filter re-reads the [B, V] f32 logits from HBM on
every bisection iteration (~6 ms at [512, 50257] on v5e), and the
separate gumbel + top-2 + softmax passes add ~1.5 ms more. Here each
row-tile of logits is loaded into VMEM ONCE; the entire bisection, the
Gumbel perturbation (on-core PRNG) and the top-2 selection run on
VMEM-resident data, and only per-row token ids / probabilities go back
to HBM. HBM traffic drops from ~40 passes to ~1.

Semantics vs the XLA path:
- the FILTER math is the same bisection arithmetic in f32 (same iteration
  count, same brackets), so the kept set matches
  top_k_top_p_filter_threshold up to ties at the bisection epsilon
  (measure-zero for real logits; see that function's docstring);
- the SAMPLING stream differs: jax.random.gumbel (threefry) is replaced
  by the TPU core PRNG (pltpu.prng_random_bits). Identical distribution,
  different draws — trajectories are not bit-comparable with the XLA
  sampler (decode/engine.py documents when each is used).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")

# bisection iterations: beyond ~28 the bracket (width <= 100 for top-p,
# <= logit range for top-k) is narrower than one f32 ulp at caption-scale
# logit magnitudes, so extra iterations refine below representable
# differences. The XLA reference uses 40; 28 converges identically on
# f32 data (tests compare the kept sets).
DEFAULT_ITERS = 28


def _bisect(pred, lo, hi, iters):
    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ok = pred(mid)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo, hi


def _first_index_of_max(values, iota, vocab):
    """Row-wise (argmax, max) with first-index tie semantics, no argmax
    primitive: max-reduce, then min-reduce the matching lane indices."""
    m = jnp.max(values, axis=-1, keepdims=True)
    idx = jnp.min(jnp.where(values == m, iota, vocab), axis=-1, keepdims=True)
    return idx, m


def _sampler_kernel(
    seed_ref,  # SMEM (1, 1) int32
    x_ref,     # VMEM (TB, V) f32 logits (already penalized / temp-scaled,
    #            unless the fused-step prologue below is active)
    k_ref,     # VMEM (TB, 1) f32 resolved top-k (0 disables)
    p_ref,     # VMEM (TB, 1) f32 top-p (0 disables)
    *rest,     # [appears_ref][suppress_ref][noise_ref] nxt/alt/altp[/eoslp] + scr
    do_topk: bool,
    do_topp: bool,
    want_alt_prob: bool,
    has_noise: bool,
    iters: int,
    # ---- fused-step prologue (decode/engine.py "fused_step"): run the
    # engine's pre-filter logit pipeline on the VMEM-resident tile instead
    # of as separate full-vocab XLA passes. Order matches engine.generate:
    # raw eos logprob -> min-length eos suppression -> repetition penalty
    # -> temperature -> filters -> sample.
    penalty: float = 1.0,       # static; 1.0 disables (appears_ref absent)
    temperature: float = 1.0,   # static; 1.0 is a no-op
    eos_token_id=None,          # static int; None = no eos handling
    has_suppress: bool = False, # suppress_ref present ([TB,1] f32, >0 = mask)
    want_eos_lp: bool = False,  # emit raw log P(eos) (pre-penalty)
):
    rest = list(rest)
    appears_ref = rest.pop(0) if penalty != 1.0 else None
    suppress_ref = rest.pop(0) if has_suppress else None
    noise_ref = rest.pop(0) if has_noise else None
    eoslp_ref = rest.pop(3) if want_eos_lp else None
    nxt_ref, alt_ref, altp_ref, probs_scr = rest
    tb, vocab = x_ref.shape
    x = x_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tb, vocab), 1)

    if want_eos_lp:
        # raw (pre-everything) log P(eos): one in-VMEM logsumexp
        m0 = jnp.max(x, axis=-1, keepdims=True)
        lse = m0 + jnp.log(jnp.sum(jnp.exp(x - m0), axis=-1, keepdims=True))
        x_eos = jnp.sum(
            jnp.where(iota == eos_token_id, x, 0.0), axis=-1, keepdims=True
        )
        eoslp_ref[:] = x_eos - lse
    if has_suppress:
        x = jnp.where(
            (iota == eos_token_id) & (suppress_ref[:] > 0), NEG_INF, x
        )
    if penalty != 1.0:
        hit = appears_ref[:] != 0
        x = jnp.where(hit, jnp.where(x < 0, x * penalty, x / penalty), x)
    if temperature != 1.0:
        x = x * (1.0 / temperature)

    hi0 = jnp.max(x, axis=-1, keepdims=True)

    if do_topk:
        kk = k_ref[:]
        finite_min = jnp.min(
            jnp.where(jnp.isfinite(x), x, jnp.inf), axis=-1, keepdims=True
        )

        def count_pred(mid):
            return jnp.sum(
                (x >= mid).astype(jnp.float32), axis=-1, keepdims=True
            ) >= kk

        lo_k, _ = _bisect(count_pred, finite_min, hi0, iters)
        x = jnp.where((kk > 0) & (x < lo_k), NEG_INF, x)

    if do_topp:
        pp = p_ref[:]
        # probs normalized against the (top-k-filtered) full row, exactly
        # like the XLA path's exp(x - logsumexp(x)); exp(-inf - m) = 0
        m = jnp.max(x, axis=-1, keepdims=True)
        e = jnp.exp(x - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        probs_scr[:] = e / s
        probs = probs_scr[:]

        def mass_pred(mid):
            return jnp.sum(
                jnp.where(x >= mid, probs, 0.0), axis=-1, keepdims=True
            ) > pp

        lo_p, _ = _bisect(mass_pred, hi0 - 100.0, hi0, iters)
        x = jnp.where((x >= lo_p) | (pp <= 0.0), x, NEG_INF)

    # ---- Gumbel top-2 (sampling without replacement) ------------------------
    if has_noise:
        gumbel = noise_ref[:]  # injected noise: deterministic tests / CPU
    else:
        # two-word seed: (caller seed, tile index). Mixing the tile in as a
        # SEPARATE word keeps row-tiles decorrelated — `seed + tile` would
        # make consecutive caller seeds reuse each other's tile streams
        pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits((tb, vocab)), jnp.uint32)
        # u in (0, 1): 23 mantissa-grade bits; uint32->f32 casts are
        # unsupported in Mosaic, so route through an int32 bitcast (the
        # shifted value is < 2^23, identical under both signs)
        mant = pltpu.bitcast(bits >> 9, jnp.int32).astype(jnp.float32)
        u = mant * (1.0 / (1 << 23)) + (0.5 / (1 << 23))
        gumbel = -jnp.log(-jnp.log(u))
    pert = x + gumbel  # -inf rows stay -inf: filtered tokens never sampled

    i1, _ = _first_index_of_max(pert, iota, vocab)
    pert2 = jnp.where(iota == i1, NEG_INF, pert)
    i2, m2 = _first_index_of_max(pert2, iota, vocab)

    nxt_ref[:] = i1.astype(jnp.int32)
    alt_ref[:] = i2.astype(jnp.int32)
    if want_alt_prob:
        mf = jnp.max(x, axis=-1, keepdims=True)
        ef = jnp.exp(x - mf)
        sf = jnp.sum(ef, axis=-1, keepdims=True)
        x_alt = jnp.sum(jnp.where(iota == i2, x, 0.0), axis=-1, keepdims=True)
        # singleton kept set: every remaining lane is -inf, so the
        # min-index reduction degenerates to lane 0 (which may be the
        # sampled token itself) — report zero probability so the engine's
        # alternate-continuation guard can never fire (the XLA top-2 path
        # lands on a filtered token there, whose softmax is also 0)
        valid2 = jnp.isfinite(m2)
        altp_ref[:] = jnp.where(valid2, jnp.exp(x_alt - mf) / sf, 0.0)
    else:
        altp_ref[:] = jnp.zeros((tb, 1), jnp.float32)


def resolve_top_k(top_k, batch: int, vocab: int) -> jnp.ndarray:
    """Reference top-k resolution (sampling.py:126-148): 0 disables,
    0<k<1 keeps max(1, floor(k*V)), k>=1 keeps floor(k). Returns [B] f32."""
    k = jnp.broadcast_to(jnp.asarray(top_k, jnp.float32), (batch,))
    k_eff = jnp.where(
        (k > 0) & (k < 1), jnp.maximum(1.0, jnp.floor(k * vocab)), jnp.floor(k)
    )
    return jnp.clip(k_eff, 0, vocab)


def fused_filter_sample(
    logits: jnp.ndarray,  # [B, V] f32 (post-penalty, post-temperature)
    top_k,
    top_p,
    seed: jnp.ndarray,  # scalar int32 (vary per step!)
    *,
    do_topk: bool = True,
    do_topp: bool = True,
    want_alt_prob: bool = True,
    gumbel_noise: Optional[jnp.ndarray] = None,  # [B, V]: injected noise
    iters: int = DEFAULT_ITERS,
    block_rows: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Filter + sample one decode step. Returns (next [B], alt [B],
    alt_prob [B]). do_topk/do_topp are STATIC gates for settings that are
    concretely disabled (each active gate costs a bisection loop).

    gumbel_noise injects the perturbation explicitly (deterministic tests;
    the interpret path, whose core PRNG stub returns zeros). Default None
    uses the on-core PRNG seeded per (seed, row-tile)."""
    b, v = logits.shape
    tb = min(block_rows, b)
    pad = (-b) % tb
    x = logits.astype(jnp.float32)
    kk = resolve_top_k(top_k, b, v)[:, None]
    pp = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))[:, None]
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        kk = jnp.pad(kk, ((0, pad), (0, 0)))
        pp = jnp.pad(pp, ((0, pad), (0, 0)))
    rows = b + pad
    has_noise = gumbel_noise is not None

    kernel = functools.partial(
        _sampler_kernel,
        do_topk=do_topk,
        do_topp=do_topp,
        want_alt_prob=want_alt_prob,
        has_noise=has_noise,
        iters=iters,
    )
    grid = (rows // tb,)
    # index maps take (grid_idx, *scalar_prefetch_refs)
    row_spec = pl.BlockSpec((tb, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    big_spec = pl.BlockSpec((tb, v), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [big_spec, row_spec, row_spec]
    args = [jnp.asarray(seed, jnp.int32).reshape(1, 1), x, kk, pp]
    if has_noise:
        noise = jnp.asarray(gumbel_noise, jnp.float32)
        if pad:
            noise = jnp.pad(noise, ((0, pad), (0, 0)))
        in_specs.append(big_spec)
        args.append(noise)
    nxt, alt, altp = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[row_spec, row_spec, row_spec],
            scratch_shapes=[pltpu.VMEM((tb, v), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return nxt[:b, 0], alt[:b, 0], altp[:b, 0]


def fused_step_sample(
    logits: jnp.ndarray,  # [B, V] f32 RAW step logits
    top_k,
    top_p,
    seed: jnp.ndarray,
    *,
    appears: Optional[jnp.ndarray] = None,  # [B, V] bool/int8 token-history mask
    penalty: float = 1.0,
    temperature: float = 1.0,
    eos_token_id: Optional[int] = None,
    suppress_eos: Optional[jnp.ndarray] = None,  # [B] bool (min-length gate)
    want_eos_lp: bool = False,
    do_topk: bool = True,
    do_topp: bool = True,
    want_alt_prob: bool = True,
    gumbel_noise: Optional[jnp.ndarray] = None,
    iters: int = DEFAULT_ITERS,
    block_rows: int = 8,
    interpret: bool = False,
):
    """fused_filter_sample plus the engine's PRE-filter logit pipeline
    (raw eos logprob, min-length eos suppression, CTRL repetition penalty,
    temperature) on the same single VMEM residency — replacing what are
    otherwise 2-3 more full-vocab HBM passes per decode step. `penalty`
    and `temperature` are static floats (the engine's settings are
    scalars); `appears` is the ops/sampling.repetition_penalty occurrence
    mask, built by the caller's cheap [B, T]-token scatter.

    Returns (next [B], alt [B], alt_prob [B], eos_lp [B] or None).
    """
    if penalty != 1.0 and appears is None:
        raise ValueError("penalty != 1 requires the appears mask")
    if (want_eos_lp or suppress_eos is not None) and eos_token_id is None:
        raise ValueError("eos handling requires eos_token_id")
    b, v = logits.shape
    tb = min(block_rows, b)
    pad = (-b) % tb
    x = logits.astype(jnp.float32)
    kk = resolve_top_k(top_k, b, v)[:, None]
    pp = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))[:, None]
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        kk = jnp.pad(kk, ((0, pad), (0, 0)))
        pp = jnp.pad(pp, ((0, pad), (0, 0)))
    rows = b + pad
    has_noise = gumbel_noise is not None
    has_suppress = suppress_eos is not None

    kernel = functools.partial(
        _sampler_kernel,
        do_topk=do_topk,
        do_topp=do_topp,
        want_alt_prob=want_alt_prob,
        has_noise=has_noise,
        iters=iters,
        penalty=float(penalty),
        temperature=float(temperature),
        eos_token_id=eos_token_id,
        has_suppress=has_suppress,
        want_eos_lp=want_eos_lp,
    )
    grid = (rows // tb,)
    row_spec = pl.BlockSpec((tb, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    big_spec = pl.BlockSpec((tb, v), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [big_spec, row_spec, row_spec]
    args = [jnp.asarray(seed, jnp.int32).reshape(1, 1), x, kk, pp]
    if penalty != 1.0:
        a = jnp.asarray(appears, jnp.int8)
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0)))
        in_specs.append(
            pl.BlockSpec((tb, v), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(a)
    if has_suppress:
        s = jnp.asarray(suppress_eos, jnp.float32)[:, None]
        if pad:
            s = jnp.pad(s, ((0, pad), (0, 0)))
        in_specs.append(row_spec)
        args.append(s)
    if has_noise:
        noise = jnp.asarray(gumbel_noise, jnp.float32)
        if pad:
            noise = jnp.pad(noise, ((0, pad), (0, 0)))
        in_specs.append(big_spec)
        args.append(noise)

    out_specs = [row_spec, row_spec, row_spec]
    out_shape = [
        jax.ShapeDtypeStruct((rows, 1), jnp.int32),
        jax.ShapeDtypeStruct((rows, 1), jnp.int32),
        jax.ShapeDtypeStruct((rows, 1), jnp.float32),
    ]
    if want_eos_lp:
        out_specs.append(row_spec)
        out_shape.append(jax.ShapeDtypeStruct((rows, 1), jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((tb, v), jnp.float32)],
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    nxt, alt, altp = out[0][:b, 0], out[1][:b, 0], out[2][:b, 0]
    eos_lp = out[3][:b, 0] if want_eos_lp else None
    return nxt, alt, altp, eos_lp


def fused_filter(
    logits: jnp.ndarray,
    top_k,
    top_p,
    *,
    do_topk: bool = True,
    do_topp: bool = True,
    iters: int = DEFAULT_ITERS,
    block_rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Filter-only variant (returns [B, V] filtered logits, masked = -inf).

    Same kept-set semantics as ops/sampling.top_k_top_p_filter_threshold;
    used by tests to pin the kernel's filter math against the XLA path,
    and by callers that need the filtered distribution itself."""
    b, v = logits.shape
    tb = min(block_rows, b)
    pad = (-b) % tb
    x = logits.astype(jnp.float32)
    kk = resolve_top_k(top_k, b, v)[:, None]
    pp = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))[:, None]
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        kk = jnp.pad(kk, ((0, pad), (0, 0)))
        pp = jnp.pad(pp, ((0, pad), (0, 0)))
    rows = b + pad

    def filt_kernel(x_ref, k_ref, p_ref, o_ref, probs_scr, *, iters):
        tb_, vocab = x_ref.shape
        x = x_ref[:]
        hi0 = jnp.max(x, axis=-1, keepdims=True)
        if do_topk:
            kk = k_ref[:]
            finite_min = jnp.min(
                jnp.where(jnp.isfinite(x), x, jnp.inf), axis=-1, keepdims=True
            )
            lo_k, _ = _bisect(
                lambda mid: jnp.sum((x >= mid).astype(jnp.float32), axis=-1,
                                    keepdims=True) >= kk,
                finite_min, hi0, iters,
            )
            x = jnp.where((kk > 0) & (x < lo_k), NEG_INF, x)
        if do_topp:
            pp = p_ref[:]
            m = jnp.max(x, axis=-1, keepdims=True)
            e = jnp.exp(x - m)
            s = jnp.sum(e, axis=-1, keepdims=True)
            probs_scr[:] = e / s
            probs = probs_scr[:]
            lo_p, _ = _bisect(
                lambda mid: jnp.sum(jnp.where(x >= mid, probs, 0.0), axis=-1,
                                    keepdims=True) > pp,
                hi0 - 100.0, hi0, iters,
            )
            x = jnp.where((x >= lo_p) | (pp <= 0.0), x, NEG_INF)
        o_ref[:] = x

    row_spec = pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(filt_kernel, iters=iters),
        grid=(rows // tb,),
        in_specs=[
            pl.BlockSpec((tb, v), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ],
        out_specs=pl.BlockSpec((tb, v), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, v), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tb, v), jnp.float32)],
        interpret=interpret,
    )(x, kk, pp)
    return out[:b]
