"""Gen-B batched heterogeneous caption sampling (the reference's sampling.py).

Rebuilds `sample()` (reference sampling.py:283-326) TPU-first:

- the BLIP visual encoder runs once per image; image token features are
  repeat_interleave'd `sample_count` times (reference :286-288);
- the prompt ("a picture of ") is tokenized once, its first token replaced
  by BOS and its end token dropped (reference :294-298);
- generation runs through decode/engine.generate with *per-sample*
  top_p/top_k/typ_p/min_length/max_length vectors, min-length EOS
  suppression, repetition penalty, force-EOS early stop and
  alternate-token continuation — one fixed-shape lax.scan instead of the
  reference's dynamic batch-shrinking Python loop (:252-268);
- `num_runs` outer loop and caption dedup happen on the host (:313-326).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import BlipTextConfig
from ..models import blip_text
from .engine import GenerationSettings, generate


# the per-row hyperparameter VECTORS ride into the jitted closure as
# TRACED arguments, not baked constants: hyperparameter sweeps
# (cli/sweep.py's TPE loop) change them every trial, and a baked copy
# would recompile the whole synthesis graph (~seconds through the relay)
# per trial. min/max length are always traced (pure runtime
# comparisons); a FILTER vector (top_p/top_k/typ_p) is traced only when
# some row is nonzero — an all-zero filter stays a baked constant so the
# engine's static gating still compiles the filter OUT entirely (the
# threshold filters no-op on zero rows, so tracing nonzero vectors is
# semantics-preserving). Scalar penalties / force-eos / max_new_tokens
# steer Python-level branching and stay static: sweeping THOSE still
# recompiles (few distinct values in practice).
_ALWAYS_TRACED = ("min_length", "max_length")
_FILTER_FIELDS = ("top_p", "top_k", "typ_p")


def _traced_fields(settings: GenerationSettings):
    out = set(_ALWAYS_TRACED)
    for name in _FILTER_FIELDS:
        v = getattr(settings, name)
        if isinstance(v, (jnp.ndarray, np.ndarray)) and (np.asarray(v) != 0).any():
            out.add(name)
    return out


def _settings_cache_key(settings: GenerationSettings, traced):
    """Hashable key over the STATIC settings fields (traced vector fields
    contribute only their shape/dtype, not their values)."""

    def leaf(name, x):
        if isinstance(x, (jnp.ndarray, np.ndarray)):
            # sample() builds per-row vectors as host numpy precisely so
            # this hashing never touches the device (np.asarray on a
            # device array costs a ~30 ms relay round-trip EACH)
            if name in traced:
                return ("traced", x.shape, str(x.dtype))
            return ("arr", x.shape, str(x.dtype), tuple(np.asarray(x).ravel().tolist()))
        return x

    import dataclasses as _dc

    return tuple((f.name, leaf(f.name, getattr(settings, f.name)))
                 for f in _dc.fields(settings))


_SAMPLE_CACHE: dict = {}


def _compiled_sample(text_cfg: BlipTextConfig, settings: GenerationSettings, key,
                     sample_count: int):
    import dataclasses as _dc

    cache_key = (text_cfg, key, sample_count)
    fn = _SAMPLE_CACHE.get(cache_key)
    if fn is None:

        traced_names = sorted(n for n, marker in key
                              if isinstance(marker, tuple) and marker
                              and marker[0] == "traced")

        @jax.jit
        def fn(text_params, img, img_mask, prompt_arr, rng, hpacked):
            # img is UNREPEATED [B_img, Tv, D]; the decoder shares each
            # image's cross K/V across its sample_count candidate rows
            lm = blip_text.decoder_lm(text_params, text_cfg, img, img_mask,
                                      repeat=sample_count)
            # hpacked [n_traced, total] f32: ONE host->device transfer per
            # call (five separate puts each cost a relay round-trip)
            hparams = {}
            for i, name in enumerate(traced_names):
                row = hpacked[i]
                if name in ("min_length", "max_length"):
                    row = row.astype(jnp.int32)
                hparams[name] = row
            live = _dc.replace(settings, **hparams)
            return generate(lm, text_params, text_cfg, prompt_arr, live,
                            rng=rng, prompt_tokens=prompt_arr)

        if len(_SAMPLE_CACHE) > 32:  # bound the executable cache: evict the
            # least-recently-used entry only — wiping the whole dict would
            # make a sweep alternating >32 distinct static settings thrash
            # full recompiles (~9.4 s each through the relay)
            _SAMPLE_CACHE.pop(next(iter(_SAMPLE_CACHE)))
        _SAMPLE_CACHE[cache_key] = fn
    else:
        # move-to-end: dict insertion order doubles as the LRU order
        _SAMPLE_CACHE.pop(cache_key)
        _SAMPLE_CACHE[cache_key] = fn
    return fn


def sample(
    image_embeds: jnp.ndarray,  # [B, Tv, D] BLIP ViT tokens (visual_encoder output)
    text_params: dict,
    text_cfg: BlipTextConfig,
    tokenizer,  # WordPiece wrapper: encode/decode, bos/sep ids
    sample_count: int = 3,
    top_p=0.0,
    top_k=0.0,
    typ_p=0.0,
    min_len=0,
    max_len=32,
    repetition_penalty: float = 1.3,
    force_eos_log_prob: float = math.log(0.9),
    min_alternate_prob: float = 0.0,
    prompt: str = "a picture of ",
    unique: bool = True,
    num_runs: int = 1,
    rng: Optional[jax.Array] = None,
    vocab_prefilter: int = 4096,
):
    """Returns (captions, parameters, stats) like reference sampling.py:283.

    parameters[i] = [min_len, max_len, top_p] of candidate i;
    stats[i] = {"eos_prob": per-step raw log P(eos), "tokens": token ids}.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    batch = image_embeds.shape[0]
    total = batch * sample_count

    # the reference repeats image features per sample (:288); here the
    # repeat lives in the decoder's cross-attention (decoder_lm repeat=),
    # so each image's K/V are streamed once per step, not sample_count times
    img = image_embeds
    img_mask = jnp.ones(img.shape[:-1], jnp.int32)

    bos = tokenizer.bos_token_id
    eos = tokenizer.sep_token_id
    prompt_ids = tokenizer.encode(prompt)
    prompt_ids = [bos] + prompt_ids[1:-1] if prompt_ids else [bos]
    prompt_arr = jnp.asarray(np.tile(np.asarray(prompt_ids, np.int32), (total, 1)))
    n_prompt = prompt_arr.shape[1]

    def per_sample(x, dtype=np.float32):
        # host numpy: these vectors go into GenerationSettings (jit-cache
        # hashed by value) and back into the result metadata — keeping
        # them off the device avoids one relay round-trip per array
        x = np.asarray(jax.device_get(x), dtype)
        if x.ndim == 0:
            return np.broadcast_to(x, (total,))
        # one value per sample slot, tiled over images
        return np.tile(x.reshape(-1), batch)[:total]

    max_len_v = per_sample(max_len, np.int32)
    settings = GenerationSettings(
        max_new_tokens=int(max_len_v.max()) + 1,
        top_p=per_sample(top_p),
        top_k=per_sample(top_k),
        typ_p=per_sample(typ_p),
        repetition_penalty=repetition_penalty,
        eos_token_id=int(eos),
        min_length=per_sample(min_len, np.int32),
        max_length=max_len_v,
        force_eos_log_prob=float(force_eos_log_prob),
        min_alternate_prob=float(min_alternate_prob),
        # the BERT vocab is 30k; per-step full-vocab sorts dominate decode
        # time without this (exact while top_k <= prefilter and the nucleus
        # fits — see ops/sampling.top_k_top_p_filter)
        vocab_prefilter=int(vocab_prefilter),
        pad_token_id=0,
    )

    # Compile-cache the whole synthesis computation. Calling the engine
    # eagerly costs seconds per image over the TPU relay (per-op dispatch);
    # the per-row hyperparameter vectors enter as traced arguments so a
    # sweep over them reuses ONE compiled executable across trials.
    traced = _traced_fields(settings)
    run_fn = _compiled_sample(text_cfg, settings,
                              _settings_cache_key(settings, traced),
                              sample_count)
    hparams = jnp.asarray(np.stack(
        [np.asarray(getattr(settings, name), np.float32) for name in sorted(traced)]
    ))

    captions, parameters, stats = [], [], []
    for run in range(num_runs):
        rng, run_rng = jax.random.split(rng)
        out = run_fn(text_params, img, img_mask, prompt_arr, run_rng, hparams)
        # ONE bundled transfer: each separate device_get costs a full
        # relay round-trip (~30 ms); the settings vectors are already host
        # numpy (per_sample above)
        tokens, lengths, eos_lp = (
            np.asarray(a) for a in jax.device_get(
                (out["tokens"], out["lengths"], out["eos_logprob"]))
        )
        min_v = np.asarray(settings.min_length)
        max_v = np.asarray(settings.max_length)
        top_p_v = np.asarray(settings.top_p)

        for i in range(total):
            ids = [int(t) for t in tokens[i][: lengths[i]]]
            # drop the eos itself from the text
            text_ids = [t for t in ids if t != eos]
            caption = tokenizer.decode(text_ids)
            if unique and caption in captions:
                continue
            captions.append(caption)
            parameters.append([int(min_v[i]), int(max_v[i]), float(top_p_v[i])])
            stats.append({"eos_prob": eos_lp[i][: lengths[i]], "tokens": ids})
    return captions, parameters, stats
