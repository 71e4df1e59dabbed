"""Caption sampler strategy objects.

Rebuild of the reference's CaptionSamplerBase hierarchy
(evaluate_model.py:355-419): a sampler takes the bundle + image tensor,
runs visual encoder -> mapper, then a decode strategy.

- NoBeamCaptionSampler (reference :374-393 over generate_no_beam
  :104-179): the reference loops the top_p sweep sequentially at batch 1;
  here the sweep IS the batch — one KV-cached generate() with a per-row
  top_p vector. BOS is prepended, '.' stops count up to max_stops, any
  special token stops, specials are stripped from the output.
- ClipGuidedCaptionSampler (reference :396-419): CLIP-guided lookahead.
- BeamCaptionSampler: beam search (reference inference.py:70-148) as a
  validator-pluggable strategy.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..decode.beam import (beam_search, beam_search_batched, best_beam_text,
                           best_beam_texts)
from ..decode.clip_guided import (generate_clip_guided,
                                  generate_clip_guided_batch)
from ..decode.engine import GenerationSettings, generate, trim_and_decode


class CaptionSamplerBase:
    def sample(self, bundle, image_tensor, image) -> List[str]:
        if image_tensor.ndim == 3:
            image_tensor = image_tensor[None]
        image_embedding = bundle.encode_image(jnp.asarray(image_tensor))
        prefix = bundle.project_prefix(image_embedding)
        return self.generate_captions(bundle, prefix, image_embedding, image)

    def get_description(self) -> str:
        raise NotImplementedError()

    def generate_captions(self, bundle, prefix, image_embedding, image) -> List[str]:
        raise NotImplementedError()


class NoBeamCaptionSampler(CaptionSamplerBase):
    def __init__(
        self,
        top_p_values: Sequence[float] = (0.1,),
        temperature: float = 1.0,
        repetition_penalty: float = 1.2,
        max_decode_length: int = 75,
        max_stops: int = 3,
        stop_token: str = ".",
        seed: int = 0,
        vocab_prefilter: int = 4096,
    ):
        self.top_p_values = list(top_p_values)
        self.temperature = temperature
        self.repetition_penalty = repetition_penalty
        self.max_decode_length = max_decode_length
        self.max_stops = max_stops
        self.stop_token = stop_token
        self.seed = seed
        self.vocab_prefilter = vocab_prefilter
        self._gen_fn = None
        self._gen_key = None

    def get_description(self):
        return (
            f"NoBeam(rep_p={self.repetition_penalty}, temp={self.temperature}, "
            f"top_p={self.top_p_values})"
        )

    def generate_captions(self, bundle, prefix, image_embedding, image) -> List[str]:
        assert self.max_decode_length <= 77, "maximum context length for CLIP models is 77"
        tokenizer = bundle.tokenizer
        n = len(self.top_p_values)
        # one row per sweep value (reference reruns the loop per value)
        prefix_rep = jnp.repeat(prefix, n, axis=0)
        bos = jnp.full((n, 1), tokenizer.bos_token_id, jnp.int32)
        prompt = jnp.concatenate([prefix_rep, bundle.embed_text(bos)], axis=1)

        stop_id = tokenizer.encode_text(self.stop_token)[0]
        # everything the jitted closure bakes in keys the cache:
        # enable_int8_decode() swaps lm_decode, and the multi-chip enables
        # install cache_constraint — both must invalidate the closure
        key = (id(bundle), id(bundle.lm_decode),
               id(getattr(bundle, "cache_constraint", None)), stop_id,
               tuple(tokenizer.all_special_ids))
        if self._gen_fn is None or self._gen_key != key:
            settings = GenerationSettings(
                max_new_tokens=self.max_decode_length,
                temperature=self.temperature,
                top_p=jnp.asarray(self.top_p_values, jnp.float32),
                repetition_penalty=self.repetition_penalty,
                stop_token_id=stop_id,
                max_stops=self.max_stops,
                stop_on_special=tuple(tokenizer.all_special_ids),
                vocab_prefilter=self.vocab_prefilter,
            )
            constraint = getattr(bundle, "cache_constraint", None)
            lm, lm_cfg = bundle.lm_decode, bundle.lm_cfg

            # jit the engine call (eager per-op dispatch over the TPU relay
            # costs seconds per image); settings are per-instance constants
            @jax.jit
            def _run(params, prompt, rng):
                return generate(lm, params, lm_cfg, prompt, settings,
                                rng=rng, cache_constraint=constraint)

            self._gen_fn, self._gen_key = _run, key
        out = self._gen_fn(bundle.lm_decode_params, prompt,
                           jax.random.PRNGKey(self.seed))
        return trim_and_decode(out, tokenizer, strip_special=True)

    def sample_batch(self, bundle, image_tensors, images=None) -> List[List[str]]:
        """The top_p sweep for EACH of N images in ONE generate() call
        (N * len(top_p_values) rows — at batch 1 a GPT2-XL decode step
        streams 3.1 GB of weights for a handful of rows; stacking images
        shares that stream). `images` is unused (uniform sample_batch
        signature across samplers).

        Token streams match per-image sample() in DISTRIBUTION but are
        not bit-identical: the engine draws one [rows, V] Gumbel per step,
        so a row's random bits depend on its index in the stacked batch
        (same caveat as decode/serving.py's refill rng alignment). With
        top_p small enough to pin the top token (or temperature -> 0) the
        outputs are exact — pinned in tests/test_validator_integration.py."""
        assert self.max_decode_length <= 77, "maximum context length for CLIP models is 77"
        tokenizer = bundle.tokenizer
        image_tensors = jnp.asarray(image_tensors)
        if image_tensors.ndim == 3:
            image_tensors = image_tensors[None]
        prefix = bundle.project_prefix(bundle.encode_image(image_tensors))
        n_img, n_p = prefix.shape[0], len(self.top_p_values)
        # row layout: image-major [img0 x sweep, img1 x sweep, ...]
        prefix_rep = jnp.repeat(prefix, n_p, axis=0)
        bos = jnp.full((n_img * n_p, 1), tokenizer.bos_token_id, jnp.int32)
        prompt = jnp.concatenate([prefix_rep, bundle.embed_text(bos)], axis=1)

        stop_id = tokenizer.encode_text(self.stop_token)[0]
        # n_img keys the cache: the tiled top_p vector is baked into the
        # settings closure, so a different image count must rebuild it
        key = ("batch", n_img, id(bundle), id(bundle.lm_decode),
               id(getattr(bundle, "cache_constraint", None)), stop_id,
               tuple(tokenizer.all_special_ids))
        if getattr(self, "_gen_fn_batch", None) is None or \
                getattr(self, "_gen_key_batch", None) != key:
            settings = GenerationSettings(
                max_new_tokens=self.max_decode_length,
                temperature=self.temperature,
                top_p=jnp.tile(jnp.asarray(self.top_p_values, jnp.float32),
                               n_img),
                repetition_penalty=self.repetition_penalty,
                stop_token_id=stop_id,
                max_stops=self.max_stops,
                stop_on_special=tuple(tokenizer.all_special_ids),
                vocab_prefilter=self.vocab_prefilter,
            )
            constraint = getattr(bundle, "cache_constraint", None)
            lm, lm_cfg = bundle.lm_decode, bundle.lm_cfg

            @jax.jit
            def _run(params, prompt, rng):
                return generate(lm, params, lm_cfg, prompt, settings,
                                rng=rng, cache_constraint=constraint)

            self._gen_fn_batch, self._gen_key_batch = _run, key
        out = self._gen_fn_batch(bundle.lm_decode_params, prompt,
                                 jax.random.PRNGKey(self.seed))
        flat = trim_and_decode(out, tokenizer, strip_special=True)
        return [flat[i * n_p : (i + 1) * n_p] for i in range(n_img)]


class ClipGuidedCaptionSampler(CaptionSamplerBase):
    def __init__(self, clip_scoring, branching_factor: int = 3, look_ahead: int = 4,
                 repetition_penalty: float = 1.2):
        self.clip_scoring = clip_scoring
        self.branching_factor = branching_factor
        self.look_ahead = look_ahead
        self.repetition_penalty = repetition_penalty

    def get_description(self):
        return (
            f"ClipGuided(branching={self.branching_factor}, "
            f"look_ahead={self.look_ahead}, rep_p={self.repetition_penalty})"
        )

    def generate_captions(self, bundle, prefix, image_embedding, image) -> List[str]:
        clip_image_tensor = self.clip_scoring.preprocess_image(image)
        clip_image_embedding = self.clip_scoring.embed_image(clip_image_tensor)
        caption = generate_clip_guided(
            bundle, self.clip_scoring, clip_image_embedding[0], prefix,
            branching_factor=self.branching_factor,
            look_ahead=self.look_ahead,
            repetition_penalty_value=self.repetition_penalty,
        )
        return [caption]

    # one tree dispatch's row ceiling (N * branching**look_ahead) — past
    # ~512 rows the decode step's activation layout flips batch-minor and
    # pays ~1.7x (r5, CLAUDE.md "Beam N=128 regression"); N=56 at the
    # bench's k=3/la=2 measures 83.4 ms/image, the best point
    max_rows_per_call = 512

    def sample_batch(self, bundle, image_tensors, images) -> List[List[str]]:
        """One clip-guided caption for EACH of N images with every tree
        dispatch, relay sync, and CLIP text batch shared across images
        (generate_clip_guided_batch — the per-chunk ~60 ms relay sync and
        the XL weight stream are the whole cost at batch 1). Per-image
        results match sample() exactly on CPU f32; bf16 near-tie caveat
        in the batch function's docstring. Calls are chunked to
        `max_rows_per_call` tree rows (chunking does not change per-image
        tokens — images are independent)."""
        image_tensors = jnp.asarray(image_tensors)
        if image_tensors.ndim == 3:
            image_tensors = image_tensors[None]
        tree_rows = self.branching_factor ** self.look_ahead
        max_images = max(1, self.max_rows_per_call // max(1, tree_rows))
        caps: List[str] = []
        for lo in range(0, image_tensors.shape[0], max_images):
            part = image_tensors[lo:lo + max_images]
            prefix = bundle.project_prefix(bundle.encode_image(part))
            clip_embs = jnp.concatenate([
                self.clip_scoring.embed_image(
                    self.clip_scoring.preprocess_image(img))
                for img in images[lo:lo + max_images]
            ], axis=0)
            caps.extend(generate_clip_guided_batch(
                bundle, self.clip_scoring, clip_embs, prefix,
                branching_factor=self.branching_factor,
                look_ahead=self.look_ahead,
                repetition_penalty_value=self.repetition_penalty,
            ))
        return [[c] for c in caps]


class BeamCaptionSampler(CaptionSamplerBase):
    # one beam executable's row ceiling (N x beam) — see sample_batch
    max_rows_per_call = 480

    def __init__(self, beam_size: int = 5, max_decode_length: int = 67,
                 temperature: float = 1.0, stop_token: str = "."):
        self.beam_size = beam_size
        self.max_decode_length = max_decode_length
        self.temperature = temperature
        self.stop_token = stop_token

    def get_description(self):
        return f"Beam(size={self.beam_size}, temp={self.temperature})"

    def generate_captions(self, bundle, prefix, image_embedding, image) -> List[str]:
        stop_id = bundle.tokenizer.encode_text(self.stop_token)[0]
        out = beam_search(
            bundle.lm_decode, bundle.lm_decode_params, bundle.lm_cfg, prefix,
            beam_size=self.beam_size, max_new_tokens=self.max_decode_length,
            temperature=self.temperature, stop_token_id=stop_id,
        )
        return [best_beam_text(out, bundle.tokenizer)]

    def sample_batch(self, bundle, image_tensors, images=None) -> List[List[str]]:
        """Best-beam caption for EACH of N images in one executable
        (beam_search_batched: N x beam_size rows share the weight stream
        instead of idling the MXU at batch 1 — see bench
        beam_search_gpt2xl_int8.batched_captions_per_sec). Semantics per
        image are identical to sample(); `images` is unused (uniform
        sample_batch signature across samplers for the validator).

        Calls are chunked so one executable never exceeds
        `max_rows_per_call` rows (N x beam, default 480): past that, XLA
        layout assignment flips the decode step's activation chain
        batch-minor and the step lands ~2.6x off linear (measured r5,
        CLAUDE.md "Beam N=128 regression"). Chunking does not change
        per-image tokens (images are independent)."""
        image_tensors = jnp.asarray(image_tensors)
        if image_tensors.ndim == 3:
            image_tensors = image_tensors[None]
        stop_id = bundle.tokenizer.encode_text(self.stop_token)[0]
        max_images = max(1, self.max_rows_per_call // max(1, self.beam_size))
        texts: List[str] = []
        for lo in range(0, image_tensors.shape[0], max_images):
            prefix = bundle.project_prefix(
                bundle.encode_image(image_tensors[lo:lo + max_images]))
            out = beam_search_batched(
                bundle.lm_decode, bundle.lm_decode_params, bundle.lm_cfg,
                prefix, beam_size=self.beam_size,
                max_new_tokens=self.max_decode_length,
                temperature=self.temperature, stop_token_id=stop_id,
            )
            texts.extend(best_beam_texts(out, bundle.tokenizer))
        return [[t] for t in texts]
