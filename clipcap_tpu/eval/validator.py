"""Validation-time caption quality measurement.

Rebuild of the reference's CaptionValidator protocol (model.py:14-23) and
CocoCaptionValidator (evaluate_model.py:422-535): per batch, run every
sampler over each image, record hypotheses + CLIP scores; compute the
validation CE loss by re-running the captioner forward over ground-truth
captions (min_cap_per_img rounds, zero-padded tokens — note the reference
pads with 0 here so the attention mask is all-ones and padding is dropped
only by ignore_index, :503-510, a quirk kept); get_results runs the
scoring suite per sampler plus mean loss / mean CLIP score.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models import captioner
from .scoring import generate_scores


class CaptionValidator:
    """Protocol (reference model.py:14-23)."""

    def process(self, bundle, batch):
        pass

    def reset(self):
        pass

    def get_results(self):
        pass

    def load_image_by_id(self, image_id):
        pass


class CocoCaptionValidator(CaptionValidator):
    def __init__(self, dataset, preprocess, caption_samplers: Dict[str, object],
                 clip_scoring, batched_sampling: bool = True):
        """dataset: data.coco.CocoImageDataset-like (get_index,
        load_image_by_id); preprocess: image -> [3,H,W] array for the
        captioner's visual encoder; caption_samplers: {id: sampler};
        clip_scoring: eval.clip_scoring.ClipScoring.

        batched_sampling: samplers exposing sample_batch run ONCE per
        process() batch instead of once per image (the TPU win: a batch-1
        GPT2-XL decode step streams 3.1 GB of weights either way, so N
        images in one executable are ~N x faster — beam 4.8 -> 53.9 c/s,
        clip-guided 1.34 s -> 244 ms/image measured). Per-image captions
        are identical for beam/clip-guided; NoBeam's sampled rows match in
        distribution but not bit-exactly (rng row alignment — see its
        sample_batch docstring). Set False for reference-exact
        image-at-a-time trajectories."""
        self.dataset = dataset
        self.preprocess = preprocess
        self.caption_samplers = caption_samplers
        self.clip_scoring = clip_scoring
        self.batched_sampling = batched_sampling
        self.gt_captions_by_image_id = dataset.get_index().get_captions_by_image_id()
        self.reset()

    def reset(self):
        self.ground_truth_captions = {}
        self.caption_hypo = {sid: {} for sid in self.caption_samplers}
        self.results = {"captions": []}
        self.losses: List[float] = []
        self.clip_scores: List[float] = []

    def process(self, bundle, batch):
        batch = [x for x in batch if x is not None]
        images = [item["image"] for item in batch]
        image_tensors = [np.asarray(self.preprocess(img)) for img in images]
        image_captions_gt = []

        # batched sampling: one executable over the whole batch per
        # sampler that supports it (see __init__ batched_sampling)
        pre: Dict[str, List[List[str]]] = {}
        if self.batched_sampling and len(batch) > 1:
            stacked = np.stack(image_tensors, axis=0)
            for sampler_id, sampler in self.caption_samplers.items():
                fn = getattr(sampler, "sample_batch", None)
                if fn is not None:
                    pre[sampler_id] = fn(bundle, stacked, images)

        for idx, item in enumerate(batch):
            image_entry = item["image_entry"]
            image = images[idx]

            gt = self.gt_captions_by_image_id[image_entry.id]
            self.ground_truth_captions[image_entry.id] = [{"caption": c} for c in gt]
            image_captions_gt.append(gt)

            image_tensor = image_tensors[idx]

            sampling_results = []
            for sampler_id, sampler in self.caption_samplers.items():
                if sampler_id in pre:
                    captions = pre[sampler_id][idx]
                else:
                    captions = sampler.sample(bundle, jnp.asarray(image_tensor), image)
                self.caption_hypo[sampler_id][image_entry.id] = [{"caption": captions[0]}]

                # fetch all scores in one transfer (per-element float() of a
                # device array costs a relay round-trip per caption)
                clip_scores = np.asarray(
                    jax.device_get(self.clip_scoring.score_image(image, captions))
                )
                captions_result = []
                for i, c in enumerate(captions):
                    cs = float(clip_scores[0, i])
                    captions_result.append({"caption": c, "clip_score": cs, "gt": gt[0]})
                    self.clip_scores.append(cs)
                sampling_results.append(
                    {"sampler_id": sampler_id, "captions": captions_result}
                )

            self.results["captions"].append(
                {
                    "image_id": image_entry.id,
                    "image_url": image_entry.url,
                    "sampling_results": sampling_results,
                }
            )

        # validation CE loss over GT captions (reference :497-516)
        image_batch = jnp.asarray(np.stack(image_tensors, axis=0))
        prefixes = bundle.encode_image(image_batch)

        min_cap_per_img = min(len(x) for x in image_captions_gt)
        for i in range(min_cap_per_img):
            encoded = [
                bundle.tokenizer.encode_text(c[i], add_bos=True, add_eos=True)
                for c in image_captions_gt
            ]
            max_len = max(len(t) for t in encoded)
            tokens = np.zeros((len(encoded), max_len), np.int64)  # zero-padded
            for j, t in enumerate(encoded):
                tokens[j, : len(t)] = t
            loss, _ = captioner.caption_loss(
                bundle.params, bundle.cap_cfg, bundle.lm_cfg,
                jnp.asarray(tokens), prefixes,
            )
            self.losses.append(float(jax.device_get(loss)))

    def get_results(self):
        results = self.results
        sampler_scores = {}
        for sampler_id, hypo in self.caption_hypo.items():
            gts = {k: self.ground_truth_captions[k] for k in hypo}
            scores, _ = generate_scores(gts, hypo)
            sampler_scores[sampler_id] = scores
        results["validation_loss"] = float(np.mean(self.losses)) if self.losses else float("nan")
        results["clip_score"] = float(np.mean(self.clip_scores)) if self.clip_scores else float("nan")
        results["sampler_scores"] = sampler_scores
        return results

    def load_image_by_id(self, image_id):
        return self.dataset.load_image_by_id(image_id)
