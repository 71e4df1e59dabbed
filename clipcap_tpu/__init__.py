"""clipcap_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-captioning framework.

A from-scratch rebuild of the capabilities of andreaskoepf/CLIP-Image-Captioning
(reference mounted read-only at /root/reference), redesigned TPU-first:

- pure-functional JAX models (explicit param pytrees) compiled by XLA,
- Pallas kernels for the hot ops (fused attention, patchify),
- data / model parallelism via jax.sharding.Mesh + NamedSharding (the
  DDP/DeepSpeed-ZeRO equivalent of the reference's train.py:276-289),
- KV-cached lax.scan decoding replacing the reference's full-recompute
  token loops (reference inference.py:97, sampling.py:193),
- host-side ingest (npy shards, COCO json, webdataset tars) feeding
  device-resident compute.

Layer map (mirrors SURVEY.md §1 of the reference):
  core/       mesh, dtype policy, config
  ops/        attention, norms, activations, sampling filters (+ pallas/)
  models/     mapper, gpt2, gptj, t5, clip_vit, blip_vit, blip_text, captioner
  lm/         unified language-model surface (reference lms/)
  parallel/   partition rules, ZeRO-style sharding
  data/       npy shard reader, COCO/folder datasets, webdataset, pipeline
  tokenizers/ byte-level BPE (GPT-2/GPT-J), CLIP BPE, WordPiece (BLIP)
  train/      train step, optimizer, AutoClip, checkpointing, trainer loop
  decode/     generation engine: greedy/beam/nucleus/typical, clip-guided,
              batched per-sample hyperparameter sampling (reference sampling.py)
  rank/       clip_rank / blip_rank, multi-stage cascades
  eval/       PTB tokenize, BLEU/CIDEr/ROUGE, ClipScoring, validator
  tools/      preprocess, merge shards, hashes, human-eval prep, ckpt tools
  cli/        train / evaluate / caption_me / sweep entry points
"""

__version__ = "0.1.0"
