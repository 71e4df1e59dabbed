"""Headline benchmark: GPT2-XL caption decode throughput on one TPU chip.

Measures the BASELINE.md target "GPT2-XL decode >= 50 captions/sec/chip"
(all decode paths replace the reference's full-recompute loops,
inference.py:97/:249), plus the rest of the framework's hot surfaces:

- raw greedy decode: bf16 (batch 256) and int8 weights + int8 KV at
  batch 512 (models/gpt2.py quantize_params) — the headline number;
- the full decode/engine.generate path with reference-default sampling
  (repetition penalty 1.2, the generate_no_beam top_p sweep 0.1..0.9 as a
  per-row vector, sort-free threshold filters; reference
  inference.py:219-292), end-to-end from mapper output;
- single-caption serving latency (batch 1, int8);
- GPT-J 6B int8 decode on one chip (BASELINE config #4's model);
- ViT-B/32 encode (>= 10k images/sec target);
- Gen-B 40-candidate BLIP synthesis ms/image;
- training steps/sec for config #1 (GPT-2 small prefix training) and
  config #2 (GPT2-XL prefix-only, the reference's headline run);
- the C++ shard loader's feed rate.

Prints TWO JSON lines: a {"detail": {...}} line with every phase's
numbers, then a compact FINAL line {"metric", "value", "unit",
"vs_baseline", ...} — the driver tail-captures stdout and the last line
must always parse on its own (r3's single giant line outgrew the capture
window and the round's headline was lost).

Timing notes for this environment: the TPU is reached through a relay
where block_until_ready() does not synchronize reliably and a synced
dispatch costs ~30 ms; long-latency benches sync a scalar per iteration,
the short ViT encode pipelines several calls and syncs once.
"""

from __future__ import annotations

import dataclasses
import json
import time


BATCH = 256
PREFIX_LEN = 40  # reference config #2: prefix_length=40
NEW_TOKENS = 32  # typical caption length
BASELINE_CAPTIONS_PER_SEC = 50.0  # BASELINE.md north-star target


def _bench_decode_raw(cfg, params, prefix, int8: bool, batch: int = BATCH):
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.models import gpt2

    total_len = PREFIX_LEN + NEW_TOKENS
    if int8:
        params = jax.jit(gpt2.quantize_params)(params)
        init_cache = lambda: gpt2.init_cache_q8(cfg, batch=batch, max_len=total_len)
        prefill, step = gpt2.prefill_q8, gpt2.decode_step_q8
    else:
        init_cache = lambda: gpt2.init_cache(
            cfg, batch=batch, max_len=total_len, dtype=jnp.bfloat16
        )
        prefill, step = gpt2.prefill, gpt2.decode_step

    @jax.jit
    def decode_checksum(params, prefix):
        cache = init_cache()
        logits, cache = prefill(params, cfg, prefix, cache)
        tok = jnp.argmax(logits[:, -1], axis=-1)

        def body(carry, _):
            tok, cache = carry
            emb = gpt2.embed_tokens(params, tok)[:, None, :].astype(jnp.bfloat16)
            logits, cache = step(params, cfg, emb, cache)
            nxt = jnp.argmax(logits, axis=-1)
            return (nxt, cache), nxt

        (_, _), toks = jax.lax.scan(body, (tok, cache), None, length=NEW_TOKENS - 1)
        return jnp.sum(toks)  # scalar checksum forces full execution on fetch

    float(decode_checksum(params, prefix))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(decode_checksum(params, prefix))  # scalar fetch = hard sync
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _bench_engine_default(cfg, params, batch: int = 2 * BATCH,
                          filter_method: str = "fused"):
    """decode/engine.generate with reference-default sampling, at the
    headline batch 512 — the fused Pallas filter+sampler
    (ops/pallas/fused_sampler.py) removed the per-step [B, V] filter
    passes that used to make B=512 scale super-linearly.

    Returns (engine_seconds, pipeline_seconds):
    - engine_seconds: prefix -> sampled captions (apples-to-apples with
      the raw greedy headline, which also starts from a prefix);
    - pipeline_seconds: CLIP embedding -> mapper -> captions, the full
      user path of cli/evaluate + cli/caption_me (adds the mapper's
      ~12.6 TFLOP at these shapes, ~0.1 s bf16)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import MapperConfig
    from clipcap_tpu.decode import engine
    from clipcap_tpu.models import gpt2, mapper

    map_cfg = MapperConfig(
        dim_clip=512, dim_embedding=cfg.n_embd, prefix_length=PREFIX_LEN,
        clip_length=10, num_layers=8, num_heads=8,
    )
    map_params = jax.jit(lambda k: mapper.init(k, map_cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(2)
    )
    clip_embed = jax.random.normal(jax.random.PRNGKey(3), (batch, 512), jnp.bfloat16)
    params_q = jax.jit(gpt2.quantize_params)(params)
    prefix_only = jax.jit(
        lambda mp, ce: mapper.apply(mp, ce, map_cfg).astype(jnp.bfloat16)
    )(map_params, clip_embed)

    # reference generate_no_beam sweep (inference.py:244) as one batch
    sweep = np.asarray([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9], np.float32)
    top_p_rows = jnp.asarray(np.resize(sweep, batch))
    settings = engine.GenerationSettings(
        max_new_tokens=NEW_TOKENS,
        top_p=top_p_rows,
        repetition_penalty=1.2,
        stop_token_id=13,  # '.' in the GPT-2 vocab (reference inference.py:237)
        # "fused" = the Pallas filter+sampler (the benched default);
        # "fused_step" additionally folds the repetition-penalty and
        # eos passes into the same kernel (opt-in, measured separately)
        filter_method=filter_method,
    )

    @jax.jit
    def run_engine(params_q, prefix):
        out = engine.generate(
            gpt2.gpt2_int8, params_q, cfg, prefix, settings,
            rng=jax.random.PRNGKey(0),
        )
        return jnp.sum(out["tokens"]) + jnp.sum(out["lengths"])

    @jax.jit
    def run_pipeline(map_params, params_q, clip_embed):
        prefix = mapper.apply(map_params, clip_embed, map_cfg)
        out = engine.generate(
            gpt2.gpt2_int8, params_q, cfg, prefix.astype(jnp.bfloat16), settings,
            rng=jax.random.PRNGKey(0),
        )
        return jnp.sum(out["tokens"]) + jnp.sum(out["lengths"])

    def median(fn, *a):
        float(fn(*a))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*a))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    return (median(run_engine, params_q, prefix_only),
            median(run_pipeline, map_params, params_q, clip_embed))


def _bench_preprocess_e2e(n_images: int = 1536, batch: int = 128,
                          workers: int = 4, image_px: int = 256) -> float:
    """END-TO-END preprocessing: synthetic webdataset tar (real JPEGs) ->
    host decode + resize -> device normalize + ViT-B/32 encode -> npy
    shards on disk (tools/preprocess.py, the reference's create_dataset.py
    flow, README.md:5-22). Returns images/sec.

    This is the honest counterpart of _bench_vit_encode: on this 1-core
    host it is bound by JPEG decode, not by the device (which encodes at
    ~12k img/s) — reported separately so neither number stands in for the
    other."""
    import contextlib
    import io
    import shutil
    import sys
    import tarfile
    import tempfile

    import numpy as np
    from PIL import Image

    from clipcap_tpu.tools.preprocess import preprocess_dataset
    from clipcap_tpu.tokenizers import GPT2TokenizerWrapper
    from clipcap_tpu.tokenizers.bpe import bytes_to_unicode

    tmp = tempfile.mkdtemp(prefix="bench_prepro_")
    try:
        import json
        import os

        # synthetic vocab (the real gpt2 vocab files are not downloadable
        # here — see PARITY.md; tokenization is a trivial fraction of the
        # per-image cost either way)
        vdir = f"{tmp}/vocab"
        os.makedirs(vdir)
        base = list(bytes_to_unicode().values())
        with open(f"{vdir}/vocab.json", "w") as f:
            json.dump({t: i for i, t in enumerate(base + ["<|endoftext|>"])}, f)
        open(f"{vdir}/merges.txt", "w").write("\n")

        rng = np.random.default_rng(0)
        with tarfile.open(f"{tmp}/000.tar", "w") as tf:
            for idx in range(n_images):
                img = Image.fromarray(
                    rng.integers(0, 255, (image_px, image_px, 3), dtype=np.uint8)
                )
                buf = io.BytesIO()
                img.save(buf, format="JPEG", quality=85)
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{idx:06d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = f"a synthetic benchmark image number {idx}".encode()
                info = tarfile.TarInfo(f"{idx:06d}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))

        # keep stdout clean for the single JSON line
        with contextlib.redirect_stdout(sys.stderr):
            stats = preprocess_dataset(
                input_dataset=f"{tmp}/000.tar",
                output_folder=f"{tmp}/shards",
                input_format="webdataset",
                tokenizer=GPT2TokenizerWrapper.create(vdir),
                batch_size=batch,
                num_prepro_workers=workers,
                max_token_length=32,
                shard_size=n_images,
            )
        return stats["ips"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _bench_vit_encode(batch: int = 256, iters: int = 10,
                      variant: str = "ViT-B/32") -> float:
    """Second headline (BASELINE.md): ViT image-encode throughput —
    the DEVICE half only of the webdataset->embedding-shards preprocessor
    (random device-resident tensors in, no JPEG decode / host transfer;
    see _bench_preprocess_e2e for the end-to-end rate).

    variant "ViT-B/32" is the config #1 encoder; "ViT-L/14" is config #3's
    (24 layers, width 1024, T=257 — the geometry VERDICT r3 weak #6 wanted
    measured; use batch 128 there, the 7x patch count needs the smaller
    step).

    bf16 only: the opt-in int8 encode loses ~8% at 768-wide matmuls (the
    dynamic activation-quant + dequant overhead exceeds the MXU gain at
    this arithmetic intensity; measured 10.4k vs 11.3k img/s) so it is
    not benched. int8 remains where it wins: HBM-bound decode.
    """
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import ViTConfig
    from clipcap_tpu.models import vit

    cfg = ViTConfig.clip_variant(variant)
    params = jax.jit(lambda k: vit.init(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    pixels = jax.jit(
        lambda k: jax.random.normal(k, (batch, 3, 224, 224), jnp.bfloat16)
    )(jax.random.PRNGKey(1))

    @jax.jit
    def encode_checksum(params, px):
        return jnp.sum(vit.apply(params, cfg, px, output="pooled"))

    float(encode_checksum(params, pixels))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        r = encode_checksum(params, pixels)
    float(r)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def _bench_genb_synthesis(sample_count: int = 40, iters: int = 3) -> float:
    """Gen-B: 40-candidate BLIP-base @384 heterogeneous synthesis per image
    (reference sampling.py:283-326 / caption_me.py), ms/image. Random-init
    weights; per-sample top_p/min/max-len grids like caption_me defaults."""
    import math

    import numpy as np
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import BlipTextConfig, ViTConfig
    from clipcap_tpu.decode import hetero
    from clipcap_tpu.models import blip_text, vit

    vit_cfg = ViTConfig.blip_variant("ViT-B")
    text_cfg = BlipTextConfig()
    vit_params = jax.jit(lambda k: vit.init(k, vit_cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    text_params = jax.jit(lambda k: blip_text.init(k, text_cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(1)
    )

    class _Tok:
        bos_token_id = 101
        sep_token_id = 102
        pad_token_id = 0
        all_special_ids = (0, 100, 101, 102, 103)

        def encode(self, s, add_special_tokens=True):
            return [101, 1037, 3861, 1997, 102]  # "a picture of"

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    pixels = jax.random.normal(
        jax.random.PRNGKey(2), (1, 3, vit_cfg.image_size, vit_cfg.image_size),
        jnp.bfloat16,
    )
    image_embeds = jax.jit(
        lambda px: vit.apply(vit_params, vit_cfg, px, output="tokens")
    )(pixels)

    n = sample_count
    top_p = jnp.asarray(np.resize([0.3, 0.5, 0.7, 0.9], n).astype(np.float32))
    min_len = jnp.asarray(np.resize([5, 10, 15, 20], n).astype(np.int32))
    max_len = jnp.asarray(np.resize([20, 25, 30], n).astype(np.int32))

    def one(i):
        return hetero.sample(
            image_embeds, text_params, text_cfg, _Tok(), sample_count=n,
            top_p=top_p, top_k=2500.0, min_len=min_len, max_len=max_len,
            repetition_penalty=1.3, force_eos_log_prob=math.log(0.9),
            rng=jax.random.PRNGKey(i),
        )

    one(0)  # compile
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        one(i + 1)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000.0


def _bench_gptj_6b_int8(batch: int = 256) -> float:
    """BASELINE config #4's model on ONE chip: GPT-J 6B greedy decode,
    int8 weights + int8 KV. 6B bf16 is 12.1 GB of weights streamed per
    token — int8 (6.05 GB) plus the quantized cache is what makes
    single-chip 6B decode throughput-viable at all. Weight VALUES are
    fabricated directly in quantized form (random int8, unit scales):
    a throughput measurement needs the real shapes and dtypes, not real
    checkpoints (none are downloadable here — see PARITY.md).
    Returns captions/sec."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import GPTJConfig
    from clipcap_tpu.models import gptj

    cfg = GPTJConfig.variant("gpt-j-6B")
    d, l, v = cfg.n_embd, cfg.n_layer, cfg.vocab_size

    def qw(key, shape):
        # scales match quantize_weight's layout: all dims but the
        # contraction axis ([L, in, out] -> [L, out])
        return {
            "q": jax.random.randint(key, shape, -127, 128, jnp.int8),
            "s": jnp.full(shape[:-2] + shape[-1:], 1e-3, jnp.float32),
        }

    @jax.jit
    def fabricate(key):
        ks = jax.random.split(key, 8)
        return {
            "wte": (jax.random.normal(ks[0], (v, d), jnp.bfloat16) * 0.02),
            "ln_f": {"g": jnp.ones((d,), jnp.bfloat16), "b": jnp.zeros((d,), jnp.bfloat16)},
            "blocks": {
                "ln1": {"g": jnp.ones((l, d), jnp.bfloat16), "b": jnp.zeros((l, d), jnp.bfloat16)},
                "attn": {k: qw(ks[i + 1], (l, d, d))
                         for i, k in enumerate(("wq", "wk", "wv", "wo"))},
                "mlp": {
                    "w_in": qw(ks[5], (l, d, 4 * d)),
                    "b_in": jnp.zeros((l, 4 * d), jnp.bfloat16),
                    "w_out": qw(ks[6], (l, 4 * d, d)),
                    "b_out": jnp.zeros((l, d), jnp.bfloat16),
                },
            },
            "lm_head": {"w": qw(ks[7], (d, v)), "b": jnp.zeros((v,), jnp.bfloat16)},
        }

    params = fabricate(jax.random.PRNGKey(0))
    total_len = PREFIX_LEN + NEW_TOKENS
    prefix = jax.random.normal(
        jax.random.PRNGKey(1), (batch, PREFIX_LEN, d), jnp.bfloat16
    )

    @jax.jit
    def decode_checksum(params, prefix):
        cache = gptj.init_cache_q8(cfg, batch=batch, max_len=total_len)
        logits, cache = gptj.prefill_q8(params, cfg, prefix, cache)
        tok = jnp.argmax(logits[:, -1], axis=-1)

        def body(carry, _):
            tok, cache = carry
            emb = gptj.embed_tokens(params, tok)[:, None, :].astype(jnp.bfloat16)
            lg, cache = gptj.decode_step_q8(params, cfg, emb, cache)
            nxt = jnp.argmax(lg, axis=-1)
            return (nxt, cache), nxt

        (_, _), toks = jax.lax.scan(body, (tok, cache), None, length=NEW_TOKENS - 1)
        return jnp.sum(toks)

    float(decode_checksum(params, prefix))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(decode_checksum(params, prefix))
        times.append(time.perf_counter() - t0)
    times.sort()
    return batch / times[len(times) // 2]


def _bench_t0_11b_int8_decode(batch: int = 64, enc_len: int = 40) -> float:
    """PARITY.md's claim on-chip: a T0-11B-class decoder (T5 v1.1 XXL
    geometry, 22 GB bf16) only FITS this 16 GB chip as int8 — prove it by
    fabricating int8 params at the real shapes and measuring greedy
    decode throughput (captions/sec). Weight VALUES are random int8 with
    unit scales (throughput needs shapes + dtypes, not checkpoints);
    enc_hidden is random (decode-only: the encoder runs once per batch
    and is not the steady-state stream)."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import T5Config
    from clipcap_tpu.models import t5

    cfg = T5Config.variant("t0-11b")
    d, f, l, v = cfg.d_model, cfg.d_ff, cfg.num_decoder_layers, cfg.vocab_size
    inner = cfg.num_heads * cfg.d_kv

    def qw(key, shape):
        return {
            "q": jax.random.randint(key, shape, -127, 128, jnp.int8),
            "s": jnp.full(shape[:-2] + shape[-1:], 1e-3, jnp.float32),
        }

    @jax.jit
    def fabricate(key):
        ks = jax.random.split(key, 12)
        ones = lambda shape: jnp.ones(shape, jnp.bfloat16)

        def attn_block(k):
            k1, k2, k3, k4 = jax.random.split(k, 4)
            return {"wq": qw(k1, (l, d, inner)), "wk": qw(k2, (l, d, inner)),
                    "wv": qw(k3, (l, d, inner)), "wo": qw(k4, (l, inner, d))}

        return {
            "shared": jax.random.normal(ks[0], (v, d), jnp.bfloat16) * 0.02,
            "decoder": {
                "blocks": {
                    "ln1": {"g": ones((l, d))},
                    "self_attn": attn_block(ks[1]),
                    "ln2": {"g": ones((l, d))},
                    "cross_attn": attn_block(ks[2]),
                    "ln3": {"g": ones((l, d))},
                    "mlp": {"wi_0": qw(ks[3], (l, d, f)),
                            "wi_1": qw(ks[4], (l, d, f)),
                            "wo": qw(ks[5], (l, f, d))},
                },
                "rel_bias": jax.random.normal(
                    ks[6], (cfg.relative_attention_num_buckets, cfg.num_heads),
                    jnp.bfloat16),
                "ln_f": {"g": ones((d,))},
            },
            "lm_head": {"w": qw(ks[7], (d, v))},
        }

    params = fabricate(jax.random.PRNGKey(0))
    total_len = enc_len + NEW_TOKENS
    enc_hidden = jax.random.normal(
        jax.random.PRNGKey(1), (batch, enc_len, d), jnp.bfloat16
    )

    @jax.jit
    def decode_checksum(params, enc_hidden):
        cache = t5.init_cache(cfg, batch=batch, max_len=total_len,
                              dtype=jnp.bfloat16)
        cache = cache._replace(enc_hidden=enc_hidden)
        tok = jnp.zeros((batch,), jnp.int32)

        def body(carry, _):
            tok, cache = carry
            emb = t5.embed_tokens(params, tok)[:, None, :].astype(jnp.bfloat16)
            lg, cache = t5.decode_step(params, cfg, emb, cache)
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt

        (_, _), toks = jax.lax.scan(body, (tok, cache), None, length=NEW_TOKENS)
        return jnp.sum(toks)

    float(decode_checksum(params, enc_hidden))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(decode_checksum(params, enc_hidden))
        times.append(time.perf_counter() - t0)
    times.sort()
    return batch / times[len(times) // 2]


def _bench_speculative(g: int = 4) -> dict:
    """Speculative greedy decoding evidence (decode/speculative.py):
    batch-1 tokens/sec for plain greedy vs self-draft (the target drafts
    for itself -> 100% acceptance: the machinery's CEILING given equal
    draft/target cost) vs an adversarial draft (different random weights,
    near-zero acceptance: the overhead FLOOR), plus the analytic ceiling
    with the measured small-draft step cost. GPT2-XL bf16 target,
    GPT-2-small bf16 draft."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import GPT2Config
    from clipcap_tpu.decode.speculative import speculative_greedy
    from clipcap_tpu.models import gpt2

    xl = GPT2Config.variant("gpt2-xl")
    small = GPT2Config.variant("gpt2")
    xl_params = jax.jit(lambda k: gpt2.init(k, xl, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    small_params = jax.jit(lambda k: gpt2.init(k, small, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(1))
    n = 64
    prefix = jax.random.normal(jax.random.PRNGKey(2), (1, 8, xl.n_embd),
                               jnp.bfloat16)
    prefix_small = jax.random.normal(jax.random.PRNGKey(2), (1, 8, small.n_embd),
                                     jnp.bfloat16)

    def timed(fn, *a):
        r = fn(*a)  # compile; sync below via the scalar fetch
        float(jnp.sum(r["tokens"] if isinstance(r, dict) else r))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(*a)
            float(jnp.sum(r["tokens"] if isinstance(r, dict) else r))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[1]

    def make_plain(cfg):
        @jax.jit
        def plain(params, prefix):
            cache = gpt2.init_cache(cfg, batch=1, max_len=8 + n,
                                    dtype=jnp.bfloat16)
            logits, cache = gpt2.prefill(params, cfg, prefix, cache)
            tok = jnp.argmax(logits[:, -1], axis=-1)

            def body(carry, _):
                tok, cache = carry
                emb = gpt2.embed_tokens(params, tok)[:, None, :].astype(jnp.bfloat16)
                lg, cache = gpt2.decode_step(params, cfg, emb, cache)
                return (jnp.argmax(lg, axis=-1), cache), tok

            (_, _), toks = jax.lax.scan(body, (tok, cache), None, length=n)
            return toks

        return plain

    plain = make_plain(xl)
    plain_small = make_plain(small)

    @jax.jit
    def spec_self(xl_params, prefix):
        return speculative_greedy(
            gpt2, xl_params, xl, gpt2, xl_params, xl, prefix, prefix,
            max_new_tokens=n, gamma=g)

    @jax.jit
    def spec_adv(xl_params, small_params, prefix, prefix_small):
        return speculative_greedy(
            gpt2, xl_params, xl, gpt2, small_params, small,
            prefix, prefix_small, max_new_tokens=n, gamma=g)

    t_plain = timed(plain, xl_params, prefix)
    t_small = timed(plain_small, small_params, prefix_small)
    t_self = timed(spec_self, xl_params, prefix)
    t_adv = timed(spec_adv, xl_params, small_params, prefix, prefix_small)
    # analytic small-draft ceiling at 100% acceptance: per emitted token,
    # one draft step plus 1/g of a g-wide target verify; the verify streams
    # the same weights/KV as one decode step (bandwidth-bound at batch 1),
    # so t_verify ~= t_plain_step
    ceiling = (t_small + t_plain / g) / n * 1000
    return {
        "plain_ms_per_token": round(t_plain / n * 1000, 2),
        "small_draft_plain_ms_per_token": round(t_small / n * 1000, 2),
        "self_draft_ms_per_token": round(t_self / n * 1000, 2),
        "adversarial_draft_ms_per_token": round(t_adv / n * 1000, 2),
        "analytic_small_draft_ceiling_ms_per_token": round(ceiling, 2),
        "g": g,
    }


def _bench_speculative_distilled(g: int = 4, n_prompts: int = 4096,
                                 pfx: int = 8, rollout: int = 40,
                                 train_steps: int = 400,
                                 train_batch: int = 128,
                                 n_eval: int = 8,
                                 xl_cfg=None, dr_cfg=None) -> dict:
    """REALIZED speculative decode (VERDICT r4 item 5): distill a
    GPT-2-small draft on the random-weight XL target's OWN greedy
    trajectories, then measure actual end-to-end ms/token and the
    acceptance (tokens/chunk) curve vs training steps.

    The draft trains with teacher-forced CE on XL greedy rollouts from
    random token prefixes — exactly the on-policy distribution
    speculative verification walks, so per-position agreement is the
    trained objective. Greedy spec output == plain XL greedy for ANY
    draft (tests/test_speculative.py); the draft only buys speed, and
    break-even on this chip is ~1.6 accepted tokens per gamma=4 chunk
    (CLAUDE.md). HONESTY NOTE: a random-weight XL's greedy trajectories
    are low-entropy (greedy attractors), so acceptance here upper-bounds
    what a real checkpoint pair would give — the number demonstrates the
    MACHINERY realizes wins at measured acceptance, not that this
    acceptance transfers to real weights."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from clipcap_tpu.core.config import GPT2Config
    from clipcap_tpu.decode.speculative import speculative_greedy
    from clipcap_tpu.models import gpt2

    xl = xl_cfg or GPT2Config.variant("gpt2-xl")
    dr = dr_cfg or GPT2Config.variant("gpt2")
    xl_params = jax.jit(lambda k: gpt2.init(k, xl, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))

    # ---- teacher trajectories: XL greedy rollouts from random prefixes
    rb = min(256, n_prompts)

    @jax.jit
    def rollout_fn(params, toks):
        emb = gpt2.embed_tokens(params, toks).astype(jnp.bfloat16)
        cache = gpt2.init_cache(xl, batch=rb, max_len=pfx + rollout,
                                dtype=jnp.bfloat16)
        logits, cache = gpt2.prefill(params, xl, emb, cache)
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

        def body(carry, _):
            tok, cache = carry
            e = gpt2.embed_tokens(params, tok)[:, None, :].astype(jnp.bfloat16)
            lg, cache = gpt2.decode_step(params, xl, e, cache)
            return (jnp.argmax(lg, axis=-1).astype(jnp.int32), cache), tok

        (_, _), out = jax.lax.scan(body, (tok, cache), None, length=rollout)
        return out.T  # [rb, rollout]

    host_rng = np.random.default_rng(0)
    prompts = host_rng.integers(0, xl.vocab_size, size=(n_prompts, pfx),
                                dtype=np.int32)
    rows = []
    for i in range(0, n_prompts, rb):
        rows.append(np.asarray(jax.device_get(
            rollout_fn(xl_params, jnp.asarray(prompts[i:i + rb])))))
    data = jnp.asarray(
        np.concatenate([prompts, np.concatenate(rows)], axis=1))  # [n, T]

    # ---- draft: GPT-2-small geometry, f32 AdamW CE on rollout positions
    draft = jax.jit(lambda k: gpt2.init(k, dr, dtype=jnp.float32))(
        jax.random.PRNGKey(7))
    opt = optax.adamw(3e-4, weight_decay=0.01)
    opt_state = jax.jit(opt.init)(draft)

    def loss_mean(params, batch_toks):
        emb = gpt2.embed_tokens(params, batch_toks[:, :-1])
        logits = gpt2.apply(params, dr, emb, remat=True)
        labels = batch_toks[:, 1:]
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lsm, labels[..., None], axis=-1)[..., 0]
        mask = (jnp.arange(labels.shape[1]) >= pfx - 1)[None, :]
        return jnp.sum(nll * mask) / jnp.sum(mask * jnp.ones_like(nll))

    k_per = 50  # steps per dispatch (each synced dispatch pays the relay)

    @jax.jit
    def train_k(params, opt_state, data, step0):
        def one(carry, i):
            params, opt_state = carry
            idx = (i * train_batch + jnp.arange(train_batch)) % data.shape[0]
            batch = jnp.take(data, idx, axis=0)
            loss, grads = jax.value_and_grad(loss_mean)(params, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), step0 + jnp.arange(k_per))
        return params, opt_state, losses[-1]

    # ---- speculative acceptance/latency at a draft checkpoint
    eval_prompts = host_rng.integers(0, xl.vocab_size, size=(n_eval, 1, pfx),
                                     dtype=np.int32)
    n_dec = 48

    @jax.jit
    def spec(xl_params, d_params, toks):
        tp = gpt2.embed_tokens(xl_params, toks).astype(jnp.bfloat16)
        dp = gpt2.embed_tokens(d_params, toks).astype(jnp.bfloat16)
        return speculative_greedy(
            gpt2, xl_params, xl, gpt2, d_params, dr, tp, dp,
            max_new_tokens=n_dec, gamma=g)

    cast_bf16 = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), p))

    def measure(d_params_f32):
        d_bf16 = cast_bf16(d_params_f32)  # ONE dispatch (eager per-leaf
        # casts would pay a relay round-trip per tensor)
        tpc, times = [], []
        for i in range(n_eval):
            toks = jnp.asarray(eval_prompts[i])
            out = spec(xl_params, d_bf16, toks)
            ln, ch = jax.device_get((out["lengths"], out["chunks"]))
            tpc.append(float(ln[0]) / float(ch[0]))
            t0 = time.perf_counter()
            out = spec(xl_params, d_bf16, toks)
            ln2 = int(jax.device_get(out["lengths"])[0])
            times.append((time.perf_counter() - t0) / max(ln2, 1))
        return (round(float(np.mean(tpc)), 2),
                round(float(np.median(times)) * 1000, 2))

    curve = []
    tpc0, ms0 = measure(draft)
    curve.append({"train_steps": 0, "tokens_per_chunk": tpc0,
                  "ms_per_token": ms0})
    step = 0
    last_loss = None
    while step < train_steps:
        draft, opt_state, last_loss = train_k(
            draft, opt_state, data, jnp.asarray(step, jnp.int32))
        step += k_per
        if step in (k_per * 2, train_steps) or step >= train_steps:
            tpc, ms = measure(draft)
            curve.append({"train_steps": step, "tokens_per_chunk": tpc,
                          "ms_per_token": ms, "train_loss":
                          round(float(jax.device_get(last_loss)), 3)})
            if step >= train_steps:
                break

    # plain XL greedy batch-1 baseline on the same prompt shape
    @jax.jit
    def plain(params, toks):
        emb = gpt2.embed_tokens(params, toks).astype(jnp.bfloat16)
        cache = gpt2.init_cache(xl, batch=1, max_len=pfx + n_dec,
                                dtype=jnp.bfloat16)
        logits, cache = gpt2.prefill(params, xl, emb, cache)
        tok = jnp.argmax(logits[:, -1], axis=-1)

        def body(carry, _):
            tok, cache = carry
            e = gpt2.embed_tokens(params, tok)[:, None, :].astype(jnp.bfloat16)
            lg, cache = gpt2.decode_step(params, xl, e, cache)
            return (jnp.argmax(lg, axis=-1), cache), tok

        (_, _), toks_out = jax.lax.scan(body, (tok, cache), None, length=n_dec)
        return toks_out

    toks0 = jnp.asarray(eval_prompts[0])
    float(jnp.sum(plain(xl_params, toks0)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(plain(xl_params, toks0)))
        ts.append(time.perf_counter() - t0)
    plain_ms = sorted(ts)[1] / n_dec * 1000

    final = curve[-1]
    return {
        "plain_ms_per_token": round(plain_ms, 2),
        "realized_ms_per_token": final["ms_per_token"],
        "realized_speedup": round(plain_ms / final["ms_per_token"], 2),
        "tokens_per_chunk": final["tokens_per_chunk"],
        "break_even_tokens_per_chunk": 1.6,
        "acceptance_curve": curve,
        "g": g,
        "draft": "gpt2-small geometry distilled on XL greedy rollouts "
                 "(see docstring honesty note)",
    }


SERVE_MAX_NEW = 67  # the reference decode contract: entry_length=67
                    # (/root/reference/inference.py:225) with natural EOS


def _bench_serving(cfg, params_q, slots: int = 2 * BATCH,
                   n_requests: int = 2048, pipeline_depth: int = 2,
                   include_static: bool = True,
                   admission: str = "length",
                   declared_max: int = 0) -> dict:
    """Continuous batching (decode/serving.py) vs the static engine on the
    reference production decode contract: entry_length=67 as the hard cap
    (reference inference.py:225), with requests finishing at natural-EOS
    caption lengths — modeled as per-request caps ~N(12,4) clipped to
    [5,30], matching real COCO caption token-length statistics (captions
    essentially always EOS well before the safety cap; a workload with
    never-EOS stragglers would erode FIFO-retire serving — see
    decode/serving.py). GPT2-XL int8, reference-default sampling via the
    fused Pallas filter+sampler.

    The static engine cannot know EOS positions in advance, so it pays
    all 67 steps per batch; serving refills finished slots from the
    queue, so its cost tracks the MEAN length. Prefixes live in a
    device-resident pool (the production shape — mapper output stays on
    device), so refills gather rather than upload. Trajectories are
    deterministic (fixed rngs), so the timed second run replays the
    first's executable mix."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.decode import engine
    from clipcap_tpu.decode.serving import Request, ServingEngine
    from clipcap_tpu.models import gpt2

    pool = jax.random.normal(
        jax.random.PRNGKey(5), (n_requests, PREFIX_LEN, cfg.n_embd), jnp.bfloat16
    )
    host_rng = np.random.default_rng(0)
    caps = np.clip(np.round(host_rng.normal(12.0, 4.0, n_requests)),
                   5, 30).astype(np.int32)

    settings = engine.GenerationSettings(
        max_new_tokens=SERVE_MAX_NEW,
        top_p=0.8,
        repetition_penalty=1.2,
        eos_token_id=50256,
        stop_token_id=13,
        # the whole per-step logit pipeline (penalty/EOS gate/filter/
        # sample) in the Pallas sampler — same choice as the fastest
        # engine path; falls back to threshold off-TPU
        filter_method="fused_step",
    )

    # fixed steps_per_sync=8 chunks (the engine default): the opt-in
    # cap-aligned chunk ladder was measured WORSE here — 293 c/s vs 414 —
    # because per-dispatch fixed costs and shrunken refill blocks dwarf
    # the ~19% zombie slot-steps it recovers (serving.py ctor note)
    serv = ServingEngine(
        gpt2.gpt2_int8, cfg, prefix_len=PREFIX_LEN, settings=settings,
        slots=slots, refill_size=64, steps_per_sync=8,
        # sparse ladder, biggest = slots//2: ONE big contiguous refill per
        # sync in steady state (serving.py FIFO retire)
        refill_sizes=(1, 16, 64, 256) if slots >= 512 else None,
        pipeline_depth=pipeline_depth,
        # declared_max>0: the caller-declared per-request cap bound sizes
        # the ring (serving.py max_request_length) — every decode step
        # streams the whole ring, so a declaration is ~proportional step
        # time off
        max_request_length=declared_max or None,
    )
    reqs = [Request(i, i, max_length=int(caps[i])) for i in range(n_requests)]

    def run_serving():
        # admission="length" sorts the look-ahead window by the known
        # per-request cap so FIFO-retired blocks hold near-equal lengths
        # (serving.py serve docstring); combined with eager cap-based
        # retirement this removes the zombie slot-steps that held r3's
        # serving at ~48% of its component roofline (VERDICT r3 weak #2)
        return serv.serve(reqs, params_q, rng=jax.random.PRNGKey(0),
                          prefix_pool=pool, admission=admission,
                          admission_lookahead=n_requests)

    # ---- static baseline: same requests in slot-sized batches, per-row
    # max_length vectors (the engine supports those), full scan per batch
    @jax.jit
    def run_static_batch(params_q, prefix, max_len_rows):
        out = engine.generate(
            gpt2.gpt2_int8, params_q, cfg, prefix,
            dataclasses.replace(settings, max_length=max_len_rows),
            rng=jax.random.PRNGKey(0),
        )
        return jnp.sum(out["tokens"]) + jnp.sum(out["lengths"])

    def run_static():
        for i in range(0, n_requests, slots):
            float(run_static_batch(params_q, pool[i:i + slots],
                                   jnp.asarray(caps[i:i + slots])))

    run_serving()  # compile (init/chunk/refill-size executables)
    t0 = time.perf_counter()
    results = run_serving()
    t_serving = time.perf_counter() - t0
    assert len(results) == n_requests
    lats = sorted(r["latency_s"] for r in results.values())
    stats = dict(serv.last_stats or {})

    # attribute the wall time (VERDICT r4 weak #2): time each executable
    # the run actually used, standalone (pipelined dispatches, one fetch —
    # a per-call sync floors at the ~30 ms relay round-trip), then
    # step_s/refill_s are counts x unit times and bubble_s is the rest
    # (un-hidden relay syncs + host scheduling on this 1-core box).
    def _time_exec(launch, reps=8):
        launch()  # warm (already compiled during the runs)
        t0 = time.perf_counter()
        out = [launch() for _ in range(reps)]
        jax.block_until_ready(out[-1])
        jax.device_get(out[-1])
        return (time.perf_counter() - t0) / reps

    t_unit = {}
    if stats.get("chunks"):
        b = serv.slots
        zeros = jnp.zeros((b, PREFIX_LEN, cfg.n_embd), serv.dtype)
        st = serv._init_fn(params_q, zeros, jnp.ones((b,), bool),
                           jnp.full((b,), 30, jnp.int32),
                           jax.random.PRNGKey(1))
        box = {"st": st}

        def chunk_launch(n):
            def go():
                box["st"], em, ev, su, nu = serv._chunk_exec(n)(
                    params_q, box["st"])
                return su
            return go

        step_s = 0.0
        for n, cnt in sorted(stats["chunks"].items()):
            t_unit[f"chunk{n}_ms"] = round(_time_exec(chunk_launch(n)) * 1e3, 2)
            step_s += cnt * t_unit[f"chunk{n}_ms"] / 1e3
        refill_s = 0.0
        for r, cnt in sorted(stats.get("refills", {}).items()):
            def refill_launch(r=r):
                def go():
                    box["st"] = serv._refill_jit(
                        r, params_q, box["st"], zeros[:r],
                        jnp.asarray(0, jnp.int32),
                        jnp.full((r,), 30, jnp.int32),
                        jnp.asarray(r, jnp.int32))
                    return box["st"].stops
                return go
            t_unit[f"refill{r}_ms"] = round(
                _time_exec(refill_launch(), reps=4) * 1e3, 2)
            refill_s += cnt * t_unit[f"refill{r}_ms"] / 1e3
        del box, st
        stats["phase_breakdown"] = {
            "step_s": round(step_s, 3),
            "refill_s": round(refill_s, 3),
            "bubble_s": round(max(t_serving - step_s - refill_s, 0.0), 3),
            "unit_times": t_unit,
        }

    t_static = None
    if include_static:
        run_static()  # compile
        t0 = time.perf_counter()
        run_static()
        t_static = time.perf_counter() - t0

    return {
        "serving_captions_per_sec": round(n_requests / t_serving, 1),
        # "is not None" (not truthiness): include_static=False must read as
        # "not measured", and a pathological 0.0 must not masquerade as it
        "static_engine_captions_per_sec": (
            round(n_requests / t_static, 1) if t_static is not None else None),
        "speedup": (round(t_static / t_serving, 3)
                    if t_static is not None else None),
        "pipeline_depth": pipeline_depth,
        "admission": admission,
        "declared_max_request_length": declared_max or None,
        "ring_len": serv.ring_len,
        # latency is stamped dispatch-to-harvest and so includes up to
        # pipeline_depth chunks of pipeline lag — compare across runs only
        # at equal depth (serving.py serve docstring)
        "latency_p50_s": round(lats[len(lats) // 2], 3),
        "latency_p99_s": round(lats[min(len(lats) - 1, int(len(lats) * 0.99))], 3),
        "slots": slots,
        "workload": (
            f"entry_length={SERVE_MAX_NEW} hard cap (reference "
            "inference.py:225); natural-EOS lengths ~N(12,4) clip[5,30], "
            f"mean {float(caps.mean()):.1f} tokens"
        ),
        "n_requests": n_requests,
        # scheduling counters + wall attribution (serving.py last_stats;
        # occupancy = host-believed-live slot-steps / total, an upper bound)
        "sched": {
            "chunks": stats.get("chunks"),
            "refills": stats.get("refills"),
            "refill_pad_rows": stats.get("refill_pad_rows"),
            "occupancy": stats.get("occupancy"),
            "harvest_wait_s": round(stats.get("harvest_wait_s", 0.0), 3),
            "dispatch_s": round(stats.get("dispatch_s", 0.0), 3),
            "refill_dispatch_s": round(stats.get("refill_dispatch_s", 0.0), 3),
        },
        "phase_breakdown": stats.get("phase_breakdown"),
    }


def _bench_beam(cfg, params_q, beam_size: int = 5,
                batched_images: int = 64) -> dict:
    """Beam search (decode/beam.py — the reference generate_beam path,
    inference.py:70-148, which recomputes the full sequence per token per
    beam; here KV-cached with per-step slab reorder). Two numbers:

    - batch-1 latency (the reference contract) — weight-stream-bound, the
      MXU idles at 5 rows;
    - beam_search_batched throughput at `batched_images` x beam_size rows
      in ONE executable (block-diagonal per-image selection by iterated
      argmax, not lax.top_k's full sort) — the evaluate/infer beam
      workload shape (VERDICT r3 weak #3).

    int8 weights + int8 KV."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.decode.beam import beam_search, beam_search_batched
    from clipcap_tpu.models import gpt2

    prefix = jax.random.normal(
        jax.random.PRNGKey(7), (1, PREFIX_LEN, cfg.n_embd), jnp.bfloat16
    )

    @jax.jit
    def run(params_q, prefix):
        out = beam_search(
            gpt2.gpt2_int8, params_q, cfg, prefix, beam_size=beam_size,
            max_new_tokens=NEW_TOKENS, stop_token_id=13,
        )
        return jnp.sum(out["tokens"]) + jnp.sum(out["scores"])

    float(run(params_q, prefix))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params_q, prefix))
        ts.append(time.perf_counter() - t0)
    ts.sort()

    prefix_n = jax.random.normal(
        jax.random.PRNGKey(8), (batched_images, PREFIX_LEN, cfg.n_embd),
        jnp.bfloat16,
    )

    @jax.jit
    def run_batched(params_q, prefix_n):
        out = beam_search_batched(
            gpt2.gpt2_int8, params_q, cfg, prefix_n, beam_size=beam_size,
            max_new_tokens=NEW_TOKENS, stop_token_id=13,
        )
        return jnp.sum(out["tokens"]) + jnp.sum(out["scores"])

    float(run_batched(params_q, prefix_n))  # compile
    tb = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_batched(params_q, prefix_n))
        tb.append(time.perf_counter() - t0)
    tb.sort()

    return {
        "beam_size": beam_size,
        "caption_latency_ms": round(ts[1] * 1000, 1),
        "ms_per_token": round(ts[1] / NEW_TOKENS * 1000, 2),
        "batched_images": batched_images,
        "batched_captions_per_sec": round(batched_images / tb[1], 1),
        "batched_ms_per_image": round(tb[1] / batched_images * 1000, 2),
        "batched_vs_serial_speedup": round(
            (ts[1] * batched_images) / tb[1], 1),
    }


def _bench_config3_pipeline(cfg, params_q, n_beam_images: int = 64,
                            beam_size: int = 5,
                            nucleus_batch: int = 256,
                            vit_variant: str = "ViT-L/14") -> dict:
    """BASELINE config #3 composite: ViT-L/14 encode -> transformer mapper
    -> GPT2-XL int8 decode, END TO END in one flow (VERDICT r4 item 4 —
    both halves were benched separately; this is the pipeline number).

    Two decode modes, per the reference config ("ViT-L/14 + GPT2-XL
    inference with sampling.py beam search + nucleus decoding"):
    - nucleus: engine top-p 0.8 + repetition penalty (the reference
      generate_no_beam contract, inference.py:219-292) at nucleus_batch;
    - beam: beam_search_batched at n_beam_images x beam_size
      (inference.py:70-148 semantics).

    Encode+mapper run as one bf16 jit producing the prefix; the decode
    dispatch consumes it directly on device. Pixels are device-resident
    (host preprocess is _bench_preprocess_e2e's measurement)."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import MapperConfig, ViTConfig
    from clipcap_tpu.decode import engine
    from clipcap_tpu.decode.beam import beam_search_batched
    from clipcap_tpu.models import gpt2, mapper, vit

    vit_cfg = ViTConfig.clip_variant(vit_variant)
    vit_params = jax.jit(lambda k: vit.init(k, vit_cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    map_cfg = MapperConfig(
        dim_clip=vit_cfg.output_dim, dim_embedding=cfg.n_embd,
        prefix_length=PREFIX_LEN, clip_length=10, num_layers=8, num_heads=8,
    )
    map_params = jax.jit(lambda k: mapper.init(k, map_cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(1))

    @jax.jit
    def encode_project(vit_params, map_params, px):
        feats = vit.apply(vit_params, vit_cfg, px, output="pooled")
        return mapper.apply(map_params, feats, map_cfg).astype(jnp.bfloat16)

    settings = engine.GenerationSettings(
        max_new_tokens=NEW_TOKENS, top_p=0.8, repetition_penalty=1.2,
        stop_token_id=13, filter_method="fused",
    )

    @jax.jit
    def nucleus_decode(params_q, prefix):
        out = engine.generate(gpt2.gpt2_int8, params_q, cfg, prefix, settings,
                              rng=jax.random.PRNGKey(0))
        return jnp.sum(out["tokens"]) + jnp.sum(out["lengths"])

    @jax.jit
    def beam_decode(params_q, prefix):
        out = beam_search_batched(
            gpt2.gpt2_int8, params_q, cfg, prefix, beam_size=beam_size,
            max_new_tokens=NEW_TOKENS, stop_token_id=13,
        )
        return jnp.sum(out["tokens"]) + jnp.sum(out["scores"])

    def flow(px, decode_fn):
        prefix = encode_project(vit_params, map_params, px)
        return float(decode_fn(params_q, prefix))

    def timed(batch, decode_fn, seed):
        px = jax.jit(
            lambda k: jax.random.normal(k, (batch, 3, 224, 224), jnp.bfloat16)
        )(jax.random.PRNGKey(seed))
        flow(px, decode_fn)  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            flow(px, decode_fn)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[1]

    t_nuc = timed(nucleus_batch, nucleus_decode, 2)
    t_beam = timed(n_beam_images, beam_decode, 3)
    return {
        "nucleus_captions_per_sec": round(nucleus_batch / t_nuc, 1),
        "nucleus_batch": nucleus_batch,
        "beam_captions_per_sec": round(n_beam_images / t_beam, 1),
        "beam_images": n_beam_images,
        "beam_size": beam_size,
        "new_tokens": NEW_TOKENS,
        "note": ("ViT-L/14 encode + 8-layer mapper + GPT2-XL int8 decode, "
                 "one serial flow per batch (encode+mapper fused in one "
                 "bf16 jit)"),
    }


def _bench_single_caption_latency(cfg, params) -> float:
    """Serving latency: ONE caption (batch 1, int8 path) end to end —
    prefill + 32 greedy steps. BASELINE.md asks for p50 latency alongside
    the throughput headline; at batch 1 every step is a pure weight-stream
    (~1.6 GB int8 per token)."""
    import jax
    import jax.numpy as jnp

    prefix = jax.random.normal(
        jax.random.PRNGKey(7), (1, PREFIX_LEN, cfg.n_embd), jnp.bfloat16
    )
    return _bench_decode_raw(cfg, params, prefix, int8=True, batch=1) * 1000.0


def _bench_native_loader(rows: int = 8192, prefix_dim: int = 512,
                         tok_len: int = 128, batch: int = 256) -> float:
    """C++ shard loader throughput (native/npy_loader.cpp): background
    prefetch thread feeding pre-batched rows (the TokenPrefixDataset
    replacement, reference dataset.py:76-180). Returns rows/sec; 0.0 if
    the native library can't build on this host."""
    import shutil
    import tempfile

    import numpy as np

    try:
        from clipcap_tpu.data.native_loader import (
            NativeTokenPrefixDataset, build_native,
        )
        if build_native() is None:
            return 0.0
    except Exception:
        return 0.0

    tmp = tempfile.mkdtemp(prefix="bench_shards_")
    try:
        import os

        os.makedirs(f"{tmp}/prefixes"), os.makedirs(f"{tmp}/tokens")
        rng = np.random.default_rng(0)
        per_shard = rows // 4
        for s in range(4):
            np.save(f"{tmp}/prefixes/{s:03d}.npy",
                    rng.normal(size=(per_shard, prefix_dim)).astype(np.float32))
            np.save(f"{tmp}/tokens/{s:03d}.npy",
                    rng.integers(0, 50257, size=(per_shard, tok_len)).astype(np.int64))
        loader = NativeTokenPrefixDataset(tmp, batch_size=batch)
        n_batches = rows // batch
        it = iter(loader)
        next(it)  # warm the prefetch thread
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(it)
        dt = time.perf_counter() - t0
        loader.close()
        return n_batches * batch / dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _train_matmul_flops(lm_cfg, map_cfg, batch: int, seq: int,
                        prefix_only: bool) -> float:
    """Analytic matmul FLOPs per training step (fwd + bwd).

    Backward model: every fwd weight matmul costs 1x (dX) + 1x (dW) on the
    way back; prefix-only training skips the LM/head dW terms
    (stop_gradient at the source, train/train_step.py loss_fn) so the LM
    backward is 1x fwd instead of 2x. Attention (no weights) costs 2x fwd
    either way.
    """
    d, L, V = lm_cfg.n_embd, lm_cfg.n_layer, lm_cfg.vocab_size
    p = map_cfg.prefix_length
    T, B = p + seq, batch
    lm_lin = 2.0 * B * T * 12 * d * d * L      # qkv + proj + 2 mlp matmuls
    attn = 4.0 * B * T * T * d * L             # scores + weighted sum
    head = 2.0 * B * seq * d * V               # logits_slice: seq positions
    md, mT = map_cfg.dim_embedding, map_cfg.prefix_length + map_cfg.clip_length
    mapper = 2.0 * B * mT * 12 * md * md * map_cfg.num_layers
    lm_bwd_x = 2.0 if prefix_only else 3.0     # fwd + dX (+ dW if trained)
    return (lm_lin + head) * lm_bwd_x + attn * 3.0 + mapper * 3.0


def _bench_train_step(batch: int = 128, seq: int = 40,
                      lm_variant: str = "gpt2", prefix_only: bool = False,
                      prefix_len: int = 10, k_steps: int = 10, reps: int = 3):
    """Training-step throughput. Defaults = BASELINE config #1
    (ViT-B/32-prefix + GPT-2 small prefix training over precomputed
    shards); config #2 = gpt2-xl prefix_only (the reference's headline
    training run, train.py:236-245). Returns (steps/sec, tokens/sec, mfu).

    k_steps train steps run inside ONE jit (lax.scan over the donated
    state carry, constant batch — the carry changes every step so nothing
    hoists) so the ~30 ms relay dispatch cost is amortized away and the
    number is the DEVICE rate; one residual round-trip is subtracted.
    MFU = analytic matmul FLOPs (_train_matmul_flops) / time / 175 TF/s
    (this chip's measured bf16 peak, CLAUDE.md performance facts).
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import (
        CaptionerConfig, GPT2Config, MapperConfig, TrainConfig,
    )
    from clipcap_tpu.train import create_train_state, make_train_step

    lm_cfg = GPT2Config.variant(lm_variant)
    map_cfg = MapperConfig(dim_clip=512, dim_embedding=lm_cfg.n_embd,
                           prefix_length=prefix_len, clip_length=10)
    cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=map_cfg,
                              prefix_only=prefix_only)
    train_cfg = TrainConfig(
        optimizer_lr=2e-5, scheduler_warmup_steps=100, total_steps=10_000,
        gradient_clip_val=-1.0, bf16_compute=True,
    )

    state, tx = create_train_state(jax.random.PRNGKey(0), cap_cfg, lm_cfg, train_cfg)
    step_fn = make_train_step(cap_cfg, lm_cfg, train_cfg, tx, donate=False)

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, lm_cfg.vocab_size, size=(batch, seq)).astype(np.int64)
    tokens[:, -5:] = -1
    batch_data = {
        "tokens": jnp.asarray(tokens),
        "prefix": jnp.asarray(rng.normal(size=(batch, 512)).astype(np.float32)),
    }

    def many(st, _):
        def body(st, _):
            st, m = step_fn(st, batch_data)
            return st, m["loss"]
        return jax.lax.scan(body, st, None, length=k_steps)

    many_j = jax.jit(many, donate_argnums=(0,))
    state, losses = many_j(state, 0)
    float(losses[-1])  # compile + settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, losses = many_j(state, 0)
        float(losses[-1])
        best = min(best, time.perf_counter() - t0)
    dt = max(best - 0.030, 1e-9) / k_steps  # one relay round-trip total
    flops = _train_matmul_flops(lm_cfg, map_cfg, batch, seq, prefix_only)
    mfu = flops / dt / 175e12
    return 1.0 / dt, batch * seq / dt, mfu


def _bench_gptj_prefix_train(batch: int = 16, seq: int = 40,
                             prefix_len: int = 40, mapper_layers: int = 2,
                             k_steps: int = 3, reps: int = 2):
    """BASELINE config #4's TRAINING half: GPT-J 6B prefix-only tuning
    (reference train.py:236-245 with --language-model gpt-j).

    The reference's FULL mapper geometry (8 transformer layers at the LM
    width d=4096, layers/Transformer.py:133-161 default) is 1.63B
    TRAINABLE params — 19.6 GB of f32 master + AdamW moment state before
    the frozen LM is even resident, so it cannot fit one 16 GB chip at any
    LM precision. The reference hits the same wall: it trains this config
    under DeepSpeed ZeRO (train.py strategy flags;
    utils/deepspeed_state_dicts_gen.py exists to consolidate those
    shards). Our equivalent is ZeRO sharding over the mesh
    (parallel/sharding.py, exercised in dryrun_multichip); this bench
    returns (a) that arithmetic and (b) a measured single-chip datapoint
    at the largest fitting geometry: mapper_layers=2 (0.42B trainable,
    5.1 GB optimizer state) over an int8 frozen LM (6.05 GB) whose
    training forward is gptj.apply_q8 (W8A16, dequant-in-scan), remat on,
    f32 masters only for the mapper. Returns a dict (None on OOM)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import (
        CaptionerConfig, GPTJConfig, MapperConfig, TrainConfig,
    )
    from clipcap_tpu.models import captioner
    from clipcap_tpu.train import create_train_state, make_train_step

    lm_cfg = GPTJConfig.variant("gptj")
    d = lm_cfg.n_embd
    full_trainable = 12 * d * d * 8 + 512 * d * 10  # 8-layer mapper + proj
    analysis = {
        "full_geometry_mapper_layers": 8,
        "full_geometry_trainable_params_b": round(full_trainable / 1e9, 2),
        "full_geometry_optimizer_state_gb": round(full_trainable * 12 / 1e9, 1),
        "fits_single_chip": False,
        "note": ("f32 master+mu+nu = 12 B/trainable-param > 16 GB HBM alone; "
                 "reference needs DeepSpeed ZeRO for this config too — TPU "
                 "path is ZeRO over the mesh (parallel/sharding.py)"),
    }

    map_cfg = MapperConfig(dim_clip=512, dim_embedding=d,
                           prefix_length=prefix_len, clip_length=10,
                           num_layers=mapper_layers)
    cap_cfg = CaptionerConfig(lm_type="gpt-j", mapper=map_cfg,
                              prefix_only=True)
    train_cfg = TrainConfig(
        optimizer_lr=2e-5, scheduler_warmup_steps=100, total_steps=10_000,
        gradient_clip_val=-1.0, bf16_compute=True, remat=True,
    )
    # mapper f32 (gets masters), LM fabricated directly in int8 — a bf16
    # init (12 GB) + quantize (6 GB) in one jit peaks past HBM (CLAUDE.md);
    # a train-step timing needs real shapes/dtypes, not real checkpoints
    from clipcap_tpu.models import gptj, mapper as mapper_mod

    dl, v = lm_cfg.n_layer, lm_cfg.vocab_size

    def qw(key, shape):
        return {
            "q": jax.random.randint(key, shape, -127, 128, jnp.int8),
            "s": jnp.full(shape[:-2] + shape[-1:], 1e-3, jnp.float32),
        }

    @jax.jit
    def fabricate_lm(key):
        ks = jax.random.split(key, 8)
        return {
            "wte": (jax.random.normal(ks[0], (v, d), jnp.bfloat16) * 0.02),
            "ln_f": {"g": jnp.ones((d,), jnp.bfloat16), "b": jnp.zeros((d,), jnp.bfloat16)},
            "blocks": {
                "ln1": {"g": jnp.ones((dl, d), jnp.bfloat16), "b": jnp.zeros((dl, d), jnp.bfloat16)},
                "attn": {k: qw(ks[i + 1], (dl, d, d))
                         for i, k in enumerate(("wq", "wk", "wv", "wo"))},
                "mlp": {
                    "w_in": qw(ks[5], (dl, d, 4 * d)),
                    "b_in": jnp.zeros((dl, 4 * d), jnp.bfloat16),
                    "w_out": qw(ks[6], (dl, 4 * d, d)),
                    "b_out": jnp.zeros((dl, d), jnp.bfloat16),
                },
            },
            "lm_head": {"w": qw(ks[7], (d, v)), "b": jnp.zeros((v,), jnp.bfloat16)},
        }

    params = {
        "mapper": jax.jit(lambda k: mapper_mod.init(k, map_cfg))(
            jax.random.PRNGKey(0)),
        "lm": fabricate_lm(jax.random.PRNGKey(1)),
    }
    state, tx = create_train_state(jax.random.PRNGKey(0), cap_cfg, lm_cfg,
                                   train_cfg, params=params)
    del params

    def lm_apply(p, embeds, attention_mask=None, logits_slice=None):
        return gptj.apply_q8(p, lm_cfg, embeds, attention_mask=attention_mask,
                             remat=True, logits_slice=logits_slice)

    step_fn = make_train_step(cap_cfg, lm_cfg, train_cfg, tx, donate=False,
                              lm_apply=lm_apply)

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, lm_cfg.vocab_size, size=(batch, seq)).astype(np.int64)
    tokens[:, -5:] = -1
    batch_data = {
        "tokens": jnp.asarray(tokens),
        "prefix": jnp.asarray(rng.normal(size=(batch, 512)).astype(np.float32)),
    }

    def many(st, _):
        def body(st, _):
            st, m = step_fn(st, batch_data)
            return st, m["loss"]
        return jax.lax.scan(body, st, None, length=k_steps)

    many_j = jax.jit(many, donate_argnums=(0,))
    state, losses = many_j(state, 0)
    float(losses[-1])  # compile + settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, losses = many_j(state, 0)
        float(losses[-1])
        best = min(best, time.perf_counter() - t0)
    dt = max(best - 0.030, 1e-9) / k_steps
    flops = _train_matmul_flops(lm_cfg, map_cfg, batch, seq, prefix_only=True)
    return {
        **analysis,
        "measured_mapper_layers": mapper_layers,
        "measured_lm": "int8 frozen, W8A16 training fwd (gptj.apply_q8)",
        "measured_batch": batch,
        "steps_per_sec": round(1.0 / dt, 2),
        "mfu": round(flops / dt / 175e12, 3),
    }


def _bench_clip_guided(branching: int = 3, look_ahead: int = 2,
                       max_decode_length: int = 40, lm_cfg=None,
                       text_cfg=None) -> dict:
    """CLIP-guided lookahead decode (decode/clip_guided.py — the
    reference's generate_clip_guided, evaluate_model.py:183-310, its most
    expensive sampler and a cli/evaluate default): ms per image at
    reference-like settings. GPT2-XL int8 KV-cached tree (r5: the tree
    runs `depth` decode steps per chunk instead of whole-sequence
    forwards, and enable_int8_decode switches the steps to int8 weight
    streaming), real CLIP text tower doing the candidate scoring; the
    tokenizer is a synthetic id<->word map (lossless for timing:
    tokenize/decode cost is negligible next to the tree dispatches)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import (
        CaptionerConfig, CLIPTextConfig, GPT2Config, MapperConfig,
    )
    from clipcap_tpu.decode.clip_guided import generate_clip_guided
    from clipcap_tpu.models import captioner, clip_text, gpt2, mapper
    from clipcap_tpu.models.bundle import CaptionerBundle

    if lm_cfg is None:
        lm_cfg = GPT2Config.variant("gpt2-xl")
    if text_cfg is None:
        text_cfg = CLIPTextConfig()
    map_cfg = MapperConfig(dim_clip=512, dim_embedding=lm_cfg.n_embd,
                           prefix_length=PREFIX_LEN, clip_length=10)
    cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=map_cfg)
    params = {
        "mapper": jax.jit(
            lambda k: mapper.init(k, map_cfg, dtype=jnp.bfloat16))(
            jax.random.PRNGKey(0)),
        "lm": jax.jit(lambda k: gpt2.init(k, lm_cfg, dtype=jnp.bfloat16))(
            jax.random.PRNGKey(1)),
    }

    class _Tok:
        bos_token_id = lm_cfg.vocab_size - 1
        all_special_ids = (lm_cfg.vocab_size - 1,)

        def decode_tokens(self, ids):
            return " ".join(str(i) for i in ids)

    text_params = jax.jit(
        lambda k: clip_text.init(k, text_cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(2))

    class _Scoring:
        """Real CLIP text tower; host 'tokenization' hashes the synthetic
        number-words into the CLIP vocab (device cost is the real thing)."""

        def __init__(self):
            self._encode = jax.jit(
                lambda toks: clip_text.apply(text_params, text_cfg, toks))

        def embed_text(self, texts):
            ctx = text_cfg.context_length
            toks = np.zeros((len(texts), ctx), np.int32)
            for i, t in enumerate(texts):
                ids = [(hash(w) % (text_cfg.vocab_size - 3)) + 1
                       for w in t.split()][: ctx - 2]
                toks[i, : len(ids) + 2] = [text_cfg.vocab_size - 2] + ids + [
                    text_cfg.vocab_size - 1]
            return self._encode(jnp.asarray(toks)).astype(jnp.float32)

    bundle = CaptionerBundle(params=params, cap_cfg=cap_cfg, lm_cfg=lm_cfg,
                             tokenizer=_Tok())
    bundle.enable_int8_decode()  # the cached tree decodes via lm_decode
    # free the bf16 LM (3.1 GB): this phase only touches the decode
    # surface (lm_decode_params int8), and the N=56 tree's final level
    # (504 rows x maxT=81 int8 K/V + f32 scales ~8 GB transient) OOMs the
    # 16 GB chip with the dead bf16 copy resident. Sync the quantize
    # (scalar fetch — block_until_ready does not sync through the relay)
    # before dropping its input.
    float(jnp.sum(
        bundle.lm_decode_params["wpe"][0, :4].astype(jnp.float32)))
    params["lm"] = None
    prefix = jax.random.normal(
        jax.random.PRNGKey(3), (1, PREFIX_LEN, lm_cfg.n_embd), jnp.bfloat16)
    img_emb = jax.random.normal(jax.random.PRNGKey(4),
                                (text_cfg.output_dim,), jnp.float32)

    scoring = _Scoring()  # construct ONCE: its jitted text tower must not
    # recompile per call (a fresh lambda defeats jax's jit cache)

    def one():
        return generate_clip_guided(
            bundle, scoring, img_emb, prefix,
            max_decode_length=max_decode_length,
            look_ahead=look_ahead, branching_factor=branching,
        )

    one()  # compile every level shape
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        one()
        ts.append(time.perf_counter() - t0)

    # batched across images (generate_clip_guided_batch): the per-chunk
    # relay sync + XL weight stream — the whole batch-1 cost — amortize
    # over N images sharing every tree dispatch and CLIP text batch.
    # N=16 leaves the ~2 relay round-trips/chunk as the floor; N=32
    # halves their per-image share; N=56 is the LARGEST width under the
    # ~512-row layout cliff (N * k^la = 504 <= ~512 — past it the decode
    # step's activation layout flips batch-minor and pays ~1.7x; r5,
    # CLAUDE.md "Beam N=128 regression").
    from clipcap_tpu.decode.clip_guided import generate_clip_guided_batch

    tree_rows_cap = 512
    batch_sizes = [n for n in (16, 32, 56)
                   if n * branching ** look_ahead <= tree_rows_cap]
    per_n = {}
    for i, n_batch in enumerate(batch_sizes):
        if i:
            # drop the previous batch size's level executables before the
            # bigger tree compiles (their workspace + the N=56 transients
            # together OOM; params stay alive — the bundle holds them)
            import gc

            gc.collect()
            jax.clear_caches()
        prefix_n = jax.random.normal(
            jax.random.PRNGKey(5 + 2 * i),
            (n_batch, PREFIX_LEN, lm_cfg.n_embd), jnp.bfloat16)
        imgs_n = jax.random.normal(
            jax.random.PRNGKey(6 + 2 * i),
            (n_batch, text_cfg.output_dim), jnp.float32)

        def batched():
            return generate_clip_guided_batch(
                bundle, scoring, imgs_n, prefix_n,
                max_decode_length=max_decode_length,
                look_ahead=look_ahead, branching_factor=branching,
            )

        batched()  # compile the N-row level shapes
        tb = []
        for _ in range(2):
            t0 = time.perf_counter()
            batched()
            tb.append(time.perf_counter() - t0)
        per_n[n_batch] = round(min(tb) * 1000 / n_batch, 1)

    out = {
        "ms_per_image": round(min(ts) * 1000, 1),
        "ms_per_image_batched": per_n.get(16),
        "batch_images": 16,
        "branching": branching,
        "look_ahead": look_ahead,
        "max_decode_length": max_decode_length,
    }
    for n_batch, v in per_n.items():
        if n_batch != 16:
            out[f"ms_per_image_batched_n{n_batch}"] = v
    return out


def _bench_tokenizer(n_captions: int = 20_000) -> dict:
    """Host-side BPE throughput (tokenizers/bpe.py — the pure-Python
    replacement for HF's Rust tokenizer, reference lms/GPT2.py:24).
    The merge table is trained on the fly from the synthetic corpus (the
    real 50k-merge table isn't downloadable here — PARITY.md), so the
    per-word merge-loop depth is exercised realistically. Returns
    tokens/sec and captions/sec at COCO-like caption lengths — the number
    that decides whether tokenization stays off the preprocess critical
    path (~140 img/s upload ceiling needs only ~1.7k tok/s)."""
    import numpy as np

    from clipcap_tpu.tokenizers.bpe import ByteLevelBPE, bytes_to_unicode

    rng = np.random.default_rng(0)
    common = ["the", "a", "man", "woman", "dog", "riding", "standing",
              "holding", "street", "table", "skateboard", "group", "people",
              "sitting", "next", "to", "on", "in", "with", "playing",
              "baseball", "field", "plate", "food", "kitchen", "bathroom"]
    # ~3k distinct rare words keep the per-word _bpe cache hit rate
    # realistic (COCO: ~25k distinct words over 600k captions — caption
    # text IS cache-friendly, but not a 26-word loop)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    rare = ["".join(rng.choice(letters, size=rng.integers(4, 10)))
            for _ in range(3000)]
    words = np.array(common * 100 + rare)  # Zipf-ish: common dominate
    caps = [" ".join(rng.choice(words, size=rng.integers(8, 14))) + "."
            for _ in range(n_captions)]

    # tiny on-the-fly BPE training: merge the most frequent pair until the
    # corpus' pair supply dries up (same loop shape as real GPT-2 merges)
    b2u = bytes_to_unicode()
    freq = {}
    for cap in caps[:2000]:
        for w in cap.split():
            t = tuple(b2u[b] for b in (" " + w).encode())
            freq[t] = freq.get(t, 0) + 1
    merges = []
    for _ in range(500):
        pairs = {}
        for word, f in freq.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] = pairs.get(
                    (word[i], word[i + 1]), 0) + f
        if not pairs:
            break
        best = max(pairs, key=pairs.get)
        if pairs[best] < 2:
            break
        merges.append(best)
        new_freq = {}
        for word, f in freq.items():
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and (word[i], word[i + 1]) == best):
                    out.append(word[i] + word[i + 1])
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_freq[tuple(out)] = new_freq.get(tuple(out), 0) + f
        freq = new_freq
    alphabet = list(dict.fromkeys(b2u.values()))
    pieces = list(dict.fromkeys(
        alphabet + [a + b for a, b in merges] + ["<|endoftext|>"]))
    vocab = {t: i for i, t in enumerate(pieces)}
    tok = ByteLevelBPE(vocab, merges)

    tok.encode(caps[0])  # warm regex/lru caches
    t0 = time.perf_counter()
    n_tokens = 0
    for cap in caps:
        n_tokens += len(tok.encode(cap))
    dt = time.perf_counter() - t0
    return {
        "tokens_per_sec": round(n_tokens / dt),
        "captions_per_sec": round(n_captions / dt),
        "n_merges": len(merges),
    }


def _relay_alive(timeout_s: int = 360) -> bool:
    """Fail fast when the axon relay is wedged (it can stall for hours —
    CLAUDE.md): probe one trivial device op in a SUBPROCESS with a hard
    timeout, so a dead relay costs one timeout instead of hanging the
    whole bench (the driver must always get its one JSON line)."""
    import subprocess
    import sys

    # 3 attempts: a healthy relay answers the first in well under a
    # minute, and the known occasional single-process boot wedge clears
    # on retry — only a real outage burns all three timeouts
    for _ in range(3):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.sum(jnp.ones((8, 8)))))"],
                timeout=timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def main():
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import GPT2Config
    from clipcap_tpu.models import gpt2

    if not _relay_alive():
        print(json.dumps({
            "metric": "gpt2-xl_greedy_decode_throughput",
            "value": None,
            "unit": "captions/sec/chip",
            "vs_baseline": None,
            "detail": {"error": "TPU relay unreachable (device-op probe "
                                "timed out); see CLAUDE.md relay-outage note"},
        }))
        return

    cfg = GPT2Config.variant("gpt2-xl")
    params = jax.jit(lambda k: gpt2.init(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    prefix = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, PREFIX_LEN, cfg.n_embd), jnp.bfloat16
    )

    # int8 headline runs at batch 512: the int8 KV cache halves the HBM
    # footprint, and throughput keeps rising past 256 (the bf16 cache OOMs
    # at 512 — 11.3 GB KV alone — so the bf16 comparison stays at 256).
    batch_int8 = 2 * BATCH
    prefix_512 = jax.random.normal(
        jax.random.PRNGKey(1), (batch_int8, PREFIX_LEN, cfg.n_embd), jnp.bfloat16
    )

    def safe(fn, *a, default=None, **kw):
        """One failed phase must not cost the driver the whole JSON line."""
        import sys
        import traceback

        try:
            return fn(*a, **kw)
        except Exception:
            traceback.print_exc(file=sys.stderr)
            # a RESOURCE_EXHAUSTED leaves the backend pinned (dead frames +
            # executables hold HBM) and every later phase then fails too —
            # r3 saw one serving OOM null out eight downstream phases.
            # Reclaim before moving on.
            reclaim_hbm()
            return default

    def reclaim_hbm():
        """Drop jit executables + collect garbage between heavy phases.

        The fabricated 6B/11B phases otherwise leave enough HBM pinned
        (executable program memory + allocator fragmentation) that a later
        large allocation RESOURCE_EXHAUSTEDs — r3 saw serving + beam both
        null out when they ran after the t0-11b phase. Main-level params
        stay alive (we hold the reference); only dead executables go."""
        import gc

        gc.collect()
        jax.clear_caches()
        gc.collect()

    def rnd(x, n=1):
        return None if x is None else round(x, n)

    p50_bf16 = safe(_bench_decode_raw, cfg, params, prefix, int8=False)
    p50_int8 = safe(_bench_decode_raw, cfg, params, prefix_512, int8=True,
                    batch=batch_int8)
    p50_engine, p50_pipeline = safe(_bench_engine_default, cfg, params,
                                    default=(None, None))
    p50_engine_fs, _ = safe(_bench_engine_default, cfg, params,
                            filter_method="fused_step", default=(None, None))
    single_ms = safe(_bench_single_caption_latency, cfg, params)
    # serving + beam run HERE — they used to run last, after the fabricated
    # 6B/11B phases, and both RESOURCE_EXHAUSTEDed on leftover HBM (see
    # reclaim_hbm). They also only need the int8 params: quantize once,
    # sync, and FREE the bf16 params + prefixes first — a production
    # server holds only int8 weights, and keeping the 3.1 GB bf16 copy
    # (plus the engine phases' B=512 executables) resident pushed the
    # 512-slot ring over HBM capacity.
    params_q = jax.jit(gpt2.quantize_params)(params)
    float(jnp.sum(jax.tree_util.tree_leaves(params_q)[0][..., :1]
                  .astype(jnp.float32)))  # sync quantize before freeing bf16
    del params, prefix, prefix_512
    reclaim_hbm()
    serving = safe(_bench_serving, cfg, params_q)
    # same workload with the caps DECLARED to the engine (ring 73 vs 108):
    # the production config when the caller knows its length budget
    serving_declared = safe(_bench_serving, cfg, params_q,
                            include_static=False, declared_max=30)
    reclaim_hbm()
    # latency-vs-throughput curve (VERDICT r3 item 8): smaller slot counts
    # trade throughput for latency; static baseline measured once above
    serving_curve = [
        {k: s[k] for k in ("slots", "serving_captions_per_sec",
                           "latency_p50_s", "latency_p99_s")}
        for s in (safe(_bench_serving, cfg, params_q, slots=n,
                       include_static=False) for n in (128, 256))
        if s
    ]
    reclaim_hbm()
    beam = safe(_bench_beam, cfg, params_q)
    reclaim_hbm()
    # config #3 composite: ViT-L/14 -> mapper -> XL int8 beam/nucleus
    config3 = safe(_bench_config3_pipeline, cfg, params_q)
    del params_q
    reclaim_hbm()
    clip_guided = safe(_bench_clip_guided)
    reclaim_hbm()
    vit_ips = safe(_bench_vit_encode)
    vit_l14_ips = safe(_bench_vit_encode, batch=128, variant="ViT-L/14")
    prepro_ips = safe(_bench_preprocess_e2e)
    tokenizer = safe(_bench_tokenizer)
    genb_ms = safe(_bench_genb_synthesis)
    train_steps_s, train_tokens_s, train_mfu = safe(
        _bench_train_step, default=(None, None, None))
    # config #2: the reference's headline training run — GPT2-XL,
    # prefix-only (mapper trains, LM frozen via stop_gradient)
    xl_steps_s, _, xl_mfu = safe(
        _bench_train_step, batch=64, lm_variant="gpt2-xl", prefix_only=True,
        prefix_len=40, k_steps=5, default=(None, None, None),
    )
    reclaim_hbm()
    # config #4's training half: GPT-J 6B prefix-only (VERDICT r3 item 7)
    gptj_train = safe(_bench_gptj_prefix_train)
    reclaim_hbm()
    gptj6b_cps = safe(_bench_gptj_6b_int8, batch=256)
    reclaim_hbm()
    t0_11b_cps = safe(_bench_t0_11b_int8_decode)
    reclaim_hbm()
    spec = safe(_bench_speculative)
    reclaim_hbm()
    # realized speculative decode: distilled draft + acceptance curve
    spec_distilled = safe(_bench_speculative_distilled)
    reclaim_hbm()
    loader_rows_s = safe(_bench_native_loader)

    # null (not 0.0) when the headline phase failed: a trend reader must
    # not confuse "failed to measure" with "zero throughput"
    captions_per_sec = batch_int8 / p50_int8 if p50_int8 else None

    # detail emitted as SEVERAL labeled, individually-parseable phase
    # lines (VERDICT r4 item 5: r3/r4's single giant detail line outgrew
    # the driver's bounded stdout-tail capture and the front half was
    # lost). Each line parses alone; the most load-bearing groups print
    # LAST (closest to the tail), and the compact headline is always the
    # FINAL line.
    def phase(name, payload):
        print(json.dumps({"phase": name, **payload}))

    phase("aux", {
        "tokenizer_host_bpe": tokenizer,
        "native_shard_loader_rows_per_sec": rnd(loader_rows_s),
        "genb_blip_synthesis_ms_per_image_40cand": rnd(genb_ms),
    })
    phase("encode", {
        "vit_b32_encode_images_per_sec": rnd(vit_ips),
        "vit_b32_encode_vs_10k_target": rnd(vit_ips and vit_ips / 10000.0, 3),
        "vit_l14_encode_images_per_sec": rnd(vit_l14_ips),
        "preprocess_e2e_images_per_sec": rnd(prepro_ips),
        "preprocess_e2e_workers": 4,
        "preprocess_e2e_note": "tar -> native libjpeg decode (DCT prescale) -> uint8 upload -> device normalize+encode -> npy shards; host-decode-bound on this 1-core box, device encode is the line above",
    })
    phase("train", {
        "config1_steps_per_sec": rnd(train_steps_s, 2),
        "config1_tokens_per_sec": rnd(train_tokens_s),
        "config1_mfu": rnd(train_mfu, 3),
        "config2_xl_prefix_only_steps_per_sec": rnd(xl_steps_s, 2),
        "config2_xl_prefix_only_mfu": rnd(xl_mfu, 3),
        "gptj_prefix_only": gptj_train,
        "mfu_note": "device rate (k-step scan, relay round-trip subtracted); MFU = analytic matmul FLOPs / 175 TF/s measured bf16 peak",
    })
    phase("xxl_decode", {
        "gptj_6b_int8_captions_per_sec_b256": rnd(gptj6b_cps),
        "t0_11b_int8_captions_per_sec_b64": rnd(t0_11b_cps),
    })
    phase("speculative", {
        "bounds_b1_gpt2xl": spec,
        "distilled_draft": spec_distilled,
    })
    phase("clip_guided", clip_guided or {"error": "phase failed"})
    phase("beam", beam or {"error": "phase failed"})
    phase("config3_l14_xl_pipeline", config3 or {"error": "phase failed"})
    phase("serving", {
        "continuous_batching": serving,
        "declared_maxlen_30": serving_declared,
        "latency_curve": serving_curve,
    })
    phase("decode", {
        "batch": batch_int8,
        "prefix_len": PREFIX_LEN,
        "new_tokens": NEW_TOKENS,
        "dtype": "int8 weights + int8 kv (headline)",
        "p50_batch_latency_ms_int8": rnd(p50_int8 and p50_int8 * 1000),
        "raw_greedy_bf16_captions_per_sec": rnd(p50_bf16 and BATCH / p50_bf16),
        "bf16_batch": BATCH,
        "p50_batch_latency_ms_bf16": rnd(p50_bf16 and p50_bf16 * 1000),
        "engine_default_captions_per_sec": rnd(p50_engine and batch_int8 / p50_engine),
        "engine_fused_step_captions_per_sec": rnd(p50_engine_fs and batch_int8 / p50_engine_fs),
        "engine_default_batch": batch_int8,
        "engine_default_settings": "rep_penalty=1.2 top_p=sweep(0.1..0.9) stop='.' filter=fused, from prefix (same start as raw greedy)",
        "pipeline_clip_to_caption_per_sec": rnd(p50_pipeline and batch_int8 / p50_pipeline),
        "pipeline_note": "mapper (12.6 TFLOP @ B=512) + engine default",
        "single_caption_p50_latency_ms_int8": rnd(single_ms),
    })
    print(
        json.dumps(
            {
                "metric": "gpt2-xl_greedy_decode_throughput",
                "value": rnd(captions_per_sec, 2),
                "unit": "captions/sec/chip",
                "vs_baseline": rnd(
                    captions_per_sec
                    and captions_per_sec / BASELINE_CAPTIONS_PER_SEC, 3),
                "serving_captions_per_sec": (
                    serving or {}).get("serving_captions_per_sec"),
                "detail": "previous stdout phase lines",
            }
        )
    )


if __name__ == "__main__":
    main()
