"""Headline benchmark: GPT2-XL caption decode throughput on one TPU chip.

Measures the BASELINE.md target "GPT2-XL decode >= 50 captions/sec/chip":
batch of visual-prefix prompts -> KV-cached greedy decode (the engine that
replaces the reference's full-recompute loops, inference.py:97/:249) with
bf16 weights and a bf16 KV cache. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Timing notes for this environment: the TPU is reached through a relay
where block_until_ready() does not synchronize reliably, so each timed
iteration is synced by fetching a scalar reduction of the output; model
init is a single jitted dispatch (eager per-op init is minutes-slow over
the relay).
"""

from __future__ import annotations

import json
import time


BATCH = 256
PREFIX_LEN = 40  # reference config #2: prefix_length=40
NEW_TOKENS = 32  # typical caption length
BASELINE_CAPTIONS_PER_SEC = 50.0  # BASELINE.md north-star target


def main():
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import GPT2Config
    from clipcap_tpu.models import gpt2

    cfg = GPT2Config.variant("gpt2-xl")
    params = jax.jit(lambda k: gpt2.init(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    prefix = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, PREFIX_LEN, cfg.n_embd), jnp.bfloat16
    )
    total_len = PREFIX_LEN + NEW_TOKENS

    @jax.jit
    def decode_checksum(params, prefix):
        cache = gpt2.init_cache(cfg, batch=BATCH, max_len=total_len, dtype=jnp.bfloat16)
        logits, cache = gpt2.prefill(params, cfg, prefix, cache)
        tok = jnp.argmax(logits[:, -1], axis=-1)

        def body(carry, _):
            tok, cache = carry
            emb = gpt2.embed_tokens(params, tok)[:, None, :].astype(jnp.bfloat16)
            logits, cache = gpt2.decode_step(params, cfg, emb, cache)
            nxt = jnp.argmax(logits, axis=-1)
            return (nxt, cache), nxt

        (_, _), toks = jax.lax.scan(body, (tok, cache), None, length=NEW_TOKENS - 1)
        return jnp.sum(toks)  # scalar checksum forces full execution on fetch

    # warmup / compile
    float(decode_checksum(params, prefix))

    iters = 3
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(decode_checksum(params, prefix))  # scalar fetch = hard sync
        times.append(time.perf_counter() - t0)

    times.sort()
    p50 = times[len(times) // 2]
    captions_per_sec = BATCH / p50

    vit_ips = _bench_vit_preprocess()
    vit_ips_int8 = _bench_vit_preprocess(quantize=True)

    print(
        json.dumps(
            {
                "metric": "gpt2-xl_greedy_decode_throughput",
                "value": round(captions_per_sec, 2),
                "unit": "captions/sec/chip",
                "vs_baseline": round(captions_per_sec / BASELINE_CAPTIONS_PER_SEC, 3),
                "detail": {
                    "batch": BATCH,
                    "prefix_len": PREFIX_LEN,
                    "new_tokens": NEW_TOKENS,
                    "p50_batch_latency_ms": round(p50 * 1000, 1),
                    "dtype": "bfloat16",
                    "vit_b32_preprocess_images_per_sec": round(vit_ips, 1),
                    "vit_b32_int8_images_per_sec": round(vit_ips_int8, 1),
                    "vit_b32_vs_10k_target": round(max(vit_ips, vit_ips_int8) / 10000.0, 3),
                },
            }
        )
    )


def _bench_vit_preprocess(batch: int = 256, iters: int = 5, quantize: bool = False) -> float:
    """Second headline (BASELINE.md): ViT-B/32 image-encode throughput —
    the device half of the webdataset->embedding-shards preprocessor."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.core.config import ViTConfig
    from clipcap_tpu.models import vit

    cfg = ViTConfig.clip_variant("ViT-B/32")
    params = jax.jit(lambda k: vit.init(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    if quantize:
        params = jax.jit(vit.quantize_params)(params)
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


if __name__ == "__main__":
    main()
