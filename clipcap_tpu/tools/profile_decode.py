"""Phase-split profiler for the GPT2-XL decode headline (dev tool).

Times prefill and per-step decode separately on the real chip, at one or
more batch sizes, for the bf16 and int8 paths. Relay-safe: every timing
fetches a scalar (CLAUDE.md: block_until_ready does not sync through the
axon relay), and per-step time is amortized inside one jit via lax.scan.

Usage: python -m clipcap_tpu.tools.profile_decode [--batches 256,512] [--steps 32]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from clipcap_tpu.core.config import GPT2Config
from clipcap_tpu.models import gpt2

PREFIX_LEN = 40


def _time(fn, *args, reps=3):
    float(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def profile(cfg, params, params_q, batch: int, steps: int, paths=("bf16", "int8")):
    total_len = PREFIX_LEN + steps
    prefix = jax.random.normal(
        jax.random.PRNGKey(1), (batch, PREFIX_LEN, cfg.n_embd), jnp.bfloat16
    )

    out = {}
    for name, pp, init_cache, prefill, step in (
        (
            "bf16",
            params,
            lambda: gpt2.init_cache(cfg, batch=batch, max_len=total_len, dtype=jnp.bfloat16),
            gpt2.prefill,
            gpt2.decode_step,
        ),
        (
            "int8",
            params_q,
            lambda: gpt2.init_cache_q8(cfg, batch=batch, max_len=total_len),
            gpt2.prefill_q8,
            gpt2.decode_step_q8,
        ),
    ):
        if name not in paths:
            continue

        @jax.jit
        def prefill_only(pp, prefix):
            cache = init_cache()
            logits, cache = prefill(pp, cfg, prefix, cache)
            return jnp.sum(logits) + jnp.sum(cache.index)

        @jax.jit
        def full(pp, prefix):
            cache = init_cache()
            logits, cache = prefill(pp, cfg, prefix, cache)
            tok = jnp.argmax(logits[:, -1], axis=-1)

            def body(carry, _):
                tok, cache = carry
                emb = gpt2.embed_tokens(pp, tok)[:, None, :].astype(jnp.bfloat16)
                logits, cache = step(pp, cfg, emb, cache)
                nxt = jnp.argmax(logits, axis=-1)
                return (nxt, cache), nxt

            (_, _), toks = jax.lax.scan(body, (tok, cache), None, length=steps - 1)
            return jnp.sum(toks)

        t_prefill = _time(prefill_only, pp, prefix)
        t_full = _time(full, pp, prefix)
        per_step = (t_full - t_prefill) / (steps - 1)
        out[name] = dict(
            prefill_ms=t_prefill * 1e3,
            total_ms=t_full * 1e3,
            per_step_ms=per_step * 1e3,
            captions_per_sec=batch / t_full,
        )
        print(
            f"B={batch} {name}: prefill {t_prefill*1e3:7.1f} ms  "
            f"step {per_step*1e3:6.2f} ms  total {t_full*1e3:7.1f} ms  "
            f"-> {batch / t_full:6.1f} captions/s"
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,512")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--variant", default="gpt2-xl")
    ap.add_argument("--paths", default="bf16,int8",
                    help="comma list of bf16,int8 (bf16 OOMs at batch>=512)")
    args = ap.parse_args()

    cfg = GPT2Config.variant(args.variant)
    params = jax.jit(lambda k: gpt2.init(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    params_q = jax.jit(gpt2.quantize_params)(params)
    for b in (int(x) for x in args.batches.split(",")):
        profile(cfg, params, params_q, b, args.steps,
                paths=tuple(args.paths.split(",")))


if __name__ == "__main__":
    main()
