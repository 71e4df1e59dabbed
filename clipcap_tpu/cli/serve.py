"""Batch caption server: CLIP-feature shards -> captions via continuous
batching (beyond-reference; the production companion of cli/caption_me).

Reads a `.npy` shard of CLIP features (the `prefixes/*.npy` layout
tools/preprocess.py writes), projects them through the bundle's mapper
into a device-resident prefix pool, and drives
decode/serving.ServingEngine over it: a fixed batch of slots, each
refilled with the next queued image the moment its caption finishes, so
throughput tracks the mean caption length instead of the max. Writes one
JSONL line per image.
"""

from __future__ import annotations

import argparse
import json

#: measured serving latency curve (GPT2-XL int8, reference-default
#: sampling, natural-EOS caption workload — bench.py serving_latency_curve,
#: BENCH_r04): slot count -> p50 request latency in seconds. More slots =
#: more throughput but deeper queues (each request waits on more
#: co-scheduled decode steps); the bench rerecords this every round.
LATENCY_CURVE_P50_S = {128: 0.611, 256: 1.092, 512: 1.366}


def pick_slots_for_p50(target_p50_s: float, curve=None) -> int:
    """Largest benched slot count whose measured p50 latency meets the
    target (throughput grows with slots, so largest-fitting maximizes
    captions/s under the latency budget); the smallest benched count when
    nothing fits (the floor this hardware offers)."""
    curve = curve if curve is not None else LATENCY_CURVE_P50_S
    fitting = [s for s, p50 in curve.items() if p50 <= target_p50_s]
    return max(fitting) if fitting else min(curve)


def serve_shard(
    bundle,
    clip_features,  # [N, dim_clip] (or [N, clip_length, dim]) host array
    out_path: str,
    slots: int = 256,
    refill_size: int = 0,
    steps_per_sync: int = 16,
    map_batch: int = 512,
    admission: str = "fifo",
    max_lengths=None,  # optional [N] per-image new-token caps
    max_request_length: int = 0,
    **generation_kwargs,
) -> int:
    """Caption every row of clip_features; returns the number written.

    `max_request_length` > 0 declares the per-request cap bound to the
    engine, which sizes the KV ring to it — every decode step streams the
    whole ring, so the declaration is ~proportional step time off
    (bench: 482 vs 419 captions/s at a declared 30 vs the 67 safety
    cap). Every request's cap (max_lengths[i], else max_new_tokens)
    must be <= the declared bound (decode/serving.py validates)."""
    import jax.numpy as jnp
    import numpy as np

    from ..decode.engine import GenerationSettings
    from ..decode.serving import Request

    settings = GenerationSettings(**generation_kwargs)
    if max_request_length and settings.eos_token_id is None:
        # caps bind through the engine's completion logic (engine parity:
        # over_length only evaluates when eos handling is on) — without it
        # rows would outrun the declaration-sized ring
        raise ValueError(
            "max_request_length requires eos_token_id (length caps bind "
            "through the engine's eos/completion logic)"
        )
    engine = bundle.make_serving_engine(
        settings, slots=slots,
        refill_size=refill_size or None, steps_per_sync=steps_per_sync,
        max_request_length=max_request_length or None,
    )

    # mapper projection in fixed-size batches -> one device-resident pool
    n = len(clip_features)
    pool_parts = []
    for i in range(0, n, map_batch):
        part = jnp.asarray(np.asarray(clip_features[i:i + map_batch]))
        pad = 0
        if part.shape[0] < map_batch and i > 0:
            pad = map_batch - part.shape[0]  # keep one executable shape
            part = jnp.concatenate([part, jnp.zeros((pad,) + part.shape[1:],
                                                    part.dtype)])
        proj = bundle.project_prefix(part)
        pool_parts.append(proj[: proj.shape[0] - pad])
    pool = jnp.concatenate(pool_parts, axis=0) if len(pool_parts) > 1 else pool_parts[0]

    # with per-image caps known (e.g. a length-budgeted batch job),
    # admission="length" groups refill blocks by cap so they retire
    # together — see decode/serving.serve
    # a declared bound IS the hard cap when no per-image caps are given
    # (the engine rejects requests whose effective cap exceeds it)
    def _cap(i):
        if max_lengths is not None:
            return int(max_lengths[i])
        if max_request_length:
            return min(int(max_request_length),
                       int(settings.max_new_tokens))
        return None

    requests = [Request(i, i, max_length=_cap(i)) for i in range(n)]
    results = engine.serve(requests, bundle.lm_decode_params,
                           prefix_pool=pool, admission=admission)

    special = set(getattr(bundle.tokenizer, "all_special_ids", ()))
    with open(out_path, "w") as f:
        for i in range(n):
            res = results[i]
            ids = [t for t in res["tokens"] if t not in special]
            f.write(json.dumps({
                "id": i,
                "caption": bundle.tokenizer.decode_tokens(ids),
                "tokens": res["length"],
                "stopped": res["stopped"],
            }) + "\n")
    return n


def main(argv=None):
    p = argparse.ArgumentParser(
        description="continuous-batching caption server over a prefix shard")
    p.add_argument("--checkpoint_path", required=True)
    p.add_argument("--tokenizer_vocab_dir", required=True)
    p.add_argument("--prefixes_npy", required=True,
                   help="CLIP-feature shard (tools/preprocess.py prefixes/*.npy)")
    p.add_argument("--out_jsonl", required=True)
    p.add_argument("--slots", type=int, default=256)
    p.add_argument("--target_p50_s", type=float, default=None,
                   help="pick --slots from the measured latency curve: the "
                        "largest benched slot count whose p50 request "
                        "latency meets this target (overrides --slots)")
    p.add_argument("--refill_size", type=int, default=0,
                   help="0 = slots // 8")
    p.add_argument("--steps_per_sync", type=int, default=16)
    p.add_argument("--max_request_length", type=int, default=0,
                   help="declare the per-request new-token cap bound; the "
                        "KV ring is sized to it instead of max_new_tokens "
                        "(+15%% measured throughput at a declared 30 vs "
                        "the 67 safety cap — see bench serving phase). "
                        "Length caps bind through the engine's completion "
                        "logic, so --eos_token_id must be set (engine "
                        "parity: without eos handling, generation runs to "
                        "max_new_tokens)")
    p.add_argument("--int8_decode", action="store_true")
    p.add_argument("--max_new_tokens", type=int, default=67)
    p.add_argument("--top_p", type=float, default=0.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--repetition_penalty", type=float, default=1.0)
    p.add_argument("--stop_token_id", type=int, default=None)
    p.add_argument("--eos_token_id", type=int, default=None)
    args = p.parse_args(argv)

    import numpy as np

    from .loading import load_captioner_bundle

    bundle = load_captioner_bundle(args.checkpoint_path, args.tokenizer_vocab_dir)
    if args.int8_decode:
        bundle.enable_int8_decode()

    feats = np.load(args.prefixes_npy)
    slots = args.slots
    if args.target_p50_s is not None:
        slots = pick_slots_for_p50(args.target_p50_s)
        print(f"target_p50_s={args.target_p50_s}: serving with {slots} slots")
    n = serve_shard(
        bundle, feats, args.out_jsonl,
        slots=slots, refill_size=args.refill_size,
        steps_per_sync=args.steps_per_sync,
        max_request_length=args.max_request_length,
        max_new_tokens=args.max_new_tokens,
        top_p=args.top_p, top_k=args.top_k, temperature=args.temperature,
        repetition_penalty=args.repetition_penalty,
        greedy=(args.top_p == 0.0 and args.top_k == 0),
        stop_token_id=args.stop_token_id,
        eos_token_id=args.eos_token_id,
    )
    print(f"wrote {n} captions to {args.out_jsonl}")


if __name__ == "__main__":
    main()
