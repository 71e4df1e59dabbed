"""Continuous-batching serving engine (decode/serving.py).

The contract: serving a request through a slot — at ANY point in the ring
cache's life, after any number of refills and wraps — produces exactly the
tokens the static engine produces for that request alone. Greedy f32 on
CPU makes that comparison token-exact; the sampled path is pinned by
replaying the identical rng stream through both engines.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clipcap_tpu.core.config import GPT2Config, GPTJConfig, T5Config
from clipcap_tpu.decode import GenerationSettings, generate
from clipcap_tpu.decode.serving import Request, ServingEngine
from clipcap_tpu.models import gpt2, gptj, t5

CFG = GPT2Config(vocab_size=96, n_positions=96, n_embd=32, n_layer=2, n_head=4)
CFG_J = GPTJConfig(vocab_size=96, n_positions=96, n_embd=32, n_layer=2,
                   n_head=4, rotary_dim=4)
CFG_T5 = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_heads=4,
                  num_layers=2, num_decoder_layers=2,
                  feed_forward_proj="gated-gelu")
P = 5  # prefix length
EOS = 7


def _requests(n, seed=0, caps=None):
    rng = np.random.default_rng(seed)
    return [
        Request(
            request_id=f"r{i}",
            prefix_embeds=rng.normal(size=(P, CFG.n_embd)).astype(np.float32),
            max_length=None if caps is None else caps[i],
        )
        for i in range(n)
    ]


def _engine_single(lm, params, req, settings, rng=None, cfg=CFG):
    """Static-engine reference for one request."""
    if req.max_length is not None:
        settings = dataclasses.replace(settings, max_length=req.max_length)
    out = generate(
        lm, params, cfg, jnp.asarray(req.prefix_embeds)[None], settings, rng=rng
    )
    toks, length, stopped = jax.device_get(
        (out["tokens"][0], out["lengths"][0], out["stopped"][0])
    )
    return [int(t) for t in toks[: int(length)]], bool(stopped)


SETTINGS = GenerationSettings(max_new_tokens=12, greedy=True, eos_token_id=EOS)


def test_serving_no_refill_matches_engine_batch():
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    reqs = _requests(4, seed=1)
    eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=SETTINGS, slots=4,
                        steps_per_sync=5, dtype=jnp.float32)
    got = eng.serve(reqs, params)

    prompts = jnp.asarray(np.stack([r.prefix_embeds for r in reqs]))
    ref = generate(gpt2, params, CFG, prompts, SETTINGS)
    toks, lens, stopped = jax.device_get(
        (ref["tokens"], ref["lengths"], ref["stopped"])
    )
    for i, req in enumerate(reqs):
        want = [int(t) for t in toks[i, : int(lens[i])]]
        assert got[req.request_id]["tokens"] == want, req.request_id
        assert got[req.request_id]["stopped"] == bool(stopped[i])


@pytest.mark.parametrize(
    "family,int8",
    [("gpt2", False), ("gpt2", True), ("gptj", False), ("gptj", True),
     ("t5", False), ("t5", True)],
    ids=["gpt2", "gpt2-int8", "gptj", "gptj-int8", "t5", "t5-int8"],
)
def test_serving_refill_and_ring_wrap_match_individual_runs(family, int8):
    """2 slots, 7 requests with staggered caps: slots refill repeatedly and
    the global index wraps the ring several times (ring = P+12+1 = 18,
    total steps > 40). Every request must match its solo static-engine run.
    Covers absolute (gpt2), rotary (gptj) and relative (t5) positions —
    t5 also swaps per-request encoder outputs for its cross-attention."""
    mod, cfg = {"gpt2": (gpt2, CFG), "gptj": (gptj, CFG_J),
                "t5": (t5, CFG_T5)}[family]
    params = mod.init(jax.random.PRNGKey(0), cfg)
    lm = mod
    if int8:
        params = mod.quantize_params(params)
        # t5's linears dispatch on quantized leaves; same module drives int8
        lm = {"gpt2": getattr(mod, "gpt2_int8", mod),
              "gptj": getattr(mod, "gptj_int8", mod),
              "t5": mod}[family]
    caps = [3, 9, 5, 12, 7, 4, 2]
    reqs = _requests(7, seed=2, caps=caps)
    eng = ServingEngine(lm, cfg, prefix_len=P, settings=SETTINGS, slots=2,
                        steps_per_sync=3,
                        dtype=jnp.bfloat16 if int8 else jnp.float32)
    got = eng.serve(reqs, params)
    assert set(got) == {r.request_id for r in reqs}
    for req in reqs:
        want, want_stopped = _engine_single(lm, params, req, SETTINGS, cfg=cfg)
        assert got[req.request_id]["tokens"] == want, req.request_id
        assert got[req.request_id]["stopped"] == want_stopped


def test_serving_blip_token_mode_matches_individual_runs():
    """BLIP continuous batching (blip_text.serving_decoder_lm, token-id
    mode): the per-request prefix is the image features (cross-attn K/V
    swap at refill); a fixed decoder prompt occupies the ring. Each
    request must match its solo static-engine run via decoder_lm."""
    from clipcap_tpu.core.config import BlipTextConfig
    from clipcap_tpu.models import blip_text

    cfg = BlipTextConfig(vocab_size=83, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64,
                         encoder_width=16, embed_dim=16)
    params = blip_text.init(jax.random.PRNGKey(1), cfg)
    tv, prompt = 5, [30, 11, 2]
    rng = np.random.default_rng(6)
    feats = [rng.normal(size=(tv, 16)).astype(np.float32) for _ in range(6)]
    caps = [3, 9, 5, 12, 4, 2]
    settings = dataclasses.replace(SETTINGS, eos_token_id=3)

    lm = blip_text.serving_decoder_lm(params, cfg, prompt, num_image_tokens=tv)
    eng = ServingEngine(lm, cfg, prefix_len=tv, prompt_len=len(prompt),
                        settings=settings, slots=2, steps_per_sync=3,
                        dtype=jnp.float32)
    reqs = [Request(i, f, max_length=c)
            for i, (f, c) in enumerate(zip(feats, caps))]
    got = eng.serve(reqs, params)

    for i, (f, c) in enumerate(zip(feats, caps)):
        solo = blip_text.decoder_lm(params, cfg, jnp.asarray(f)[None])
        ref = generate(
            solo, params, cfg, jnp.asarray([prompt], jnp.int32),
            dataclasses.replace(settings, max_length=c),
        )
        toks, length = jax.device_get((ref["tokens"][0], ref["lengths"][0]))
        want = [int(t) for t in toks[: int(length)]]
        assert got[i]["tokens"] == want, i


def test_serving_sampled_path_matches_engine_rng_stream():
    """Same initial rng + no refills => the serving chunk scan consumes the
    identical per-step rng stream as engine.generate: sampled tokens (threshold
    filters on CPU) must match token-for-token."""
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    settings = dataclasses.replace(
        SETTINGS, greedy=False, top_p=0.9, top_k=11, repetition_penalty=1.2,
        temperature=0.9,
    )
    reqs = _requests(3, seed=3)
    eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=settings, slots=3,
                        steps_per_sync=4, dtype=jnp.float32)
    got = eng.serve(reqs, params, rng=jax.random.PRNGKey(42))

    prompts = jnp.asarray(np.stack([r.prefix_embeds for r in reqs]))
    ref = generate(gpt2, params, CFG, prompts, settings,
                   rng=jax.random.PRNGKey(42))
    toks, lens = jax.device_get((ref["tokens"], ref["lengths"]))
    for i, req in enumerate(reqs):
        want = [int(t) for t in toks[i, : int(lens[i])]]
        assert got[req.request_id]["tokens"] == want


def test_serving_genb_completion_features_match_engine():
    """The Gen-B completion knobs (min-length EOS suppression, force-EOS
    early stop, alternate-token continuation) must behave identically to
    engine.generate under the replayed rng stream (no refills)."""
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    settings = GenerationSettings(
        max_new_tokens=12, greedy=False, top_p=0.95, temperature=1.1,
        # random ~96-vocab logits put log P(eos) near -4.6: -4.8 makes the
        # force-EOS early stop actually fire for some rows (asserted below)
        eos_token_id=EOS, min_length=3, force_eos_log_prob=-4.8,
        min_alternate_prob=0.01, stop_on_special=(11,),
        stop_token_id=5, max_stops=2,
    )
    reqs = _requests(4, seed=7)
    eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=settings, slots=4,
                        steps_per_sync=5, dtype=jnp.float32)
    got = eng.serve(reqs, params, rng=jax.random.PRNGKey(9))

    prompts = jnp.asarray(np.stack([r.prefix_embeds for r in reqs]))
    ref = generate(gpt2, params, CFG, prompts, settings,
                   rng=jax.random.PRNGKey(9))
    toks, lens, stopped = jax.device_get(
        (ref["tokens"], ref["lengths"], ref["stopped"])
    )
    assert (lens < 12).any(), "no row stopped early; the test is inert"
    for i, req in enumerate(reqs):
        want = [int(t) for t in toks[i, : int(lens[i])]]
        assert got[req.request_id]["tokens"] == want, req.request_id
        assert got[req.request_id]["stopped"] == bool(stopped[i])


def test_serving_prefix_pool_matches_host_path():
    """Device-resident prefix pool (int row-index requests) must produce the
    same tokens as shipping the same prefixes from the host."""
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    host_reqs = _requests(5, seed=4, caps=[4, 9, 6, 12, 3])
    eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=SETTINGS, slots=2,
                        steps_per_sync=4, dtype=jnp.float32)
    want = eng.serve(host_reqs, params)

    pool = jnp.asarray(np.stack([r.prefix_embeds for r in host_reqs]))
    pool_reqs = [dataclasses.replace(r, prefix_embeds=i)
                 for i, r in enumerate(host_reqs)]
    got = eng.serve(pool_reqs, params, prefix_pool=pool)
    for req in host_reqs:
        g, w = got[req.request_id], want[req.request_id]
        assert (g["tokens"], g["stopped"]) == (w["tokens"], w["stopped"])


def test_bundle_make_serving_engine():
    from clipcap_tpu.core.config import CaptionerConfig, MapperConfig
    from clipcap_tpu.models import captioner
    from clipcap_tpu.models.bundle import CaptionerBundle

    map_cfg = MapperConfig(dim_clip=16, dim_embedding=CFG.n_embd,
                           prefix_length=P, clip_length=4, num_layers=1,
                           num_heads=2)
    cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=map_cfg)
    params = captioner.init(jax.random.PRNGKey(0), cap_cfg, CFG)
    bundle = CaptionerBundle(params=params, cap_cfg=cap_cfg, lm_cfg=CFG,
                             tokenizer=None)
    eng = bundle.make_serving_engine(SETTINGS, slots=2, dtype=jnp.float32)
    clip_feats = jax.random.normal(jax.random.PRNGKey(3), (3, 16))
    pool = bundle.project_prefix(clip_feats)
    reqs = [Request(i, i, max_length=c) for i, c in enumerate([3, 8, 5])]
    out = eng.serve(reqs, bundle.lm_decode_params, prefix_pool=pool)
    assert set(out) == {0, 1, 2}
    assert [out[i]["length"] for i in range(3)] == [
        min(len(out[i]["tokens"]), c) for i, c in enumerate([3, 8, 5])
    ]

    # int8 decode plugs in through the same surface
    eng8 = bundle.enable_int8_decode().make_serving_engine(SETTINGS, slots=2)
    out8 = eng8.serve(reqs, bundle.lm_decode_params, prefix_pool=pool)
    assert set(out8) == {0, 1, 2}


def test_cli_serve_shard(tmp_path):
    """cli/serve.serve_shard: CLIP features -> mapper pool -> continuous
    batching -> JSONL captions, through a real tokenizer round-trip."""
    import json

    from clipcap_tpu.cli.serve import serve_shard
    from clipcap_tpu.core.config import CaptionerConfig, MapperConfig
    from clipcap_tpu.models import captioner
    from clipcap_tpu.models.bundle import CaptionerBundle
    from clipcap_tpu.tokenizers import GPT2TokenizerWrapper
    from clipcap_tpu.tokenizers.bpe import ByteLevelBPE, bytes_to_unicode

    base = list(dict.fromkeys(bytes_to_unicode().values()))
    vocab = {t: i for i, t in enumerate(base + ["<|endoftext|>"])}
    tok = GPT2TokenizerWrapper(ByteLevelBPE(vocab, []))

    cfg = GPT2Config(vocab_size=len(vocab), n_positions=96, n_embd=32,
                     n_layer=1, n_head=4)
    map_cfg = MapperConfig(dim_clip=16, dim_embedding=32, prefix_length=3,
                           clip_length=4, num_layers=1, num_heads=2)
    cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=map_cfg)
    params = captioner.init(jax.random.PRNGKey(0), cap_cfg, cfg)
    bundle = CaptionerBundle(params=params, cap_cfg=cap_cfg, lm_cfg=cfg,
                             tokenizer=tok)

    feats = np.random.default_rng(0).normal(size=(9, 16)).astype(np.float32)
    out = tmp_path / "captions.jsonl"
    n = serve_shard(bundle, feats, str(out), slots=4, steps_per_sync=3,
                    map_batch=4, max_new_tokens=6, greedy=True)
    assert n == 9
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert [l["id"] for l in lines] == list(range(9))
    assert all(isinstance(l["caption"], str) for l in lines)
    assert all(0 < l["tokens"] <= 6 for l in lines)

    # declared cap bound (--max_request_length): sizes the ring to the
    # declaration and hard-caps every request at it. Length caps bind
    # through the engine's completion logic, which (engine parity) only
    # runs when eos_token_id is set — so the declared run passes eos.
    eos = len(vocab) - 1
    out2 = tmp_path / "captions_declared.jsonl"
    n2 = serve_shard(bundle, feats, str(out2), slots=4, steps_per_sync=3,
                     map_batch=4, max_new_tokens=6, greedy=True,
                     eos_token_id=eos, max_request_length=4)
    assert n2 == 9
    lines2 = [json.loads(l) for l in out2.read_text().splitlines()]
    assert all(0 < l["tokens"] <= 4 for l in lines2)
    # same greedy stream, truncated: captions that already fit the cap in
    # an eos-aware rerun of the full-length config must be unchanged
    out3 = tmp_path / "captions_eos6.jsonl"
    serve_shard(bundle, feats, str(out3), slots=4, steps_per_sync=3,
                map_batch=4, max_new_tokens=6, greedy=True,
                eos_token_id=eos)
    lines3 = [json.loads(l) for l in out3.read_text().splitlines()]
    for a, b in zip(lines3, lines2):
        if a["tokens"] <= 4:
            assert b["caption"] == a["caption"]


def test_serving_chunk_ladder_matches_solo():
    """Opt-in chunk_sizes ladder (cap-aligned chunk lengths): per-request
    greedy tokens must match solo static-engine runs exactly across
    refills/wraps — chunk boundaries never change a trajectory (the rng
    splits once per STEP from the carried state rng). The ladder is
    opt-in because it was measured SLOWER on the relay (fixed dispatch
    overheads dominate zombie-step savings — serving.py ctor note)."""
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    caps = [3, 6, 5, 2, 4, 6, 1, 5, 3]
    reqs = _requests(9, seed=31, caps=caps)
    eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=SETTINGS, slots=2,
                        steps_per_sync=4, chunk_sizes=(4, 2, 1),
                        dtype=jnp.float32)
    got = eng.serve(list(reqs), params)
    assert eng.last_stats["steps"] > 0
    assert len(eng.last_stats["chunks"]) > 1  # the ladder actually engaged
    for req in reqs:
        want, want_stopped = _engine_single(gpt2, params, req, SETTINGS)
        assert got[req.request_id]["tokens"] == want, req.request_id
        assert got[req.request_id]["stopped"] == want_stopped


def test_cli_serve_pick_slots_for_p50():
    """--target_p50_s picks the largest benched slot count meeting the
    target, falling back to the smallest when nothing fits."""
    from clipcap_tpu.cli.serve import LATENCY_CURVE_P50_S, pick_slots_for_p50

    curve = {128: 0.6, 256: 1.1, 512: 1.4}
    assert pick_slots_for_p50(2.0, curve) == 512  # everything fits -> max tput
    assert pick_slots_for_p50(1.2, curve) == 256
    assert pick_slots_for_p50(0.7, curve) == 128
    assert pick_slots_for_p50(0.1, curve) == 128  # nothing fits -> floor
    # the shipped curve is well-formed: latency grows with slots
    pairs = sorted(LATENCY_CURVE_P50_S.items())
    assert all(a[1] < b[1] for a, b in zip(pairs, pairs[1:]))


def test_serving_data_parallel_matches_single_device():
    """DP serving on the 8-device mesh (parallel/dp.py constrain_cache as
    the serving cache_constraint): batch-sharded slots, replicated params —
    results must match the unconstrained single-device serve, including
    across refills."""
    from clipcap_tpu.core.mesh import MeshSpec, make_mesh
    from clipcap_tpu.parallel.dp import dp_decode_shardings

    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    caps = [3, 9, 5, 12, 7, 4, 2, 6, 11, 8]
    reqs = _requests(10, seed=5, caps=caps)
    want = ServingEngine(
        gpt2, CFG, prefix_len=P, settings=SETTINGS, slots=8,
        steps_per_sync=4, dtype=jnp.float32,
    ).serve(reqs, params)

    mesh = make_mesh(MeshSpec(data=8, model=1))
    sh = dp_decode_shardings(mesh)
    with mesh:
        sp = jax.device_put(params, sh.params(params))
        got = ServingEngine(
            gpt2, CFG, prefix_len=P, settings=SETTINGS, slots=8,
            steps_per_sync=4, dtype=jnp.float32,
            cache_constraint=sh.constrain_cache,
        ).serve(reqs, sp)
    for req in reqs:
        g, w = got[req.request_id], want[req.request_id]
        assert (g["tokens"], g["stopped"]) == (w["tokens"], w["stopped"]), \
            req.request_id


def test_serving_tensor_parallel_gptj_matches_single_device():
    """TP serving (parallel/tp.py constrain_cache as the serving
    cache_constraint): GPT-J heads + ring KV sharded over `model`, batch
    over `data` — results match the unconstrained serve across refills."""
    from clipcap_tpu.core.mesh import MeshSpec, make_mesh
    from clipcap_tpu.parallel.tp import gptj_decode_shardings

    cfg = GPTJConfig(vocab_size=96, n_positions=96, n_embd=32, n_layer=2,
                     n_head=4, rotary_dim=4)
    params = gptj.init(jax.random.PRNGKey(0), cfg)
    caps = [3, 9, 5, 12, 7, 4]
    reqs = _requests(6, seed=11, caps=caps)
    want = ServingEngine(
        gptj, cfg, prefix_len=P, settings=SETTINGS, slots=4,
        steps_per_sync=4, dtype=jnp.float32,
    ).serve(reqs, params)

    mesh = make_mesh(MeshSpec(data=2, model=4))
    sh = gptj_decode_shardings(mesh, params)
    with mesh:
        sp = jax.device_put(params, sh.params)
        got = ServingEngine(
            gptj, cfg, prefix_len=P, settings=SETTINGS, slots=4,
            steps_per_sync=4, dtype=jnp.float32,
            cache_constraint=sh.constrain_cache,
        ).serve(reqs, sp)
    for req in reqs:
        g, w = got[req.request_id], want[req.request_id]
        assert (g["tokens"], g["stopped"]) == (w["tokens"], w["stopped"]), \
            req.request_id


def test_bench_serving_phase_smoke():
    """bench.py's _bench_serving must run end to end (tiny shapes, CPU):
    a bug here would otherwise surface only in the round-end TPU bench."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    cfg = GPT2Config(vocab_size=128, n_positions=128, n_embd=32, n_layer=2,
                     n_head=4)
    params = gpt2.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    out = bench._bench_serving(cfg, gpt2.quantize_params(params),
                               slots=4, n_requests=12)
    assert out["n_requests"] == 12
    assert out["serving_captions_per_sec"] > 0
    assert out["static_engine_captions_per_sec"] > 0


def test_bench_beam_phase_smoke():
    """bench.py's _bench_beam at tiny shapes on CPU (same rationale as the
    serving phase smoke)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    cfg = GPT2Config(vocab_size=128, n_positions=128, n_embd=32, n_layer=2,
                     n_head=4)
    params = gpt2.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    out = bench._bench_beam(cfg, gpt2.quantize_params(params), beam_size=3)
    assert out["caption_latency_ms"] > 0 and out["beam_size"] == 3


def test_serving_fused_step_falls_back_on_cpu():
    """filter_method='fused_step' in serving must be trajectory-identical
    to 'threshold' off-TPU, like the engine."""
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    base = dataclasses.replace(
        SETTINGS, greedy=False, top_p=0.9, repetition_penalty=1.2,
        min_length=2, temperature=0.9,
    )
    reqs = _requests(4, seed=12, caps=[4, 9, 6, 3])
    outs = {}
    for method in ("fused_step", "threshold"):
        eng = ServingEngine(
            gpt2, CFG, prefix_len=P, slots=2, steps_per_sync=4,
            dtype=jnp.float32,
            settings=dataclasses.replace(base, filter_method=method),
        )
        outs[method] = eng.serve(reqs, params, rng=jax.random.PRNGKey(3))
    for r in reqs:
        a, b = outs["fused_step"][r.request_id], outs["threshold"][r.request_id]
        assert (a["tokens"], a["stopped"]) == (b["tokens"], b["stopped"])


def test_serving_lazy_request_generator():
    """serve() pulls from a generator only as slots free: results match
    the eager-list serve, and the producer is never drained ahead of
    capacity by more than the refill look-ahead."""
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    reqs = _requests(6, seed=10, caps=[4, 9, 2, 7, 5, 3])
    eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=SETTINGS, slots=2,
                        steps_per_sync=3, dtype=jnp.float32)
    want = eng.serve(list(reqs), params)

    pulled = []

    def producer():
        for r in reqs:
            pulled.append(r.request_id)
            yield r

    got = eng.serve(producer(), params)
    assert pulled == [r.request_id for r in reqs]  # FIFO, fully consumed
    for r in reqs:
        g, w = got[r.request_id], want[r.request_id]
        assert (g["tokens"], g["stopped"]) == (w["tokens"], w["stopped"])


def test_serving_warmup_and_streaming_results():
    """warmup() precompiles every executable; on_result streams each
    request out at harvest time, in completion order, with the same
    payloads as the returned dict."""
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=SETTINGS, slots=2,
                        steps_per_sync=4, dtype=jnp.float32)
    eng.warmup(params)
    streamed = []
    reqs = _requests(5, seed=8, caps=[4, 9, 2, 7, 5])
    got = eng.serve(reqs, params,
                    on_result=lambda rid, res: streamed.append((rid, res)))
    assert len(streamed) == 5
    assert {rid for rid, _ in streamed} == set(got)
    for rid, res in streamed:
        assert res is got[rid]


def test_serving_rejects_unsupported_settings():
    with pytest.raises(ValueError, match="sentence-length"):
        ServingEngine(gpt2, CFG, prefix_len=P, slots=2,
                      settings=dataclasses.replace(
                          SETTINGS, desired_sentence_length=10, stop_token_id=5))
    with pytest.raises(ValueError, match="per-row top_p"):
        ServingEngine(gpt2, CFG, prefix_len=P, slots=2,
                      settings=dataclasses.replace(
                          SETTINGS, top_p=np.array([0.9, 0.8])))
    with pytest.raises(TypeError, match="ring decode"):
        from clipcap_tpu.models import blip_text

        ServingEngine(blip_text, None, prefix_len=P, slots=2, settings=SETTINGS)


def test_serving_pipelined_loop_matches_sync_loop():
    """The pipelined serve loop (chunks dispatched ahead of harvest) must be
    token-identical to the fully synchronous loop (pipeline_depth=1) and to
    solo static-engine runs. steps_per_sync=1 + depth=4 maximizes the
    interleaving the generation counters guard: slots are harvested AND
    refilled while up to 3 older chunks are still "in flight", so each
    refilled slot sees several zombie stopped=True chunk outputs that must
    not be misread as the new occupant finishing empty."""
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    caps = [2, 8, 3, 12, 5, 1, 4, 6, 2, 7]
    reqs = _requests(10, seed=5, caps=caps)

    def run(depth):
        eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=SETTINGS,
                            slots=2, steps_per_sync=1, dtype=jnp.float32,
                            pipeline_depth=depth)
        return eng.serve(reqs, params)

    deep, sync = run(4), run(1)
    assert set(deep) == set(sync) == {r.request_id for r in reqs}
    for req in reqs:
        want, want_stopped = _engine_single(gpt2, params, req, SETTINGS)
        assert deep[req.request_id]["tokens"] == want, req.request_id
        assert deep[req.request_id]["tokens"] == sync[req.request_id]["tokens"]
        assert deep[req.request_id]["stopped"] == want_stopped


def test_serving_length_admission_matches_fifo_greedy():
    """admission="length" (cap-sorted look-ahead) must return the same
    per-request greedy tokens as FIFO admission — slot/step placement
    changes, per-slot streams don't."""
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    caps = [12, 2, 9, 3, 11, 4, 7, 2, 10, 5]
    reqs = _requests(10, seed=6, caps=caps)
    eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=SETTINGS, slots=2,
                        steps_per_sync=3, dtype=jnp.float32)
    fifo = eng.serve(list(reqs), params)
    sorted_adm = eng.serve(list(reqs), params, admission="length")
    assert set(fifo) == set(sorted_adm) == {r.request_id for r in reqs}
    for r in reqs:
        g, w = sorted_adm[r.request_id], fifo[r.request_id]
        assert (g["tokens"], g["stopped"]) == (w["tokens"], w["stopped"]), \
            r.request_id


def test_serving_eager_retirement_preserves_pending_tokens():
    """Eager cap-based retirement: with deep pipelining and 1-step chunks,
    slots are refilled BEFORE the stopping chunk of the previous occupant
    is harvested (the (slot, gen) pending map carries its tokens). Every
    request must still match its solo engine run exactly."""
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    caps = [2, 8, 3, 12, 5, 1, 4, 6, 2, 7, 3, 9]
    reqs = _requests(12, seed=13, caps=caps)
    eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=SETTINGS,
                        slots=2, steps_per_sync=1, dtype=jnp.float32,
                        pipeline_depth=6)
    got = eng.serve(reqs, params)
    assert set(got) == {r.request_id for r in reqs}
    for req in reqs:
        want, want_stopped = _engine_single(gpt2, params, req, SETTINGS)
        assert got[req.request_id]["tokens"] == want, req.request_id
        assert got[req.request_id]["stopped"] == want_stopped


def test_serving_rejects_unknown_admission():
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=SETTINGS, slots=2,
                        dtype=jnp.float32)
    with pytest.raises(ValueError, match="admission"):
        eng.serve(_requests(2, seed=1), params, admission="priority")


def test_declared_cap_requires_eos():
    """max_request_length < max_new_tokens without eos_token_id must be
    rejected at engine construction: caps bind through the engine-parity
    completion logic (over_length only evaluates with eos handling on),
    so without it rows would outrun the declaration-sized ring."""
    import dataclasses

    no_eos = dataclasses.replace(SETTINGS, eos_token_id=None)
    with pytest.raises(ValueError, match="eos_token_id"):
        ServingEngine(gpt2, CFG, prefix_len=P, settings=no_eos, slots=2,
                      max_request_length=3, dtype=jnp.float32)


def test_bench_clip_guided_phase_smoke():
    """bench.py's _bench_clip_guided at tiny shapes on CPU (same rationale
    as the serving/beam phase smokes)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench
    from clipcap_tpu.core.config import CLIPTextConfig

    cfg = GPT2Config(vocab_size=64, n_positions=128, n_embd=32, n_layer=2,
                     n_head=4)
    tcfg = CLIPTextConfig(vocab_size=64, context_length=16, width=32,
                          layers=1, heads=4, output_dim=16)
    out = bench._bench_clip_guided(branching=2, look_ahead=2,
                                   max_decode_length=6, lm_cfg=cfg,
                                   text_cfg=tcfg)
    assert out["ms_per_image"] > 0


def test_bench_config3_pipeline_phase_smoke():
    """bench.py's _bench_config3_pipeline at tiny shapes on CPU (same
    rationale as the serving/beam phase smokes)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    cfg = GPT2Config(vocab_size=128, n_positions=128, n_embd=32, n_layer=2,
                     n_head=4)
    params = gpt2.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    out = bench._bench_config3_pipeline(
        cfg, gpt2.quantize_params(params), n_beam_images=2, beam_size=2,
        nucleus_batch=2, vit_variant="ViT-B/32")
    assert out["nucleus_captions_per_sec"] > 0
    assert out["beam_captions_per_sec"] > 0


def test_bench_tokenizer_phase_smoke():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    out = bench._bench_tokenizer(n_captions=500)
    assert out["tokens_per_sec"] > 0 and out["n_merges"] > 0


def test_serving_declared_max_request_length_matches_solo():
    """max_request_length shrinks the ring to prompt + (decl+1) + 1; token
    streams must still match solo engine runs across refills and wraps,
    and over-cap requests are rejected."""
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    caps = [3, 6, 5, 6, 2, 4, 1, 6, 3]
    reqs = _requests(9, seed=21, caps=caps)
    eng = ServingEngine(gpt2, CFG, prefix_len=P, settings=SETTINGS, slots=2,
                        steps_per_sync=3, dtype=jnp.float32,
                        max_request_length=6)
    assert eng.ring_len == P + 7 + 1  # < P + 12 + 1
    got = eng.serve(list(reqs), params)
    for req in reqs:
        want, want_stopped = _engine_single(gpt2, params, req, SETTINGS)
        assert got[req.request_id]["tokens"] == want, req.request_id
        assert got[req.request_id]["stopped"] == want_stopped

    with pytest.raises(ValueError, match="max_request_length"):
        eng.serve(_requests(2, seed=1, caps=[3, 9]), params)
    # a request with NO cap exceeds any declaration (scan bound 12 > 6)
    with pytest.raises(ValueError, match="max_request_length"):
        eng.serve(_requests(1, seed=1), params)
