"""int8 weight-streaming GPT-J decode (models/gptj.py quantize_params /
gptj_int8): numerics bounded against the f32 cached path and engine
integration. GPT-J 6B streams ~12 GB bf16
weights per token — this path halves the stream like gpt2's (which is
speed-gated in bench.py); tests here gate accuracy and wiring.
"""

import numpy as np
import jax
import jax.numpy as jnp

from clipcap_tpu.core.config import GPTJConfig
from clipcap_tpu.decode import engine
from clipcap_tpu.models import gptj

CFG = GPTJConfig(vocab_size=256, n_positions=64, n_embd=64, n_layer=3,
                 n_head=4, rotary_dim=8)


def _params():
    return gptj.init(jax.random.PRNGKey(0), CFG)


def test_quantize_params_structure():
    q = gptj.quantize_params(_params())
    assert q["blocks"]["attn"]["wq"]["q"].dtype == jnp.int8
    assert q["blocks"]["attn"]["wq"]["s"].shape == (CFG.n_layer, CFG.n_embd)
    assert q["blocks"]["mlp"]["w_in"]["q"].shape == (CFG.n_layer, CFG.n_embd, 4 * CFG.n_embd)
    assert q["lm_head"]["w"]["q"].shape == (CFG.n_embd, CFG.vocab_size)
    # embedding table stays dense for lookups; lm_head keeps its bias
    assert q["wte"].shape == (CFG.vocab_size, CFG.n_embd)
    assert q["lm_head"]["b"].shape == (CFG.vocab_size,)


def test_int8_prefill_logits_close_to_f32():
    params = _params()
    q = gptj.quantize_params(params)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 10, CFG.n_embd)) * 0.1

    cache = gptj.init_cache(CFG, batch=2, max_len=16)
    ref, _ = gptj.prefill(params, CFG, embeds, cache)
    cache8 = gptj.init_cache_q8(CFG, batch=2, max_len=16)
    got, _ = gptj.prefill_q8(q, CFG, embeds.astype(jnp.bfloat16), cache8,
                             full_logits=True)

    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.999, corr
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.9, agree


def test_int8_decode_steps_track_f32_greedy():
    params = _params()
    q = gptj.quantize_params(params)
    b, p, n = 4, 6, 16
    prefix = jax.random.normal(jax.random.PRNGKey(2), (b, p, CFG.n_embd)) * 0.1

    def greedy(mod_prefill, mod_step, prm, cache, prefix):
        logits, cache = mod_prefill(prm, CFG, prefix, cache)
        tok = jnp.argmax(logits[:, -1], axis=-1)
        toks = [tok]
        for _ in range(n - 1):
            emb = gptj.embed_tokens(prm, tok)[:, None, :].astype(prefix.dtype)
            logits, cache = mod_step(prm, CFG, emb, cache)
            tok = jnp.argmax(logits, axis=-1)
            toks.append(tok)
        return np.asarray(jnp.stack(toks, axis=1))

    ref = greedy(gptj.prefill, gptj.decode_step, params,
                 gptj.init_cache(CFG, batch=b, max_len=p + n), prefix)
    got = greedy(gptj.prefill_q8, gptj.decode_step_q8, q,
                 gptj.init_cache_q8(CFG, batch=b, max_len=p + n),
                 prefix.astype(jnp.bfloat16))
    agree = (ref == got).mean()
    assert agree >= 0.75, f"token agreement {agree}"


def test_engine_runs_gptj_int8_module():
    params = _params()
    q = gptj.quantize_params(params)
    prefix = (jax.random.normal(jax.random.PRNGKey(4), (3, 5, CFG.n_embd)) * 0.1
              ).astype(jnp.bfloat16)
    settings = engine.GenerationSettings(max_new_tokens=8, greedy=True, eos_token_id=255)
    out = engine.generate(gptj.gptj_int8, q, CFG, prefix, settings)
    assert out["tokens"].shape == (3, 8)
    out2 = engine.generate(gptj.gptj_int8, q, CFG, prefix, settings)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), np.asarray(out2["tokens"]))


def test_bundle_int8_decode_switches_decode_surface_only():
    """enable_int8_decode swaps lm_decode/lm_decode_params (used by the
    samplers, beam search and cli/infer) while forward/loss keep the
    full-precision params; beam search reorders the int8 cache's scale
    slabs via the generic _map_beam_axis."""
    from clipcap_tpu.core.config import CaptionerConfig, MapperConfig
    from clipcap_tpu.decode.beam import beam_search
    from clipcap_tpu.models import captioner
    from clipcap_tpu.models.bundle import CaptionerBundle

    map_cfg = MapperConfig(dim_clip=24, dim_embedding=CFG.n_embd,
                           prefix_length=4, clip_length=4,
                           num_layers=1, num_heads=2)
    cap_cfg = CaptionerConfig(lm_type="gptj", mapper=map_cfg)
    params = captioner.init(jax.random.PRNGKey(0), cap_cfg, CFG)
    bundle = CaptionerBundle(params=params, cap_cfg=cap_cfg, lm_cfg=CFG,
                             tokenizer=None)

    assert bundle.lm_decode is gptj
    bundle.enable_int8_decode()
    assert bundle.lm_decode is gptj.gptj_int8
    assert bundle.lm_decode_params["blocks"]["attn"]["wq"]["q"].dtype == jnp.int8
    # training/loss surface untouched
    assert bundle.params["lm"]["blocks"]["attn"]["wq"].dtype != jnp.int8

    prompt = (jax.random.normal(jax.random.PRNGKey(5), (1, 4, CFG.n_embd)) * 0.1
              ).astype(jnp.bfloat16)
    out = beam_search(bundle.lm_decode, bundle.lm_decode_params, CFG, prompt,
                      beam_size=3, max_new_tokens=6)
    assert out["tokens"].shape == (3, 6)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        bundle.enable_tensor_parallel(2)


def test_apply_q8_full_sequence_matches_bf16():
    """W8A16 full-sequence TRAINING forward (gptj.apply_q8): dequant-in-scan
    over quantize_params output tracks the bf16 apply within quantization
    noise, honours the mask and the logits_slice, and runs under remat.
    Exists for BASELINE config #4's prefix tuning, whose frozen 6B LM only
    fits a 16 GB chip in int8 (bench._bench_gptj_prefix_train)."""
    p = _params()
    q = gptj.quantize_params(p)
    p_bf16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, CFG.n_embd)) * 0.2
    mask = jnp.ones((2, 10), bool).at[1, 7:].set(False)

    ref = gptj.apply(p_bf16, CFG, x.astype(jnp.bfloat16), attention_mask=mask)
    out = gptj.apply_q8(q, CFG, x, attention_mask=mask, remat=True)
    assert out.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref[:, :7])))
    err = float(jnp.max(jnp.abs(out[:, :7].astype(jnp.float32)
                                - ref[:, :7].astype(jnp.float32))))
    assert err < 0.05 * max(scale, 1.0)

    sliced = gptj.apply_q8(q, CFG, x, attention_mask=mask,
                           logits_slice=(3, 9))
    np.testing.assert_allclose(np.asarray(sliced, np.float32),
                               np.asarray(out[:, 3:9], np.float32),
                               atol=2e-2, rtol=2e-2)


def test_prefix_only_train_step_over_int8_frozen_lm():
    """Prefix-only training with the LM frozen IN INT8 (config #4's
    single-chip recipe): the partitioned compute_grads differentiates the
    mapper only (int8 leaves never reach value_and_grad), the mapper
    updates, and the quantized LM (incl. scales) is bit-identical after
    two steps."""
    from clipcap_tpu.core.config import (
        CaptionerConfig, MapperConfig, TrainConfig,
    )
    from clipcap_tpu.models import mapper as mapper_mod
    from clipcap_tpu.train import create_train_state, make_train_step

    q = gptj.quantize_params(_params())
    map_cfg = MapperConfig(dim_clip=16, dim_embedding=CFG.n_embd,
                           prefix_length=4, clip_length=3, num_layers=1,
                           num_heads=2)
    cap_cfg = CaptionerConfig(lm_type="gpt-j", mapper=map_cfg,
                              prefix_only=True)
    tc = TrainConfig(optimizer_lr=1e-3, scheduler_warmup_steps=1,
                     total_steps=10, gradient_clip_val=-1.0,
                     bf16_compute=True, remat=True)
    params = {"mapper": mapper_mod.init(jax.random.PRNGKey(2), map_cfg),
              "lm": q}
    state, tx = create_train_state(jax.random.PRNGKey(0), cap_cfg, CFG, tc,
                                   params=params)

    def lm_apply(pl, e, attention_mask=None, logits_slice=None):
        return gptj.apply_q8(pl, CFG, e, attention_mask=attention_mask,
                             remat=True, logits_slice=logits_slice)

    step = make_train_step(cap_cfg, CFG, tc, tx, donate=False,
                           lm_apply=lm_apply)
    rng = np.random.default_rng(0)
    toks = rng.integers(1, CFG.vocab_size, size=(2, 6)).astype(np.int64)
    toks[:, -2:] = -1
    batch = {"tokens": jnp.asarray(toks),
             "prefix": jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))}
    s1, m1 = step(state, batch)
    s2, m2 = step(s1, batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    moved = sum(
        float(jnp.sum(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(jax.tree_util.tree_leaves(state.params["mapper"]),
                        jax.tree_util.tree_leaves(s2.params["mapper"])))
    assert moved > 0.0
    for a, b in zip(jax.tree_util.tree_leaves(state.params["lm"]),
                    jax.tree_util.tree_leaves(s2.params["lm"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
