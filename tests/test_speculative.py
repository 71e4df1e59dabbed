"""Speculative greedy decoding must be BIT-IDENTICAL to target-only
greedy decode for any draft — the draft only controls how many target
forwards are spent. Pinned against decode/engine.generate(greedy=True)
with: the target itself as draft (full acceptance, ~(g+1)x fewer
chunks), a deliberately unrelated draft (near-zero acceptance), the
int8 target module (the per-token fallback chunk path), and eos
stopping."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_after_module():
    """The while_loop-over-two-KV-caches executables this module compiles
    trigger a latent jaxlib CPU-backend bug: with them resident, a LATER
    unrelated pjit compile (test_tp_decode in full-suite order) segfaults
    inside backend_compile_and_load. Clearing the compilation caches after
    the module keeps the full suite green; the bug does not reproduce with
    these tests run in isolation or in small groups."""
    yield
    jax.clear_caches()

from clipcap_tpu.core.config import GPT2Config, GPTJConfig
from clipcap_tpu.decode import GenerationSettings, generate
from clipcap_tpu.decode.speculative import speculative_greedy
from clipcap_tpu.models import gpt2, gptj

T_CFG = GPT2Config(vocab_size=211, n_positions=128, n_embd=48, n_layer=3, n_head=4)
D_CFG = GPT2Config(vocab_size=211, n_positions=128, n_embd=24, n_layer=1, n_head=2)


@pytest.fixture(scope="module")
def world():
    tp = gpt2.init(jax.random.PRNGKey(0), T_CFG)
    dp = gpt2.init(jax.random.PRNGKey(9), D_CFG)
    t_prompt = jax.random.normal(jax.random.PRNGKey(1), (1, 5, T_CFG.n_embd)) * 0.3
    d_prompt = jax.random.normal(jax.random.PRNGKey(2), (1, 5, D_CFG.n_embd)) * 0.3
    ref = generate(gpt2, tp, T_CFG, t_prompt,
                   GenerationSettings(max_new_tokens=20, greedy=True))
    return tp, dp, t_prompt, d_prompt, np.asarray(ref["tokens"])


def test_self_draft_accepts_everything(world):
    tp, _, t_prompt, _, ref = world
    out = speculative_greedy(gpt2, tp, T_CFG, gpt2, tp, T_CFG,
                             t_prompt, t_prompt, max_new_tokens=20, gamma=4)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), ref)
    assert int(out["lengths"][0]) == 20
    # every proposal agrees -> each chunk emits gamma+1 tokens
    assert int(out["chunks"][0]) <= -(-(20 - 1) // 5) + 1


def test_unrelated_draft_still_bit_identical(world):
    tp, dp, t_prompt, d_prompt, ref = world
    out = speculative_greedy(gpt2, tp, T_CFG, gpt2, dp, D_CFG,
                             t_prompt, d_prompt, max_new_tokens=20, gamma=3)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), ref)
    # a random unrelated draft still costs at most one chunk per token
    assert int(out["chunks"][0]) <= 20


def test_int8_target_uses_fallback_chunk_path(world):
    tp, dp, t_prompt, d_prompt, _ = world
    q = gpt2.quantize_params(tp)
    ref = generate(gpt2.gpt2_int8, q, T_CFG, t_prompt.astype(jnp.bfloat16),
                   GenerationSettings(max_new_tokens=12, greedy=True))
    out = speculative_greedy(gpt2.gpt2_int8, q, T_CFG, gpt2, dp, D_CFG,
                             t_prompt.astype(jnp.bfloat16), d_prompt,
                             max_new_tokens=12, gamma=3)
    np.testing.assert_array_equal(np.asarray(out["tokens"]),
                                  np.asarray(ref["tokens"]))


def test_eos_stops_like_plain_greedy(world):
    tp, dp, t_prompt, d_prompt, ref = world
    # pick a token plain greedy actually emits mid-sequence as the "eos"
    eos = int(ref[0, 7])
    want = generate(gpt2, tp, T_CFG, t_prompt,
                    GenerationSettings(max_new_tokens=20, greedy=True,
                                       eos_token_id=eos))
    out = speculative_greedy(gpt2, tp, T_CFG, gpt2, dp, D_CFG,
                             t_prompt, d_prompt, max_new_tokens=20, gamma=4,
                             eos_token_id=eos)
    assert int(out["lengths"][0]) == int(want["lengths"][0])
    n = int(want["lengths"][0])
    np.testing.assert_array_equal(np.asarray(out["tokens"])[0, :n],
                                  np.asarray(want["tokens"])[0, :n])


def test_gptj_target(world):
    """Cross-family: GPT-J target with a GPT-2 draft (shared vocab)."""
    _, dp, _, d_prompt, _ = world
    jcfg = GPTJConfig(vocab_size=211, n_positions=128, n_embd=48, n_layer=2,
                      n_head=4, rotary_dim=8)
    jp = gptj.init(jax.random.PRNGKey(3), jcfg)
    j_prompt = jax.random.normal(jax.random.PRNGKey(4), (1, 5, jcfg.n_embd)) * 0.3
    ref = generate(gptj, jp, jcfg, j_prompt,
                   GenerationSettings(max_new_tokens=15, greedy=True))
    out = speculative_greedy(gptj, jp, jcfg, gpt2, dp, D_CFG,
                             j_prompt, d_prompt, max_new_tokens=15, gamma=3)
    np.testing.assert_array_equal(np.asarray(out["tokens"]),
                                  np.asarray(ref["tokens"]))


def test_bench_speculative_distilled_phase_smoke():
    """bench.py's _bench_speculative_distilled at tiny shapes on CPU:
    rollouts -> CE distillation -> acceptance/latency measurement. Lives
    in THIS module for the cache-clearing teardown (the while_loop
    executables it compiles trip the latent pjit segfault otherwise —
    see _clear_jax_caches_after_module)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    tgt = GPT2Config(vocab_size=64, n_positions=128, n_embd=32, n_layer=2,
                     n_head=4)
    dr = GPT2Config(vocab_size=64, n_positions=128, n_embd=16, n_layer=1,
                    n_head=2)
    out = bench._bench_speculative_distilled(
        g=2, n_prompts=8, pfx=4, rollout=6, train_steps=50, train_batch=4,
        n_eval=2, xl_cfg=tgt, dr_cfg=dr)
    assert out["plain_ms_per_token"] > 0
    assert out["realized_ms_per_token"] > 0
    assert len(out["acceptance_curve"]) >= 2
    assert out["tokens_per_chunk"] >= 1.0  # every chunk emits >= 1 token
