"""int8 weight-streaming decode path (models/gpt2.py quantize_params /
gpt2_int8): numerics bounded against the f32 cached path, and engine
integration. The int8 path exists for HBM-bound GPT2-XL decode (VERDICT
round-1 item 2); these tests gate its accuracy, bench.py gates its speed.
"""

import numpy as np
import jax
import jax.numpy as jnp

from clipcap_tpu.core.config import GPT2Config
from clipcap_tpu.decode import engine
from clipcap_tpu.models import gpt2

CFG = GPT2Config(vocab_size=256, n_positions=64, n_embd=64, n_layer=3, n_head=4)


def _params():
    return gpt2.init(jax.random.PRNGKey(0), CFG)


def test_quantize_params_structure():
    params = _params()
    q = gpt2.quantize_params(params)
    assert q["blocks"]["attn"]["c_attn"]["w"]["q"].dtype == jnp.int8
    assert q["blocks"]["attn"]["c_attn"]["w"]["s"].shape == (CFG.n_layer, 3 * CFG.n_embd)
    assert q["lm_head"]["q"].shape == (CFG.n_embd, CFG.vocab_size)
    # embedding table stays dense for lookups
    assert q["wte"].shape == (CFG.vocab_size, CFG.n_embd)


def test_int8_prefill_logits_close_to_f32():
    params = _params()
    q = gpt2.quantize_params(params)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 10, CFG.n_embd)) * 0.1

    cache = gpt2.init_cache(CFG, batch=2, max_len=16)
    ref, _ = gpt2.prefill(params, CFG, embeds, cache, full_logits=True)
    cache8 = gpt2.init_cache_q8(CFG, batch=2, max_len=16)
    got, _ = gpt2.prefill_q8(q, CFG, embeds.astype(jnp.bfloat16), cache8, full_logits=True)

    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    # int8 weights + bf16 activations: logits track f32 closely
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.999, corr
    # argmax of the next-token distribution agrees on most positions
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.9, agree


def test_int8_decode_steps_track_f32_greedy():
    params = _params()
    q = gpt2.quantize_params(params)
    b, p, n = 4, 6, 16
    prefix = jax.random.normal(jax.random.PRNGKey(2), (b, p, CFG.n_embd)) * 0.1

    def greedy(mod_prefill, mod_step, prm, cache, prefix):
        logits, cache = mod_prefill(prm, CFG, prefix, cache)
        tok = jnp.argmax(logits[:, -1], axis=-1)
        toks = [tok]
        for _ in range(n - 1):
            emb = gpt2.embed_tokens(prm, tok)[:, None, :].astype(prefix.dtype)
            logits, cache = mod_step(prm, CFG, emb, cache)
            tok = jnp.argmax(logits, axis=-1)
            toks.append(tok)
        return np.asarray(jnp.stack(toks, axis=1))

    ref = greedy(gpt2.prefill, gpt2.decode_step, params,
                 gpt2.init_cache(CFG, batch=b, max_len=p + n), prefix)
    got = greedy(gpt2.prefill_q8, gpt2.decode_step_q8, q,
                 gpt2.init_cache_q8(CFG, batch=b, max_len=p + n),
                 prefix.astype(jnp.bfloat16))
    agree = (ref == got).mean()
    # greedy trajectories diverge once a single argmax flips; bound the
    # disagreement rather than demanding exactness (VERDICT item 2)
    assert agree >= 0.75, f"token agreement {agree}"


def test_engine_runs_int8_module():
    params = _params()
    q = gpt2.quantize_params(params)
    prefix = (jax.random.normal(jax.random.PRNGKey(3), (3, 5, CFG.n_embd)) * 0.1
              ).astype(jnp.bfloat16)
    settings = engine.GenerationSettings(max_new_tokens=8, greedy=True, eos_token_id=255)
    out = engine.generate(gpt2.gpt2_int8, q, CFG, prefix, settings)
    assert out["tokens"].shape == (3, 8)
    assert out["tokens"].dtype == jnp.int32
    # deterministic
    out2 = engine.generate(gpt2.gpt2_int8, q, CFG, prefix, settings)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), np.asarray(out2["tokens"]))
