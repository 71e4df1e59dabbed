"""Captioner integration across all three LM families (reference lms/):
forward/loss/train-step/decode must work with gpt2, gptj and t5/t0.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clipcap_tpu.core.config import (
    CaptionerConfig,
    GPT2Config,
    GPTJConfig,
    MapperConfig,
    T5Config,
    TrainConfig,
)
from clipcap_tpu.decode import GenerationSettings, generate
from clipcap_tpu.lm.registry import get_lm
from clipcap_tpu.models import captioner
from clipcap_tpu.train import create_train_state, make_train_step

MAP_CFG = MapperConfig(dim_clip=16, dim_embedding=32, prefix_length=4,
                       clip_length=2, num_layers=1, num_heads=2)

FAMILIES = {
    "gpt2": GPT2Config(vocab_size=64, n_positions=64, n_embd=32, n_layer=2, n_head=4),
    "gptj": GPTJConfig(vocab_size=64, n_positions=64, n_embd=32, n_layer=2,
                       n_head=4, rotary_dim=8),
    "t5": T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                   num_decoder_layers=1, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=16),
}


@pytest.mark.parametrize("lm_type", list(FAMILIES))
def test_forward_loss_train_decode(lm_type):
    lm_cfg = FAMILIES[lm_type]
    cap_cfg = CaptionerConfig(lm_type=lm_type, mapper=MAP_CFG)
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 64, size=(2, 8)).astype(np.int64)
    tokens[:, -2:] = -1
    prefix = rng.normal(size=(2, 16)).astype(np.float32)

    params = captioner.init(jax.random.PRNGKey(0), cap_cfg, lm_cfg)
    logits = captioner.forward(params, cap_cfg, lm_cfg, jnp.asarray(np.where(tokens >= 0, tokens, 0)),
                               jnp.asarray(prefix))
    assert logits.shape == (2, 4 + 8, 64)

    loss, _ = captioner.caption_loss(params, cap_cfg, lm_cfg,
                                     jnp.asarray(tokens), jnp.asarray(prefix))
    assert np.isfinite(float(loss))

    # one train step
    tcfg = TrainConfig(optimizer_lr=1e-3, scheduler_warmup_steps=1,
                       total_steps=10, gradient_clip_val=1.0, remat=False)
    state, tx = create_train_state(jax.random.PRNGKey(0), cap_cfg, lm_cfg, tcfg,
                                   params=params)
    step = make_train_step(cap_cfg, lm_cfg, tcfg, tx, donate=False)
    state, metrics = step(state, {"tokens": jnp.asarray(tokens), "prefix": jnp.asarray(prefix)})
    assert np.isfinite(float(metrics["loss"]))

    # KV-cached greedy decode through the unified engine
    lm = get_lm(lm_type)
    proj = captioner.project_prefix(params, cap_cfg, jnp.asarray(prefix))
    out = generate(lm, params["lm"], lm_cfg, proj,
                   GenerationSettings(max_new_tokens=6, greedy=True))
    assert out["tokens"].shape == (2, 6)
    assert (np.asarray(out["tokens"]) < 64).all()


def test_device_prefetch_pipeline():
    from clipcap_tpu.data.pipeline import device_prefetch

    def batches():
        for i in range(5):
            yield {"x": np.full((2, 2), i, np.float32)}

    got = list(device_prefetch(batches(), size=2))
    assert len(got) == 5
    for i, b in enumerate(got):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 2), i))
