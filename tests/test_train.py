"""Training-stack tests: AutoClip vs the reference's numpy percentile
semantics, loss decrease on a tiny overfit task, 8-device data-parallel
step on the fake CPU mesh, prefix-only freezing, checkpoint round-trip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clipcap_tpu.core.config import CaptionerConfig, GPT2Config, MapperConfig, TrainConfig
from clipcap_tpu.core.mesh import MeshSpec, make_mesh, shard_batch
from clipcap_tpu.train import (
    autoclip_init,
    autoclip_update,
    create_train_state,
    make_train_step,
)
from clipcap_tpu.train.autoclip import global_norm
from clipcap_tpu.train.optim import linear_warmup_schedule
from clipcap_tpu.train.checkpoints import restore_checkpoint, save_checkpoint, load_config

LM_CFG = GPT2Config(vocab_size=64, n_positions=64, n_embd=32, n_layer=2, n_head=4)
MAP_CFG = MapperConfig(
    dim_clip=16, dim_embedding=32, prefix_length=4, clip_length=2,
    num_layers=1, num_heads=2,
)
CAP_CFG = CaptionerConfig(lm_type="gpt2", mapper=MAP_CFG)


def test_autoclip_matches_numpy_percentile():
    """History + percentile clip must match the reference's numpy math
    (auto_clip.py:24-31: append current norm, clip to np.percentile)."""
    state = autoclip_init(max_history=16)
    rng = np.random.default_rng(0)
    history = []
    for i in range(20):  # exceeds the ring size: oldest entries drop
        g = {"w": jnp.asarray(rng.normal(size=(5, 5)).astype(np.float32) * (i + 1))}
        norm = float(global_norm(g))
        history.append(norm)
        ref_hist = history[-16:]
        clipped, state, metrics = autoclip_update(state, g, percentile=10.0)
        want_clip = np.percentile(ref_hist, 10.0)
        np.testing.assert_allclose(float(metrics["autoclip_value"]), want_clip, rtol=1e-5)
        want_norm = min(norm, want_clip)
        np.testing.assert_allclose(
            float(global_norm(clipped)), want_norm, rtol=1e-4
        )


def test_autoclip_skips_nonfinite():
    state = autoclip_init(max_history=8)
    g = {"w": jnp.asarray([[1.0, jnp.inf]])}
    _, state, _ = autoclip_update(state, g, percentile=10.0)
    assert int(state.count) == 0  # inf norm not recorded
    g = {"w": jnp.asarray([[3.0, 4.0]])}
    _, state, m = autoclip_update(state, g, percentile=10.0)
    assert int(state.count) == 1
    np.testing.assert_allclose(float(m["autoclip_value"]), 5.0, rtol=1e-5)


def test_linear_warmup_schedule():
    sched = linear_warmup_schedule(lr=1.0, warmup_steps=10, total_steps=110)
    np.testing.assert_allclose(float(sched(0)), 0.0)
    np.testing.assert_allclose(float(sched(5)), 0.5)
    np.testing.assert_allclose(float(sched(10)), 1.0)
    np.testing.assert_allclose(float(sched(60)), 0.5)
    np.testing.assert_allclose(float(sched(110)), 0.0)


def _tiny_batch(rng, b=8, t=8):
    tokens = rng.integers(1, 64, size=(b, t)).astype(np.int64)
    tokens[:, -2:] = -1
    prefix = rng.normal(size=(b, 16)).astype(np.float32)
    return {"tokens": tokens, "prefix": prefix}


def test_loss_decreases_overfit():
    train_cfg = TrainConfig(
        optimizer_lr=3e-3, scheduler_warmup_steps=2, total_steps=400,
        gradient_clip_val=-1.0, autoclip_history=64, remat=False, bf16_compute=False,
    )
    state, tx = create_train_state(jax.random.PRNGKey(0), CAP_CFG, LM_CFG, train_cfg)
    step = make_train_step(CAP_CFG, LM_CFG, train_cfg, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, _tiny_batch(np.random.default_rng(0)))
    losses = []
    for _ in range(60):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses
    assert int(state.step) == 60


def test_prefix_only_freezes_lm():
    cfg = CaptionerConfig(lm_type="gpt2", mapper=MAP_CFG, prefix_only=True)
    train_cfg = TrainConfig(optimizer_lr=1e-2, scheduler_warmup_steps=1,
                            total_steps=10, gradient_clip_val=1.0, remat=False)
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg, LM_CFG, train_cfg)
    lm_before = jax.device_get(state.params["lm"])
    map_before = jax.device_get(state.params["mapper"])
    step = make_train_step(cfg, LM_CFG, train_cfg, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, _tiny_batch(np.random.default_rng(1)))
    for _ in range(3):  # step 0 has lr=0 (linear warmup starts at zero)
        state, _ = step(state, batch)
    lm_after = jax.device_get(state.params["lm"])
    map_after = jax.device_get(state.params["mapper"])
    # LM untouched, mapper moved
    for a, b in zip(jax.tree_util.tree_leaves(lm_before), jax.tree_util.tree_leaves(lm_after)):
        np.testing.assert_array_equal(a, b)
    moved = [
        not np.allclose(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(map_before), jax.tree_util.tree_leaves(map_after)
        )
    ]
    assert any(moved)


def test_data_parallel_step_on_8_device_mesh():
    mesh = make_mesh(MeshSpec(data=8, model=1))
    train_cfg = TrainConfig(optimizer_lr=1e-3, scheduler_warmup_steps=2,
                            total_steps=20, gradient_clip_val=-1.0,
                            autoclip_history=32, remat=False)
    state, tx = create_train_state(jax.random.PRNGKey(0), CAP_CFG, LM_CFG, train_cfg)
    from clipcap_tpu.parallel import shard_params

    state = state._replace(params=shard_params(state.params, mesh))
    step = make_train_step(CAP_CFG, LM_CFG, train_cfg, tx, mesh=mesh, donate=False)
    batch = shard_batch(mesh, _tiny_batch(np.random.default_rng(2), b=16))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # single-device oracle: same batch unsharded must give the same loss
    state2, tx2 = create_train_state(jax.random.PRNGKey(0), CAP_CFG, LM_CFG, train_cfg)
    step2 = make_train_step(CAP_CFG, LM_CFG, train_cfg, tx2, donate=False)
    batch2 = jax.tree_util.tree_map(jnp.asarray, _tiny_batch(np.random.default_rng(2), b=16))
    _, metrics2 = step2(state2, batch2)
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics2["loss"]), rtol=1e-5)


def test_grad_accumulation_matches_full_batch():
    train_cfg_full = TrainConfig(optimizer_lr=1e-3, scheduler_warmup_steps=2,
                                 total_steps=20, gradient_clip_val=10.0, remat=False,
                                 bf16_compute=False)
    train_cfg_acc = TrainConfig(optimizer_lr=1e-3, scheduler_warmup_steps=2,
                                total_steps=20, gradient_clip_val=10.0,
                                accumulate_grad_batches=2, remat=False,
                                bf16_compute=False)
    b = _tiny_batch(np.random.default_rng(3), b=8)
    state, tx = create_train_state(jax.random.PRNGKey(1), CAP_CFG, LM_CFG, train_cfg_full)
    stepf = make_train_step(CAP_CFG, LM_CFG, train_cfg_full, tx, donate=False)
    _, m_full = stepf(state, jax.tree_util.tree_map(jnp.asarray, b))

    state2, tx2 = create_train_state(jax.random.PRNGKey(1), CAP_CFG, LM_CFG, train_cfg_acc)
    stepa = make_train_step(CAP_CFG, LM_CFG, train_cfg_acc, tx2, donate=False)
    micro = {k: np.stack([v[:4], v[4:]]) for k, v in b.items()}
    _, m_acc = stepa(state2, jax.tree_util.tree_map(jnp.asarray, micro))
    # mean-of-micro-means == full-batch mean only for equal valid counts;
    # here padding is identical across rows, so they agree
    np.testing.assert_allclose(float(m_acc["loss"]), float(m_full["loss"]), rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    train_cfg = TrainConfig(total_steps=10, remat=False)
    state, tx = create_train_state(jax.random.PRNGKey(0), CAP_CFG, LM_CFG, train_cfg)
    path = tmp_path / "ckpt_final"
    save_checkpoint(str(path), state, cap_cfg=CAP_CFG, lm_cfg=LM_CFG, train_cfg=train_cfg)
    restored = restore_checkpoint(str(path), template=jax.device_get(state))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state)),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cfg = load_config(str(path))
    assert cfg["captioner"]["lm_type"] == "gpt2"
    assert cfg["lm"]["n_embd"] == 32


def test_bf16_compute_policy():
    """use_16bit_precision equivalent: forward in bf16, master params f32."""
    train_cfg = TrainConfig(optimizer_lr=1e-3, scheduler_warmup_steps=1,
                            total_steps=20, gradient_clip_val=1.0, remat=False,
                            bf16_compute=True)
    state, tx = create_train_state(jax.random.PRNGKey(0), CAP_CFG, LM_CFG, train_cfg)
    step = make_train_step(CAP_CFG, LM_CFG, train_cfg, tx, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, _tiny_batch(np.random.default_rng(4)))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # still learns
    # master params stay f32
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
