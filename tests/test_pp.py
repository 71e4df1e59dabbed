"""Pipeline parallelism (parallel/pp.py) on the 8-device virtual CPU mesh:
the pipelined layer stack must match the single-stack gpt2.apply forward
exactly, and a pipeline-parallel train step must reproduce the plain
(replicated) train step's loss and parameter update.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clipcap_tpu.core.config import (
    CaptionerConfig, GPT2Config, MapperConfig, TrainConfig,
)
from clipcap_tpu.core.mesh import MeshSpec, make_mesh, shard_batch
from clipcap_tpu.models import captioner, gpt2
from clipcap_tpu.parallel.pp import make_gpt2_pp_apply, pp_param_shardings

CFG = GPT2Config(vocab_size=97, n_positions=64, n_embd=32, n_layer=4, n_head=4)


def _mesh(data=2, pipe=4):
    if len(jax.devices()) < data * pipe:
        pytest.skip(f"needs {data * pipe} devices")
    return make_mesh(MeshSpec(data=data, pipe=pipe, model=1),
                     devices=jax.devices()[: data * pipe])


@pytest.fixture(scope="module")
def params():
    return gpt2.init(jax.random.PRNGKey(0), CFG)


def test_pp_apply_matches_single_stack(params):
    mesh = _mesh()
    b, t = 8, 10
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, t, CFG.n_embd))
    mask = jnp.asarray(np.random.default_rng(0).integers(0, 2, size=(b, t)))
    mask = mask.at[:, 0].set(1)

    want = gpt2.apply(params, CFG, embeds, attention_mask=mask)
    with mesh:
        pp_apply = make_gpt2_pp_apply(CFG, mesh, n_micro=4)
        sh_params = jax.device_put(params, pp_param_shardings(params, mesh))
        got = jax.jit(pp_apply)(sh_params, embeds, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pp_apply_logits_slice(params):
    mesh = _mesh()
    embeds = jax.random.normal(jax.random.PRNGKey(2), (8, 12, CFG.n_embd))
    want = gpt2.apply(params, CFG, embeds, logits_slice=(3, 11))
    with mesh:
        pp_apply = make_gpt2_pp_apply(CFG, mesh, n_micro=2)
        sh_params = jax.device_put(params, pp_param_shardings(params, mesh))
        got = jax.jit(
            lambda p, e: pp_apply(p, e, logits_slice=(3, 11))
        )(sh_params, embeds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pp_train_step_matches_plain():
    from clipcap_tpu.train import create_train_state, make_train_step

    mesh = _mesh()
    map_cfg = MapperConfig(dim_clip=16, dim_embedding=CFG.n_embd,
                           prefix_length=4, clip_length=4, num_layers=1,
                           num_heads=4)
    cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=map_cfg)
    train_cfg = TrainConfig(optimizer_lr=1e-3, scheduler_warmup_steps=2,
                            total_steps=100, gradient_clip_val=-1.0,
                            autoclip_history=16, remat=False)

    state, tx = create_train_state(jax.random.PRNGKey(3), cap_cfg, CFG,
                                   train_cfg)
    rng = np.random.default_rng(1)
    b, t = 8, 10
    tokens = rng.integers(1, CFG.vocab_size, size=(b, t)).astype(np.int64)
    tokens[:, -2:] = -1
    batch = {"tokens": tokens,
             "prefix": rng.normal(size=(b, 16)).astype(np.float32)}

    plain_step = make_train_step(cap_cfg, CFG, train_cfg, tx, donate=False)
    plain_state, plain_metrics = plain_step(
        state, jax.tree_util.tree_map(jnp.asarray, batch))

    with mesh:
        pp_apply = make_gpt2_pp_apply(CFG, mesh, n_micro=4,
                                      remat=train_cfg.remat)
        pp_step = make_train_step(cap_cfg, CFG, train_cfg, tx, mesh=mesh,
                                  donate=False, lm_apply=pp_apply)
        lm_sh = pp_param_shardings(state.params["lm"], mesh)
        pp_state = state._replace(params={
            "mapper": state.params["mapper"],
            "lm": jax.device_put(state.params["lm"], lm_sh),
        })
        pp_state, pp_metrics = pp_step(pp_state, shard_batch(mesh, batch))
        np.testing.assert_allclose(
            float(pp_metrics["loss"]), float(plain_metrics["loss"]),
            atol=1e-5, rtol=1e-5,
        )
        for path_want, path_got in zip(
            jax.tree_util.tree_leaves_with_path(plain_state.params),
            jax.tree_util.tree_leaves_with_path(pp_state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(path_got[1]), np.asarray(path_want[1]),
                atol=1e-4, rtol=1e-4,
                err_msg=jax.tree_util.keystr(path_want[0]),
            )


def test_pp_rejects_indivisible_layers():
    mesh = _mesh(data=1, pipe=8)
    bad = GPT2Config(vocab_size=97, n_positions=64, n_embd=32, n_layer=6,
                     n_head=4)
    with pytest.raises(ValueError, match="not divisible"):
        make_gpt2_pp_apply(bad, mesh, n_micro=2)
