"""MoE mapper (models/moe.py) + expert parallelism (parallel/ep.py).

Correctness anchors: with every expert an identical copy of the dense
MLP and capacity high enough that nothing drops, the MoE mapper must
equal the dense mapper exactly (top-k gates renormalize to 1); the
expert-sharded forward on the 8-device mesh must match the single-device
forward; overflow beyond capacity drops from the MoE branch only.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clipcap_tpu.core.config import MapperConfig
from clipcap_tpu.core.mesh import MeshSpec, make_mesh
from clipcap_tpu.models import mapper, moe
from clipcap_tpu.ops.activations import parse_act_fn
from clipcap_tpu.parallel.ep import expert_constraint, moe_param_shardings

CFG = MapperConfig(dim_clip=16, dim_embedding=32, prefix_length=6,
                   clip_length=4, num_layers=2, num_heads=4)


def _identical_expert_params(moe_cfg):
    """MoE params whose experts all equal the dense mapper's MLP."""
    dense = mapper.init(jax.random.PRNGKey(0), CFG)
    params = moe.init(jax.random.PRNGKey(0), CFG, moe_cfg)
    e = moe_cfg.n_experts
    rep = lambda w: jnp.repeat(w[:, None], e, axis=1)  # [L,...] -> [L,E,...]
    params["layers"]["mlp"].update(
        w1=rep(dense["layers"]["mlp"]["w1"]),
        b1=rep(dense["layers"]["mlp"]["b1"]),
        w2=rep(dense["layers"]["mlp"]["w2"]),
        b2=rep(dense["layers"]["mlp"]["b2"]),
    )
    return dense, params


@pytest.mark.parametrize("n_top", [1, 2])
def test_identical_experts_match_dense_mapper(n_top):
    moe_cfg = moe.MoEConfig(n_experts=4, n_top=n_top, capacity_factor=8.0)
    dense, params = _identical_expert_params(moe_cfg)
    prefix = jax.random.normal(jax.random.PRNGKey(1), (3, CFG.dim_clip))
    want = mapper.apply(dense, prefix, CFG)
    got, aux = moe.apply(params, prefix, CFG, moe_cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_expert_sharded_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(MeshSpec(data=2, pipe=1, model=4),
                     devices=jax.devices()[:8])
    moe_cfg = moe.MoEConfig(n_experts=8, n_top=2, capacity_factor=2.0)
    params = moe.init(jax.random.PRNGKey(2), CFG, moe_cfg)
    prefix = jax.random.normal(jax.random.PRNGKey(3), (4, CFG.dim_clip))

    want, want_aux = moe.apply(params, prefix, CFG, moe_cfg)
    with mesh:
        sharded = jax.device_put(params, moe_param_shardings(params, mesh))
        got, aux = jax.jit(
            lambda p, x: moe.apply(p, x, CFG, moe_cfg,
                                   expert_constraint=expert_constraint(mesh))
        )(sharded, prefix)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(aux), float(want_aux), atol=1e-5)


def test_capacity_overflow_drops_from_moe_branch():
    moe_cfg = moe.MoEConfig(n_experts=2, n_top=2, capacity_factor=0.0)
    # capacity_factor 0 -> cap clamps to 1: at most E*cap = 2 token slots
    # survive across both choices; all other rows contribute exactly 0
    ffn = moe.moe_ffn_init(jax.random.PRNGKey(4), 8, 16, 2)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8))
    y, aux = moe.moe_ffn_apply(x, ffn, moe_cfg, parse_act_fn("gelu"))
    rows = np.asarray(jnp.abs(y[0]).sum(axis=-1))
    assert np.isfinite(rows).all()
    assert (rows > 0).sum() <= 2
    assert (rows == 0).sum() >= 6


def test_moe_mapper_differentiates():
    moe_cfg = moe.MoEConfig(n_experts=4, n_top=2, capacity_factor=1.5)
    params = moe.init(jax.random.PRNGKey(6), CFG, moe_cfg)
    prefix = jax.random.normal(jax.random.PRNGKey(7), (2, CFG.dim_clip))

    def loss(p):
        out, aux = moe.apply(p, prefix, CFG, moe_cfg)
        return jnp.sum(out**2) + moe_cfg.aux_loss_weight * aux

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the gate must receive gradient (routing is differentiable through
    # the combine weights)
    gate_g = grads["layers"]["mlp"]["gate"]["w"]
    assert float(jnp.abs(gate_g).sum()) > 0
