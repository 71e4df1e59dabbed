"""Mapper tests: shape/semantics checks plus a numpy oracle of the
reference mapper math (layers/Transformer.py:133-203,
layers/MultiHeadAttention.py:4-43).
"""

import numpy as np
import jax
import jax.numpy as jnp

from clipcap_tpu.core.config import MapperConfig
from clipcap_tpu.models import mapper


def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_layernorm(x, g, b, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * g + b


def oracle_layer(x, layer, num_heads):
    """Numpy oracle of one pre-LN layer with fused-KV attention, relu MLP."""
    b, n, c = x.shape
    dh = c // num_heads
    h = np_layernorm(x, layer["ln1"]["g"], layer["ln1"]["b"])
    q = h @ layer["attn"]["wq"]
    kv = (h @ layer["attn"]["wkv"]).reshape(b, n, 2, num_heads, dh)
    k, v = kv[:, :, 0], kv[:, :, 1]
    q = q.reshape(b, n, num_heads, dh)
    att = np.einsum("bnhd,bmhd->bnmh", q, k) * dh**-0.5
    att = np_softmax(att, axis=2)
    out = np.einsum("bnmh,bmhd->bnhd", att, v).reshape(b, n, c)
    out = out @ layer["attn"]["wo"] + layer["attn"]["bo"]
    x = x + out
    h = np_layernorm(x, layer["ln2"]["g"], layer["ln2"]["b"])
    h = np.maximum(h @ layer["mlp"]["w1"] + layer["mlp"]["b1"], 0.0)
    h = h @ layer["mlp"]["w2"] + layer["mlp"]["b2"]
    return x + h


def oracle_pooled_mapper(params, x, cfg: MapperConfig):
    b = x.shape[0]
    h = x @ params["linear"]["w"] + params["linear"]["b"]
    h = h.reshape(b, cfg.clip_length, cfg.dim_embedding)
    const = np.broadcast_to(params["prefix_const"][None], (b, cfg.prefix_length, cfg.dim_embedding))
    seq = np.concatenate([h, const], axis=1)
    layers = params["layers"]
    for i in range(cfg.num_layers):
        layer = jax.tree_util.tree_map(lambda a: np.asarray(a[i]), layers)
        seq = oracle_layer(seq, layer, cfg.num_heads)
    return seq[:, cfg.clip_length :]


def to_np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def test_pooled_mapper_matches_oracle():
    cfg = MapperConfig(
        dim_clip=32, dim_embedding=48, prefix_length=5, clip_length=4,
        num_layers=2, num_heads=4, mlp_ratio=2.0, act_fn="relu",
    )
    params = mapper.init(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).normal(size=(3, 32)).astype(np.float32)
    ours = mapper.apply(params, jnp.asarray(x), cfg)
    assert ours.shape == (3, 5, 48)
    oracle = oracle_pooled_mapper(to_np(params), x, cfg)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-4, rtol=1e-4)


def test_all_features_mapper_shapes_and_pos_embeddings():
    cfg = MapperConfig(
        dim_clip=32, dim_embedding=48, prefix_length=6, clip_length=10,
        num_layers=2, num_heads=4, use_all_features=True, use_pos_embeddings=True,
    )
    params = mapper.init(jax.random.PRNGKey(1), cfg)
    assert params["pos_embeddings"].shape == (10, 48)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10, 32)).astype(np.float32))
    out = mapper.apply(params, x, cfg)
    assert out.shape == (2, 6, 48)

    # pos embeddings must affect the output
    params2 = dict(params)
    params2["pos_embeddings"] = params["pos_embeddings"] + 1.0
    out2 = mapper.apply(params2, x, cfg)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_all_features_dynamic_clip_seq_len():
    """Reference slices after the *actual* visual length (Transformer.py:200)."""
    cfg = MapperConfig(
        dim_clip=16, dim_embedding=32, prefix_length=4, clip_length=8,
        num_layers=1, num_heads=2, use_all_features=True, use_pos_embeddings=False,
    )
    params = mapper.init(jax.random.PRNGKey(2), cfg)
    x5 = jnp.ones((1, 5, 16))  # shorter than clip_length
    out = mapper.apply(params, x5, cfg)
    assert out.shape == (1, 4, 32)


def test_geglu_doubles_fc1():
    cfg = MapperConfig(
        dim_clip=16, dim_embedding=32, prefix_length=2, clip_length=2,
        num_layers=1, num_heads=2, mlp_ratio=2.0, act_fn="geglu",
    )
    params = mapper.init(jax.random.PRNGKey(3), cfg)
    # fc1: [L, D, 2 * (D * ratio)]
    assert params["layers"]["mlp"]["w1"].shape == (1, 32, 128)
    assert params["layers"]["mlp"]["w2"].shape == (1, 64, 32)
    out = mapper.apply(params, jnp.ones((2, 16)), cfg)
    assert out.shape == (2, 2, 32)


def test_prefix_init_std():
    cfg = MapperConfig(dim_clip=8, dim_embedding=512, prefix_length=64, clip_length=2,
                       num_layers=1, num_heads=2, prefix_init_std=0.05)
    params = mapper.init(jax.random.PRNGKey(4), cfg)
    std = float(np.std(np.asarray(params["prefix_const"])))
    assert 0.04 < std < 0.06
