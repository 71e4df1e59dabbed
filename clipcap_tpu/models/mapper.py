"""The prefix mapping network ("clip_project").

Functional JAX rebuild of the reference's mapper stack
(layers/Transformer.py + layers/MultiHeadAttention.py):

- `init` / `apply` implement both TransformerMapper (pooled CLIP embedding
  -> clip_length pseudo-tokens via one Linear, reference :133-161) and
  TransformerMapperAllFeatures (full ViT token sequence with per-token
  Linear and optional learned position embeddings, reference :164-203),
  selected by MapperConfig.use_all_features.
- The transformer core is pre-LN with residuals
  (x = x + attn(ln1 x); x = x + mlp(ln2 x), reference :90-109), attention
  uses a fused keys-values projection without bias but a biased output
  projection (reference MultiHeadAttention.py:4-16 with bias=False from
  TransformerLayer), and the MLP supports relu/elu/gelu/selu/geglu where
  geglu doubles the fc1 width (reference :67-87).
- Output is the slice *after* the visual tokens: the transformed learned
  prefix constants (reference :159, :200-201).

TPU notes: layers are stored stacked ([L, ...] leading axis) and executed
with lax.scan — one compiled layer body regardless of depth; layernorm
statistics and attention logits accumulate in f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import MapperConfig
from ..ops.activations import is_gated, parse_act_fn
from ..ops.attention import multi_head_attention
from ..ops.layernorm import layer_norm

LN_EPS = 1e-5  # torch nn.LayerNorm default, used by the reference mapper


def _linear_init(rng, fan_in: int, fan_out: int, with_bias: bool = True, dtype=jnp.float32):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    wkey, bkey = jax.random.split(rng)
    bound = fan_in**-0.5
    w = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
    if not with_bias:
        return {"w": w}
    b = jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _layer_init(rng, dim: int, num_heads: int, mlp_ratio: float, gated: bool, dtype):
    keys = jax.random.split(rng, 5)
    h_dim = int(dim * mlp_ratio)
    h_pre = h_dim * 2 if gated else h_dim
    proj = _linear_init(keys[2], dim, dim, dtype=dtype)
    fc1 = _linear_init(keys[3], dim, h_pre, dtype=dtype)
    fc2 = _linear_init(keys[4], h_dim, dim, dtype=dtype)
    return {
        "ln1": {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "attn": {
            "wq": _linear_init(keys[0], dim, dim, with_bias=False, dtype=dtype)["w"],
            "wkv": _linear_init(keys[1], dim, 2 * dim, with_bias=False, dtype=dtype)["w"],
            "wo": proj["w"],
            "bo": proj["b"],
        },
        "ln2": {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "mlp": {
            "w1": fc1["w"],
            "b1": fc1["b"],
            "w2": fc2["w"],
            "b2": fc2["b"],
        },
    }


def init(rng: jax.Array, cfg: MapperConfig, dtype=jnp.float32) -> dict:
    """Create the mapper parameter pytree."""
    k_lin, k_prefix, k_pos, k_layers = jax.random.split(rng, 4)
    gated = is_gated(cfg.act_fn)
    d = cfg.dim_embedding

    # dtype flows into EVERY weight: leaving the linears at f32 silently
    # runs all mapper matmuls on the f32 MXU path (measured 208 ms vs
    # 5 ms bf16 for the B=512 GPT2-XL-width mapper on v5e)
    if cfg.use_all_features:
        linear = _linear_init(k_lin, cfg.dim_clip, d, dtype=dtype)
    else:
        linear = _linear_init(k_lin, cfg.dim_clip, cfg.clip_length * d, dtype=dtype)

    params = {
        "linear": linear,
        # randn * prefix_init_std (reference :151)
        "prefix_const": jax.random.normal(k_prefix, (cfg.prefix_length, d), dtype)
        * cfg.prefix_init_std,
    }
    if cfg.use_all_features and cfg.use_pos_embeddings:
        params["pos_embeddings"] = jax.random.normal(k_pos, (cfg.clip_length, d), dtype)

    layer_keys = jax.random.split(k_layers, cfg.num_layers)
    layers = [
        _layer_init(k, d, cfg.num_heads, cfg.mlp_ratio, gated, dtype)
        for k in layer_keys
    ]
    # stack: every leaf gains a leading [L] axis for lax.scan
    params["layers"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return params


def _layer_apply(x, layer, *, num_heads: int, act):
    h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=LN_EPS)
    attn_out, _ = multi_head_attention(
        h,
        None,
        wq=layer["attn"]["wq"],
        wkv=layer["attn"]["wkv"],
        wo=layer["attn"]["wo"],
        bo=layer["attn"]["bo"],
        num_heads=num_heads,
    )
    x = x + attn_out
    h = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"], eps=LN_EPS)
    h = jnp.dot(h, layer["mlp"]["w1"]) + layer["mlp"]["b1"]
    h = act(h)
    h = jnp.dot(h, layer["mlp"]["w2"]) + layer["mlp"]["b2"]
    return x + h


def transformer_apply(x, stacked_layers, *, num_heads: int, act, remat: bool = False):
    """Run the stacked pre-LN transformer with lax.scan over layers."""

    body = functools.partial(_layer_apply, num_heads=num_heads, act=act)
    if remat:
        body = jax.checkpoint(body)

    def scan_fn(carry, layer):
        return body(carry, layer), None

    x, _ = jax.lax.scan(scan_fn, x, stacked_layers)
    return x


def apply(params: dict, prefix: jnp.ndarray, cfg: MapperConfig, remat: bool = False):
    """Map visual features to `prefix_length` LM pseudo-token embeddings.

    prefix: [B, dim_clip] (pooled mode) or [B, clip_length, dim_clip]
            (all-features mode, reference :164-203).
    returns [B, prefix_length, dim_embedding].
    """
    act = parse_act_fn(cfg.act_fn)
    d = cfg.dim_embedding

    if cfg.use_all_features:
        if prefix.ndim != 3:
            raise ValueError(
                f"all-features mapper expects [B, T, dim_clip], got {prefix.shape}"
            )
        x = jnp.dot(prefix, params["linear"]["w"]) + params["linear"]["b"]
        if "pos_embeddings" in params:
            x = x + params["pos_embeddings"][None, : x.shape[1]]
        visual_len = x.shape[1]
    else:
        if prefix.ndim != 2:
            raise ValueError(f"pooled mapper expects [B, dim_clip], got {prefix.shape}")
        x = jnp.dot(prefix, params["linear"]["w"]) + params["linear"]["b"]
        x = x.reshape(x.shape[0], cfg.clip_length, d)
        visual_len = cfg.clip_length

    const = jnp.broadcast_to(
        params["prefix_const"][None], (x.shape[0],) + params["prefix_const"].shape
    ).astype(x.dtype)
    seq = jnp.concatenate([x, const], axis=1)
    out = transformer_apply(
        seq, params["layers"], num_heads=cfg.num_heads, act=act, remat=remat
    )
    return out[:, visual_len:]
