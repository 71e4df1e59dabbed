"""GPT-J decoder stack (rotary positions, parallel attention+MLP residual).

Capability-equivalent of the reference's GPTJ wrapper (lms/GPTJ.py:5-20,
default EleutherAI/gpt-j-6B) with the framework LM protocol (see
lm/registry.py): stacked-layer lax.scan execution, fixed-shape KV cache,
fp32 attention logits. Numerics match HF's GPTJForCausalLM in fp32
(tests/test_gptj_parity.py): interleaved ("rotate-every-two") rotary on
the first rotary_dim dims of q/k, a single shared layernorm feeding both
attention and MLP (parallel residual), biasless q/k/v/out projections,
gelu_new MLP, and a *biased* untied lm_head.

For 6B-class decode the natural mesh layout is heads sharded over the
`model` axis (q/k/v/out and mlp widths are all divisible by 16); see
parallel/sharding.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import GPTJConfig
from ..ops.activations import gelu_new
from ..ops.attention import NEG_INF
from ..ops.layernorm import layer_norm


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, maxT, H, Dh]
    v: jnp.ndarray
    index: jnp.ndarray


def init(rng: jax.Array, cfg: GPTJConfig, dtype=jnp.float32) -> dict:
    d, v, l = cfg.n_embd, cfg.vocab_size, cfg.n_layer
    keys = jax.random.split(rng, 8)
    std = 0.02

    def norm(key, shape, s=std):
        return jax.random.normal(key, shape, dtype) * s

    blocks = {
        "ln1": {"g": jnp.ones((l, d), dtype), "b": jnp.zeros((l, d), dtype)},
        "attn": {
            "wq": norm(keys[0], (l, d, d)),
            "wk": norm(keys[1], (l, d, d)),
            "wv": norm(keys[2], (l, d, d)),
            "wo": norm(keys[3], (l, d, d)),
        },
        "mlp": {
            "w_in": norm(keys[4], (l, d, 4 * d)),
            "b_in": jnp.zeros((l, 4 * d), dtype),
            "w_out": norm(keys[5], (l, 4 * d, d)),
            "b_out": jnp.zeros((l, d), dtype),
        },
    }
    return {
        "wte": norm(keys[6], (v, d)),
        "blocks": blocks,
        "ln_f": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "lm_head": {"w": norm(keys[7], (d, v)), "b": jnp.zeros((v,), dtype)},
    }


def embed_tokens(params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
    return params["wte"][tokens]


def embedding_size(params: dict) -> int:
    return params["wte"].shape[1]


def _rotary_sincos(positions: jnp.ndarray, rotary_dim: int):
    """GPT-J sinusoid table: inv_freq over pairs, duplicated interleaved."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, rd/2]
    sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)  # [T, rd]
    cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)
    return sin, cos


def _rotate_every_two(x: jnp.ndarray) -> jnp.ndarray:
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    out = jnp.stack([-x2, x1], axis=-1)
    return out.reshape(x.shape)


def _apply_rotary(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, rd]; sin/cos: [T, rd]."""
    sin = sin[None, :, None, :]
    cos = cos[None, :, None, :]
    return x * cos + _rotate_every_two(x) * sin


def _block(
    x: jnp.ndarray,
    layer: dict,
    bias: jnp.ndarray,
    positions: jnp.ndarray,
    cfg: GPTJConfig,
):
    b, t, d = x.shape
    heads, dh = cfg.n_head, d // cfg.n_head
    rd = cfg.rotary_dim

    h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=cfg.layer_norm_epsilon)

    q = jnp.dot(h, layer["attn"]["wq"]).reshape(b, t, heads, dh)
    k = jnp.dot(h, layer["attn"]["wk"]).reshape(b, t, heads, dh)
    v = jnp.dot(h, layer["attn"]["wv"]).reshape(b, t, heads, dh)

    sin, cos = _rotary_sincos(positions, rd)
    q = jnp.concatenate([_apply_rotary(q[..., :rd], sin, cos), q[..., rd:]], axis=-1)
    k = jnp.concatenate([_apply_rotary(k[..., :rd], sin, cos), k[..., rd:]], axis=-1)

    keys, vals = k, v

    # GPT-J computes attention logits in fp32 with scale sqrt(head_dim)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk",
        q.astype(jnp.float32),
        keys.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(dh))
    logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(vals.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", weights, vals).reshape(b, t, d)
    attn_out = jnp.dot(attn, layer["attn"]["wo"])

    # parallel residual: both branches read the same layernormed h
    m = jnp.dot(h, layer["mlp"]["w_in"]) + layer["mlp"]["b_in"]
    m = gelu_new(m)
    mlp_out = jnp.dot(m, layer["mlp"]["w_out"]) + layer["mlp"]["b_out"]

    return x + attn_out + mlp_out


def apply(
    params: dict,
    cfg: GPTJConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    remat: bool = False,
    logits_slice=None,
) -> jnp.ndarray:
    b, t, d = inputs_embeds.shape
    positions = jnp.arange(t)
    qi = jnp.arange(t)[:, None]
    ki = jnp.arange(t)[None, :]
    bias = jnp.where(ki <= qi, 0.0, NEG_INF)[None, None]
    if attention_mask is not None:
        bias = bias + jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF
        )

    body = functools.partial(_block, bias=bias, positions=positions, cfg=cfg)
    if remat:
        body = jax.checkpoint(body)

    def scan_fn(carry, layer):
        return body(carry, layer), None

    x, _ = jax.lax.scan(scan_fn, inputs_embeds, params["blocks"])
    if logits_slice is not None:
        # head on the loss-relevant positions only (see gpt2.apply)
        x = x[:, logits_slice[0] : logits_slice[1]]
    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], eps=cfg.layer_norm_epsilon)
    return jnp.dot(x, params["lm_head"]["w"]) + params["lm_head"]["b"]


def init_cache(cfg: GPTJConfig, batch: int, max_len: int, dtype=jnp.float32) -> KVCache:
    l, h, dh = cfg.n_layer, cfg.n_head, cfg.n_embd // cfg.n_head
    shape = (l, batch, max_len, h, dh)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32))


def _forward_cached(params, cfg, inputs_embeds, cache, attend_len=None):
    """Cache rides in the layer-scan carry with in-place slab writes — see
    models/gpt2.py:_forward_cached for why (1.6x decode throughput).

    attend_len (static, optional): read only the first attend_len cache
    positions (caller guarantees cache.index + t <= attend_len); see
    gpt2._forward_cached — bit-identical, skips the unwritten KV tail.
    """
    b, t, d = inputs_embeds.shape
    heads, dh = cfg.n_head, d // cfg.n_head
    rd = cfg.rotary_dim
    max_len = cache.k.shape[2]
    a_len = max_len if attend_len is None else min(int(attend_len), max_len)
    idx = cache.index
    positions = idx + jnp.arange(t)

    qpos = idx + jnp.arange(t)[:, None]
    kpos = jnp.arange(a_len)[None, :]
    bias = jnp.where(kpos <= qpos, 0.0, NEG_INF)[None, None]
    sin, cos = _rotary_sincos(positions, rd)

    def scan_fn(carry, xs):
        x, k_cache, v_cache = carry
        layer, l = xs
        h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=cfg.layer_norm_epsilon)
        q = jnp.dot(h, layer["attn"]["wq"]).reshape(b, t, heads, dh)
        k = jnp.dot(h, layer["attn"]["wk"]).reshape(b, t, heads, dh)
        v = jnp.dot(h, layer["attn"]["wv"]).reshape(b, t, heads, dh)
        q = jnp.concatenate([_apply_rotary(q[..., :rd], sin, cos), q[..., rd:]], axis=-1)
        k = jnp.concatenate([_apply_rotary(k[..., :rd], sin, cos), k[..., rd:]], axis=-1)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k[None].astype(k_cache.dtype), (l, 0, idx, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v[None].astype(v_cache.dtype), (l, 0, idx, 0, 0)
        )
        keys = jax.lax.dynamic_index_in_dim(k_cache, l, 0, keepdims=False)[:, :a_len]
        vals = jax.lax.dynamic_index_in_dim(v_cache, l, 0, keepdims=False)[:, :a_len]
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.astype(jnp.float32),
            keys.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.float32(dh))
        logits = logits + bias.astype(jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(vals.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, vals).reshape(b, t, d)
        attn_out = jnp.dot(attn, layer["attn"]["wo"])
        m = jnp.dot(h, layer["mlp"]["w_in"]) + layer["mlp"]["b_in"]
        m = gelu_new(m)
        mlp_out = jnp.dot(m, layer["mlp"]["w_out"]) + layer["mlp"]["b_out"]
        return (x + attn_out + mlp_out, k_cache, v_cache), None

    (x, new_k, new_v), _ = jax.lax.scan(
        scan_fn,
        (inputs_embeds, cache.k, cache.v),
        (params["blocks"], jnp.arange(cfg.n_layer)),
    )
    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], eps=cfg.layer_norm_epsilon)
    logits = jnp.dot(x, params["lm_head"]["w"]) + params["lm_head"]["b"]
    return logits, KVCache(new_k, new_v, idx + t)


def prefill(params, cfg, inputs_embeds, cache):
    return _forward_cached(params, cfg, inputs_embeds, cache)


def decode_step(params, cfg, token_embed, cache, attend_len=None):
    logits, cache = _forward_cached(
        params, cfg, token_embed, cache, attend_len=attend_len
    )
    return logits[:, -1], cache
