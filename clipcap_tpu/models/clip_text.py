"""CLIP text tower: causal transformer, eot-pooled projection.

Used wherever the reference calls clip_model.encode_text: caption ranking
(reference sampling.py:24-37 clip_rank), CLIP scoring
(reference evaluate_model.py:313-352), clip-guided decoding
(reference evaluate_model.py:277-290) and the shutterstock demo
(reference inference.py:506-512).

Matches OpenAI CLIP semantics: token+position embeddings, pre-LN causal
transformer with QuickGELU, ln_final, then the feature at each sequence's
*last token position by argmax of token ids* (the eot token has the
highest id) projected by text_projection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import CLIPTextConfig
from ..ops.activations import quick_gelu
from ..ops.attention import NEG_INF, dot_product_attention
from ..ops.layernorm import layer_norm


def init(rng: jax.Array, cfg: CLIPTextConfig, dtype=jnp.float32) -> dict:
    d, l = cfg.width, cfg.layers
    keys = jax.random.split(rng, 8)

    def norm(key, shape, s=0.02):
        return jax.random.normal(key, shape, dtype) * s

    h = d * 4
    blocks = {
        "ln1": {"g": jnp.ones((l, d), dtype), "b": jnp.zeros((l, d), dtype)},
        "attn": {
            "wqkv": norm(keys[0], (l, d, 3 * d)),
            "bqkv": jnp.zeros((l, 3 * d), dtype),
            "wo": norm(keys[1], (l, d, d)),
            "bo": jnp.zeros((l, d), dtype),
        },
        "ln2": {"g": jnp.ones((l, d), dtype), "b": jnp.zeros((l, d), dtype)},
        "mlp": {
            "w1": norm(keys[2], (l, d, h)),
            "b1": jnp.zeros((l, h), dtype),
            "w2": norm(keys[3], (l, h, d)),
            "b2": jnp.zeros((l, d), dtype),
        },
    }
    return {
        "token_embedding": norm(keys[4], (cfg.vocab_size, d)),
        "pos": norm(keys[5], (cfg.context_length, d), 0.01),
        "blocks": blocks,
        "ln_final": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "text_projection": norm(keys[6], (d, cfg.output_dim), d**-0.5),
    }


def _block(x, layer, bias, cfg: CLIPTextConfig):
    b, t, d = x.shape
    heads, dh = cfg.heads, d // cfg.heads
    h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=cfg.layer_norm_epsilon)
    qkv = jnp.dot(h, layer["attn"]["wqkv"]) + layer["attn"]["bqkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, heads, dh)
    k = k.reshape(b, t, heads, dh)
    v = v.reshape(b, t, heads, dh)
    attn = dot_product_attention(q, k, v, bias=bias).reshape(b, t, d)
    x = x + jnp.dot(attn, layer["attn"]["wo"]) + layer["attn"]["bo"]
    h = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"], eps=cfg.layer_norm_epsilon)
    h = jnp.dot(h, layer["mlp"]["w1"]) + layer["mlp"]["b1"]
    h = quick_gelu(h)
    h = jnp.dot(h, layer["mlp"]["w2"]) + layer["mlp"]["b2"]
    return x + h


def apply(params: dict, cfg: CLIPTextConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens [B, T] (zero-padded, eot = max id in each row) -> [B, output_dim]."""
    b, t = tokens.shape
    x = params["token_embedding"][tokens] + params["pos"][None, :t]

    qi = jnp.arange(t)[:, None]
    ki = jnp.arange(t)[None, :]
    bias = jnp.where(ki <= qi, 0.0, NEG_INF)[None, None]

    body = functools.partial(_block, bias=bias, cfg=cfg)

    def scan_fn(carry, layer):
        return body(carry, layer), None

    x, _ = jax.lax.scan(scan_fn, x, params["blocks"])
    x = layer_norm(x, params["ln_final"]["g"], params["ln_final"]["b"],
                   eps=cfg.layer_norm_epsilon)
    eot = jnp.argmax(tokens, axis=-1)
    pooled = x[jnp.arange(b), eot]
    return jnp.dot(pooled, params["text_projection"])
