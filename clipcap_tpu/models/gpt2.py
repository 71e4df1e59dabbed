"""GPT-2 decoder stack (functional JAX, KV-cached decode).

Capability-equivalent of the reference's HF-backed GPT-2 wrapper
(reference lms/GPT2.py:6-19: embedding lookup, `call(inputs_embeds,
attention_mask)`), rebuilt TPU-first:

- parameters are an explicit pytree with layers stacked on a leading [L]
  axis, executed via lax.scan (one compiled block body for gpt2-xl's 48
  layers);
- a fixed-shape KV cache + `decode_step` replaces the reference's
  full-sequence recompute per generated token (reference inference.py:97,
  :249 — the reference has no KV cache anywhere and even creates GPT-2
  with use_cache=False, train.py:192);
- numerics match HF's GPT2LMHeadModel in fp32 (gelu_new MLP, pre-LN,
  causal + additive padding mask, tied lm_head) — verified by
  tests/test_gpt2_parity.py against a randomly initialized torch model.

Layout conventions: linear weights are [in, out] (HF GPT-2's Conv1D
already stores [in, out], so import is copy-through); activations are
[B, T, D]; the KV cache is a dict of [L, B, maxT, H, Dh] arrays.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import GPT2Config
from ..ops.activations import gelu_new
from ..ops.attention import NEG_INF, dot_product_attention
from ..ops.layernorm import layer_norm


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, maxT, H, Dh]
    v: jnp.ndarray  # [L, B, maxT, H, Dh]
    index: jnp.ndarray  # scalar int32: number of valid positions


def init(rng: jax.Array, cfg: GPT2Config, dtype=jnp.float32) -> dict:
    """GPT-2 init: N(0, 0.02) weights, zero biases, scaled residual projs."""
    d, v, p, l = cfg.n_embd, cfg.vocab_size, cfg.n_positions, cfg.n_layer
    keys = jax.random.split(rng, 8)
    std = 0.02
    resid_std = std / (2 * l) ** 0.5  # GPT-2 paper residual-proj scaling

    def norm(key, shape, s=std):
        return jax.random.normal(key, shape, dtype) * s

    blocks = {
        "ln1": {"g": jnp.ones((l, d), dtype), "b": jnp.zeros((l, d), dtype)},
        "attn": {
            "c_attn": {"w": norm(keys[0], (l, d, 3 * d)), "b": jnp.zeros((l, 3 * d), dtype)},
            "c_proj": {"w": norm(keys[1], (l, d, d), resid_std), "b": jnp.zeros((l, d), dtype)},
        },
        "ln2": {"g": jnp.ones((l, d), dtype), "b": jnp.zeros((l, d), dtype)},
        "mlp": {
            "c_fc": {"w": norm(keys[2], (l, d, 4 * d)), "b": jnp.zeros((l, 4 * d), dtype)},
            "c_proj": {"w": norm(keys[3], (l, 4 * d, d), resid_std), "b": jnp.zeros((l, d), dtype)},
        },
    }
    return {
        "wte": norm(keys[4], (v, d)),
        "wpe": norm(keys[5], (p, d)),
        "blocks": blocks,
        "ln_f": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }


def embed_tokens(params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
    """wte lookup — the reference's get_embedding_text (lms/GPT2.py:14)."""
    return params["wte"][tokens]


def embedding_size(params: dict) -> int:
    return params["wte"].shape[1]


def _block(x: jnp.ndarray, layer: dict, bias: jnp.ndarray, cfg: GPT2Config):
    """One pre-LN GPT-2 block (uncached path; the cached variant lives in
    _forward_cached with the carry-resident cache)."""
    b, t, d = x.shape
    h_heads, dh = cfg.n_head, d // cfg.n_head

    h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=cfg.layer_norm_epsilon)
    qkv = jnp.dot(h, layer["attn"]["c_attn"]["w"]) + layer["attn"]["c_attn"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h_heads, dh)
    k = k.reshape(b, t, h_heads, dh)
    v = v.reshape(b, t, h_heads, dh)

    attn = dot_product_attention(q, k, v, bias=bias).reshape(b, t, d)
    x = x + jnp.dot(attn, layer["attn"]["c_proj"]["w"]) + layer["attn"]["c_proj"]["b"]

    h = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"], eps=cfg.layer_norm_epsilon)
    h = jnp.dot(h, layer["mlp"]["c_fc"]["w"]) + layer["mlp"]["c_fc"]["b"]
    h = gelu_new(h)
    h = jnp.dot(h, layer["mlp"]["c_proj"]["w"]) + layer["mlp"]["c_proj"]["b"]
    return x + h


def apply(
    params: dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,  # [B, T, D]
    attention_mask: Optional[jnp.ndarray] = None,  # [B, T] 1=attend
    remat: bool = False,
) -> jnp.ndarray:
    """Full training/eval forward over inputs_embeds -> logits [B, T, V].

    The uniform `call(inputs_embeds, attention_mask)` surface of the
    reference LM wrappers (lms/GPT2.py:17-19). Loss is computed by the
    caller (models/captioner.py), matching reference model.py:208-209.
    """
    b, t, d = inputs_embeds.shape
    positions = jnp.arange(t)
    x = inputs_embeds + params["wpe"][positions][None]

    qi = jnp.arange(t)[:, None]
    ki = jnp.arange(t)[None, :]
    bias = jnp.where(ki <= qi, 0.0, NEG_INF)[None, None]  # [1,1,T,T]
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
        bias = bias + pad

    body = functools.partial(_block, cfg=cfg)
    if remat:
        body = jax.checkpoint(body)

    def scan_fn(carry, layer):
        return body(carry, layer, bias), None

    x, _ = jax.lax.scan(scan_fn, x, params["blocks"])
    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], eps=cfg.layer_norm_epsilon)
    logits = jnp.dot(x, params["wte"].T)  # tied lm_head
    return logits


def init_cache(cfg: GPT2Config, batch: int, max_len: int, dtype=jnp.float32) -> KVCache:
    l, h, dh = cfg.n_layer, cfg.n_head, cfg.n_embd // cfg.n_head
    shape = (l, batch, max_len, h, dh)
    return KVCache(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype), index=jnp.zeros((), jnp.int32)
    )


def _forward_cached(
    params: dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,  # [B, T, D]
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """Shared prefill/step forward writing into the fixed-shape cache.

    TPU-critical layout: the FULL stacked cache rides in the layer-scan
    *carry* and each layer writes only its new [1,B,T,H,Dh] slab with
    dynamic_update_slice. Passing per-layer cache slices through scan
    xs/ys instead makes XLA accumulate a fresh cache (plus a ping-pong
    copy in the decode loop) — measured 1.6x slower and 2x the HBM for
    GPT2-XL decode.
    """
    b, t, d = inputs_embeds.shape
    h_heads, dh = cfg.n_head, d // cfg.n_head
    max_len = cache.k.shape[2]
    idx = cache.index

    positions = idx + jnp.arange(t)
    x = inputs_embeds + jnp.take(params["wpe"], positions, axis=0)[None].astype(
        inputs_embeds.dtype
    )

    # causal-over-cache bias: query at absolute position idx+i attends keys <= it
    qpos = idx + jnp.arange(t)[:, None]  # [T, 1]
    kpos = jnp.arange(max_len)[None, :]  # [1, maxT]
    bias = jnp.where(kpos <= qpos, 0.0, NEG_INF)[None, None]  # [1,1,T,maxT]

    def scan_fn(carry, xs):
        x, k_cache, v_cache = carry
        layer, l = xs
        h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=cfg.layer_norm_epsilon)
        qkv = jnp.dot(h, layer["attn"]["c_attn"]["w"]) + layer["attn"]["c_attn"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h_heads, dh)
        k = k.reshape(b, t, h_heads, dh)
        v = v.reshape(b, t, h_heads, dh)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k[None].astype(k_cache.dtype), (l, 0, idx, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v[None].astype(v_cache.dtype), (l, 0, idx, 0, 0)
        )
        keys = jax.lax.dynamic_index_in_dim(k_cache, l, 0, keepdims=False)
        vals = jax.lax.dynamic_index_in_dim(v_cache, l, 0, keepdims=False)
        attn = dot_product_attention(q, keys, vals, bias=bias).reshape(b, t, d)
        x = x + jnp.dot(attn, layer["attn"]["c_proj"]["w"]) + layer["attn"]["c_proj"]["b"]
        h = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"], eps=cfg.layer_norm_epsilon)
        h = jnp.dot(h, layer["mlp"]["c_fc"]["w"]) + layer["mlp"]["c_fc"]["b"]
        h = gelu_new(h)
        h = jnp.dot(h, layer["mlp"]["c_proj"]["w"]) + layer["mlp"]["c_proj"]["b"]
        return (x + h, k_cache, v_cache), None

    (x, new_k, new_v), _ = jax.lax.scan(
        scan_fn,
        (x, cache.k, cache.v),
        (params["blocks"], jnp.arange(cfg.n_layer)),
    )
    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], eps=cfg.layer_norm_epsilon)
    logits = jnp.dot(x, params["wte"].T)
    return logits, KVCache(k=new_k, v=new_v, index=idx + t)


def prefill(
    params: dict, cfg: GPT2Config, inputs_embeds: jnp.ndarray, cache: KVCache
) -> Tuple[jnp.ndarray, KVCache]:
    """Encode the prompt (prefix embeddings ‖ text embeds) into the cache.

    Returns (logits [B, T, V], cache). Decode continues with decode_step.
    """
    return _forward_cached(params, cfg, inputs_embeds, cache)


def decode_step(
    params: dict, cfg: GPT2Config, token_embed: jnp.ndarray, cache: KVCache
) -> Tuple[jnp.ndarray, KVCache]:
    """One autoregressive step: token_embed [B, 1, D] -> logits [B, V]."""
    logits, cache = _forward_cached(params, cfg, token_embed, cache)
    return logits[:, -1], cache
