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
from ..ops.ring import paste_rows, refill_positions, ring_layout


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


def _apply_rotary(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray,
                  per_row: bool = False) -> jnp.ndarray:
    """x: [B, T, H, rd]; sin/cos: [T, rd] — or [B, rd] with per_row=True
    (ring decode: every serving slot sits at its own logical position)."""
    if per_row:
        sin = sin[:, None, None, :]
        cos = cos[:, None, None, :]
    else:
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


def _dequantize_tree(tree):
    """quantize_params leaves -> bf16 weights (transient, per scan step).

    Non-quantized floating leaves (layernorms, biases) are cast to bf16
    too — the W8A16 compute policy.
    """
    if isinstance(tree, dict) and "q" in tree and "s" in tree:
        return tree["q"].astype(jnp.bfloat16) * tree["s"].astype(jnp.bfloat16)
    if isinstance(tree, dict):
        return {k: _dequantize_tree(v) for k, v in tree.items()}
    if hasattr(tree, "dtype") and jnp.issubdtype(tree.dtype, jnp.floating):
        return tree.astype(jnp.bfloat16)
    return tree


def apply_q8(
    params: dict,
    cfg: GPTJConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    remat: bool = False,
    logits_slice=None,
) -> jnp.ndarray:
    """Full-sequence W8A16 forward over quantize_params output.

    The TRAINING forward for a frozen int8 GPT-J: each scanned layer
    dequantizes its int8 weights to bf16 transiently (~0.43 GB live at a
    time) and runs the standard _block math. Exists because BASELINE
    config #4's prefix tuning (reference train.py:236-245 with gpt-j)
    cannot hold the 12.1 GB bf16 LM plus trainable-mapper optimizer state
    on one 16 GB chip — int8 halves the frozen LM to 6.05 GB. Prefix-only
    training backprops through activations only (the LM is frozen), so
    with remat the dequant simply reruns inside each layer's rematerialized
    forward.
    """
    b, t, d = inputs_embeds.shape
    positions = jnp.arange(t)
    qi = jnp.arange(t)[:, None]
    ki = jnp.arange(t)[None, :]
    bias = jnp.where(ki <= qi, 0.0, NEG_INF)[None, None]
    if attention_mask is not None:
        bias = bias + jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF
        )

    def body(x, layer):
        return _block(x, _dequantize_tree(layer), bias=bias,
                      positions=positions, cfg=cfg)

    if remat:
        body = jax.checkpoint(body)

    def scan_fn(carry, layer):
        return body(carry, layer), None

    x, _ = jax.lax.scan(scan_fn, inputs_embeds.astype(jnp.bfloat16),
                        params["blocks"])
    if logits_slice is not None:
        x = x[:, logits_slice[0] : logits_slice[1]]
    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], eps=cfg.layer_norm_epsilon)
    return jnp.dot(x, _dequantize_tree(params["lm_head"]["w"])) + params["lm_head"]["b"]


def init_cache(cfg: GPTJConfig, batch: int, max_len: int, dtype=jnp.float32) -> KVCache:
    l, h, dh = cfg.n_layer, cfg.n_head, cfg.n_embd // cfg.n_head
    shape = (l, batch, max_len, h, dh)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32))


def _forward_cached(params, cfg, inputs_embeds, cache, ring=None):
    """Cache rides in the layer-scan carry with in-place slab writes — see
    models/gpt2.py:_forward_cached for why (1.6x decode throughput).

    ring=(pos [B], start [B]) is the continuous-batching decode mode
    (decode/serving.py): ring write slot + per-row window bias from
    ops/ring.ring_layout, rotary angles at each row's own logical
    position. The cached K are stored post-rotary at their writer's
    logical position, so windows shifted per row need no re-rotation."""
    b, t, d = inputs_embeds.shape
    heads, dh = cfg.n_head, d // cfg.n_head
    rd = cfg.rotary_dim
    a_len = cache.k.shape[2]
    idx = cache.index

    per_row = ring is not None
    if per_row:
        if t != 1:
            raise ValueError("ring mode is decode-only (t == 1)")
        ring_pos, ring_start = ring
        wslot, ring_bias = ring_layout(idx, a_len, ring_start)
        bias = ring_bias[:, None, None, :]  # [B, 1, 1, a_len]
        sin, cos = _rotary_sincos(ring_pos, rd)  # [B, rd]
    else:
        wslot = idx
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
        q = jnp.concatenate(
            [_apply_rotary(q[..., :rd], sin, cos, per_row), q[..., rd:]], axis=-1)
        k = jnp.concatenate(
            [_apply_rotary(k[..., :rd], sin, cos, per_row), k[..., rd:]], axis=-1)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k[None].astype(k_cache.dtype), (l, 0, wslot, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v[None].astype(v_cache.dtype), (l, 0, wslot, 0, 0)
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


def decode_step(params, cfg, token_embed, cache):
    logits, cache = _forward_cached(
        params, cfg, token_embed, cache
    )
    return logits[:, -1], cache


def decode_step_ring(params, cfg, token_embed, cache, pos, start):
    """Ring-cache decode step for continuous batching — see
    models/gpt2.py decode_step_ring for the ring contract."""
    logits, cache = _forward_cached(
        params, cfg, token_embed, cache, ring=(pos, start)
    )
    return logits[:, -1], cache


def scatter_refill(cache: KVCache, small: KVCache, q: jnp.ndarray) -> KVCache:
    """Write a freshly prefilled R-row small cache into the contiguous
    ring-cache row block [q, q+R) — see models/gpt2.py scatter_refill for
    the window/contiguity contract."""
    rp = refill_positions(cache.index, small.k.shape[2], cache.k.shape[2])
    return KVCache(
        paste_rows(cache.k, small.k, q, rp, time_axis=2),
        paste_rows(cache.v, small.v, q, rp, time_axis=2),
        cache.index,
    )


# --------------------------------------------------------------------------
# int8 weight-streaming decode path
#
# Same design as models/gpt2.py's int8 path (see the long comment there):
# GPT-J 6B streams ~12 GB of bf16 weights per generated token — int8
# weights (per-output-channel scales) plus an int8 KV cache (per-position
# scales) halve the decode HBM stream and run the matmuls
# int8 x int8 -> int32 on the MXU. Scoring folds the scales in f32 after
# each integer matmul; prefill attention runs in f32 on this call's
# q/k/v exactly like the bf16 path (GPT-J computes attention logits in
# fp32). `gptj_int8` plugs into decode/engine like any LM module.
# Replaces the reference GPTJ decode usage (lms/GPTJ.py + the full
# recompute loops, inference.py:97/:249).

from ..ops.quant import int8_linear, quantize_rows, quantize_weight  # noqa: E402


class Int8KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, H, maxT, Dh] int8 (post-rotary K)
    v: jnp.ndarray  # [L, B, H, maxT, Dh] int8
    ks: jnp.ndarray  # [L, B, H, maxT] f32 per-position K scales
    vs: jnp.ndarray  # [L, B, H, maxT] f32 per-position V scales
    index: jnp.ndarray  # scalar int32


def quantize_params(params: dict) -> dict:
    """bf16/f32 GPT-J params -> int8 decode params.

    Matmul weights become {"q": int8, "s": f32[out]}; layernorms, biases
    and the embedding table stay as-is (wte is a per-token gather).
    """

    def qlin(leaf):
        return quantize_weight(leaf)

    blocks = params["blocks"]
    out = {
        "wte": params["wte"],
        "ln_f": params["ln_f"],
        "blocks": {
            "ln1": blocks["ln1"],
            "attn": {k: qlin(blocks["attn"][k]) for k in ("wq", "wk", "wv", "wo")},
            "mlp": {
                "w_in": qlin(blocks["mlp"]["w_in"]),
                "b_in": blocks["mlp"]["b_in"],
                "w_out": qlin(blocks["mlp"]["w_out"]),
                "b_out": blocks["mlp"]["b_out"],
            },
        },
        "lm_head": {"w": qlin(params["lm_head"]["w"]), "b": params["lm_head"]["b"]},
    }
    return out


def init_cache_q8(cfg: GPTJConfig, batch: int, max_len: int, dtype=None) -> Int8KVCache:
    """int8 KV cache (dtype arg accepted for protocol compat, ignored)."""
    l, h, dh = cfg.n_layer, cfg.n_head, cfg.n_embd // cfg.n_head
    return Int8KVCache(
        k=jnp.zeros((l, batch, h, max_len, dh), jnp.int8),
        v=jnp.zeros((l, batch, h, max_len, dh), jnp.int8),
        ks=jnp.zeros((l, batch, h, max_len), jnp.float32),
        vs=jnp.zeros((l, batch, h, max_len), jnp.float32),
        index=jnp.zeros((), jnp.int32),
    )


def _forward_cached_q8(
    params: dict,
    cfg: GPTJConfig,
    inputs_embeds: jnp.ndarray,  # [B, T, D]
    cache: Int8KVCache,
    fresh: bool = False,
    full_logits: bool = False,
    ring=None,
) -> Tuple[jnp.ndarray, Int8KVCache]:
    b, t, d = inputs_embeds.shape
    heads, dh = cfg.n_head, d // cfg.n_head
    rd = cfg.rotary_dim
    a_len = cache.k.shape[3]
    idx = cache.index
    eps = cfg.layer_norm_epsilon

    per_row = ring is not None
    if per_row:
        if t != 1:
            raise ValueError("ring mode is decode-only (t == 1)")
        ring_pos, ring_start = ring
        wslot, step_bias = ring_layout(idx, a_len, ring_start)  # bias [B, T]
        sin, cos = _rotary_sincos(ring_pos, rd)  # [B, rd]
    else:
        wslot = idx
        positions = idx + jnp.arange(t)
        sin, cos = _rotary_sincos(positions, rd)

    if fresh and t > 1:
        qi = jnp.arange(t)[:, None]
        ki = jnp.arange(t)[None, :]
        prefill_bias = jnp.where(ki <= qi, 0.0, NEG_INF)[None, None]
    elif not per_row:
        kpos = jnp.arange(a_len)[None, :]
        step_bias = jnp.where(kpos <= idx + t - 1, 0.0, NEG_INF)  # [1, a_len]

    x = inputs_embeds.astype(jnp.bfloat16)

    def scan_fn(carry, xs):
        x, kc, vc, ksc, vsc = carry
        layer, l = xs
        h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=eps)
        q = int8_linear(h, layer["attn"]["wq"]).reshape(b, t, heads, dh)
        k = int8_linear(h, layer["attn"]["wk"]).reshape(b, t, heads, dh)
        v = int8_linear(h, layer["attn"]["wv"]).reshape(b, t, heads, dh)
        q = jnp.concatenate(
            [_apply_rotary(q[..., :rd], sin, cos, per_row), q[..., rd:]], axis=-1)
        k = jnp.concatenate(
            [_apply_rotary(k[..., :rd], sin, cos, per_row), k[..., rd:]], axis=-1)

        # quantize the post-rotary K and V per (b, t, h), store head-major
        k8, sk = quantize_rows(k)
        v8, sv = quantize_rows(v)
        kc = jax.lax.dynamic_update_slice(
            kc, k8.transpose(0, 2, 1, 3)[None], (l, 0, 0, wslot, 0)
        )
        vc = jax.lax.dynamic_update_slice(
            vc, v8.transpose(0, 2, 1, 3)[None], (l, 0, 0, wslot, 0)
        )
        ksc = jax.lax.dynamic_update_slice(
            ksc, sk[..., 0].transpose(0, 2, 1)[None], (l, 0, 0, wslot)
        )
        vsc = jax.lax.dynamic_update_slice(
            vsc, sv[..., 0].transpose(0, 2, 1)[None], (l, 0, 0, wslot)
        )

        if fresh and t > 1:
            # prefill in f32 on this call's q/k/v (GPT-J attention policy),
            # skipping the maxT-wide zero-cache readback
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(jnp.float32(dh))
            logits = logits + prefill_bias.astype(jnp.float32)
            w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, d)
        else:
            keys = jax.lax.dynamic_index_in_dim(kc, l, 0, keepdims=False)[:, :, :a_len]
            vals = jax.lax.dynamic_index_in_dim(vc, l, 0, keepdims=False)[:, :, :a_len]
            skt = jax.lax.dynamic_index_in_dim(ksc, l, 0, keepdims=False)[:, :, :a_len]
            svt = jax.lax.dynamic_index_in_dim(vsc, l, 0, keepdims=False)[:, :, :a_len]
            q8, sq = quantize_rows(q[:, 0])  # [B,H,Dh] int8, sq [B,H,1]
            scores = jax.lax.dot_general(
                q8, keys, (((2,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # [B,H,a_len]
            scores = scores * sq * skt * (dh**-0.5) + step_bias[:, None, :]
            p = jax.nn.softmax(scores, axis=-1)
            pv8, sp = quantize_rows(p * svt)  # fold V scales into the probs
            attn = jax.lax.dot_general(
                pv8, vals, (((2,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * sp  # [B,H,Dh]
            attn = attn.reshape(b, 1, d)
        attn = attn.astype(x.dtype)
        attn_out = int8_linear(attn, layer["attn"]["wo"])

        # parallel residual off the same layernormed h
        m = int8_linear(h, layer["mlp"]["w_in"], layer["mlp"]["b_in"])
        m = gelu_new(m)
        mlp_out = int8_linear(m, layer["mlp"]["w_out"], layer["mlp"]["b_out"])
        return (x + attn_out + mlp_out, kc, vc, ksc, vsc), None

    (x, kc, vc, ksc, vsc), _ = jax.lax.scan(
        scan_fn,
        (x, cache.k, cache.v, cache.ks, cache.vs),
        (params["blocks"], jnp.arange(cfg.n_layer)),
    )
    if not full_logits:
        x = x[:, -1:]
    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], eps=eps)
    logits = int8_linear(x, params["lm_head"]["w"], params["lm_head"]["b"],
                         out_dtype=jnp.float32)
    return logits, Int8KVCache(k=kc, v=vc, ks=ksc, vs=vsc, index=idx + t)


def prefill_q8(
    params: dict,
    cfg: GPTJConfig,
    inputs_embeds: jnp.ndarray,
    cache: Int8KVCache,
    full_logits: bool = False,
) -> Tuple[jnp.ndarray, Int8KVCache]:
    """int8-path prefill. Requires a fresh cache (index 0), like prefill()."""
    return _forward_cached_q8(
        params, cfg, inputs_embeds, cache, fresh=True, full_logits=full_logits
    )


def decode_step_q8(
    params: dict,
    cfg: GPTJConfig,
    token_embed: jnp.ndarray,
    cache: Int8KVCache,
) -> Tuple[jnp.ndarray, Int8KVCache]:
    logits, cache = _forward_cached_q8(
        params, cfg, token_embed, cache
    )
    return logits[:, -1], cache


def decode_step_ring_q8(params, cfg, token_embed, cache, pos, start):
    """int8 ring-cache decode step — see models/gpt2.py decode_step_ring."""
    logits, cache = _forward_cached_q8(
        params, cfg, token_embed, cache, ring=(pos, start)
    )
    return logits[:, -1], cache


def scatter_refill_q8(
    cache: Int8KVCache, small: Int8KVCache, q: jnp.ndarray
) -> Int8KVCache:
    """int8 scatter_refill; the head-major layout puts time on axis 3."""
    rp = refill_positions(cache.index, small.k.shape[3], cache.k.shape[3])

    def put(big, sm):
        return paste_rows(big, sm, q, rp, time_axis=3)

    return Int8KVCache(
        k=put(cache.k, small.k), v=put(cache.v, small.v),
        ks=put(cache.ks, small.ks), vs=put(cache.vs, small.vs),
        index=cache.index,
    )


class _Int8Module:
    """lm/registry-protocol adapter for the int8 GPT-J decode path.

    Use `gptj.quantize_params(params)` once, then pass `gptj.gptj_int8` as
    the engine's lm module with the quantized params.
    """

    takes_token_ids = False
    init_cache = staticmethod(init_cache_q8)
    prefill = staticmethod(prefill_q8)
    decode_step = staticmethod(decode_step_q8)
    decode_step_ring = staticmethod(decode_step_ring_q8)
    scatter_refill = staticmethod(scatter_refill_q8)
    embed_tokens = staticmethod(embed_tokens)
    embedding_size = staticmethod(embedding_size)


gptj_int8 = _Int8Module()
