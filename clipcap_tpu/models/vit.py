"""Vision transformers: CLIP-style and BLIP(timm)-style, one implementation.

Replaces the torch CUDA visual encoders the reference loads from external
zoos (clip.load at train.py:206 / evaluate_model.py:553; BLIP's
visual_encoder at train.py:132-140) with a TPU-first ViT:

- patchify is a reshape + one MXU matmul (stride-P conv == per-patch
  linear), not a convolution;
- layers are stacked and scanned; attention logits/softmax accumulate f32;
- output modes reproduce the reference exactly:
    "pooled"      — CLIP: ln_post on the CLS token, then @ proj
                    (openai/CLIP model.py semantics via clip.encode_image)
    "tokens_proj" — CLIP all-features: ALL tokens @ proj with NO ln_post —
                    the reference's monkeypatched forward
                    (reference inference.py:422-444), its silent-mismatch
                    trap included;
    "tokens"      — BLIP/timm: final norm over all tokens, no projection
                    (what BLIP's visual_encoder returns, 577 tokens @384px).

Config: core.config.ViTConfig (style="clip" | "blip").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import ViTConfig
from ..ops import quant
from ..ops.activations import gelu_exact, quick_gelu
from ..ops.attention import dot_product_attention
from ..ops.layernorm import layer_norm


def init(rng: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    d = cfg.width
    n_patches = cfg.grid * cfg.grid
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    keys = jax.random.split(rng, 10)
    scale = d**-0.5

    def norm(key, shape, s=0.02):
        return jax.random.normal(key, shape, dtype) * s

    l = cfg.layers
    h = int(d * cfg.mlp_ratio)
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
    params = {
        "patch": {"w": norm(keys[4], (patch_dim, d))},
        "cls": norm(keys[5], (d,), scale),
        "pos": norm(keys[6], (n_patches + 1, d), scale),
        "blocks": blocks,
        "ln_post": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }
    if cfg.style == "blip":
        params["patch"]["b"] = jnp.zeros((d,), dtype)
    if cfg.style == "clip":
        params["ln_pre"] = {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}
        if cfg.output_dim is not None:
            params["proj"] = norm(keys[7], (d, cfg.output_dim), scale)
    return params


def patchify(pixels: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, 3, H, W] -> [B, gh*gw, 3*P*P] in conv-weight flatten order (c, ph, pw)."""
    b, c, h, w = pixels.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = pixels.reshape(b, c, gh, p, gw, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, C, P, P]
    return x.reshape(b, gh * gw, c * p * p)


def _use_pallas_attention(t: int, dh: int) -> bool:
    """The per-image all-heads Pallas kernel beats XLA across encoder
    shapes (ViT-B/32 @50 tokens: 32->23 ms full-model at batch 256; BLIP
    @577: ~20% on the attention). TPU only; sequences must fit VMEM."""
    return t <= 1024 and dh in (64, 128) and jax.default_backend() == "tpu"


def _block(x, layer, cfg: ViTConfig, act):
    b, t, d = x.shape
    heads, dh = cfg.heads, d // cfg.heads

    h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=cfg.layer_norm_epsilon)
    qkv = quant.linear(h, layer["attn"]["wqkv"], layer["attn"]["bqkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, heads, dh)
    k = k.reshape(b, t, heads, dh)
    v = v.reshape(b, t, heads, dh)
    if _use_pallas_attention(t, dh):
        from ..ops.pallas.fused_attention import fused_attention

        attn = fused_attention(q, k, v).reshape(b, t, d)
    else:
        attn = dot_product_attention(q, k, v).reshape(b, t, d)
    x = x + quant.linear(attn, layer["attn"]["wo"], layer["attn"]["bo"])

    h = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"], eps=cfg.layer_norm_epsilon)
    h = quant.linear(h, layer["mlp"]["w1"], layer["mlp"]["b1"])
    h = act(h)
    h = quant.linear(h, layer["mlp"]["w2"], layer["mlp"]["b2"])
    return x + h


def apply(
    params: dict,
    cfg: ViTConfig,
    pixels: jnp.ndarray,  # [B, 3, H, W], already resized + normalized
    output: Optional[str] = None,  # "pooled" | "tokens_proj" | "tokens"
    remat: bool = False,
) -> jnp.ndarray:
    if output is None:
        output = "pooled" if cfg.style == "clip" else "tokens"
    act = quick_gelu if cfg.style == "clip" else gelu_exact

    x = quant.linear(patchify(pixels, cfg.patch_size), params["patch"]["w"],
                     params["patch"].get("b"))
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls"][None, None], (b, 1, x.shape[-1])).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos"][None, : x.shape[1]]

    if cfg.style == "clip":
        x = layer_norm(x, params["ln_pre"]["g"], params["ln_pre"]["b"],
                       eps=cfg.layer_norm_epsilon)

    body = functools.partial(_block, cfg=cfg, act=act)
    if remat:
        body = jax.checkpoint(body)

    def scan_fn(carry, layer):
        return body(carry, layer), None

    x, _ = jax.lax.scan(scan_fn, x, params["blocks"])

    ln_post = lambda y: layer_norm(
        y, params["ln_post"]["g"], params["ln_post"]["b"], eps=cfg.layer_norm_epsilon
    )

    if output == "pooled":
        pooled = ln_post(x[:, 0])
        if "proj" in params:
            pooled = jnp.dot(pooled, params["proj"])
        return pooled
    if output == "tokens_proj":
        # the reference's all-features patch: NO ln_post, all tokens @ proj
        if "proj" not in params:
            raise ValueError("tokens_proj needs a projection (CLIP-style ViT)")
        return jnp.dot(x, params["proj"])
    if output == "tokens":
        return ln_post(x)
    raise ValueError(f"unknown ViT output mode {output!r}")


def quantize_params(params: dict) -> dict:
    """Quantize the matmul weights to int8 (frozen-inference encode path).

    Patchify, QKV, attention-out and MLP weights become
    {"q": int8, "s": f32} dicts consumed by ops.quant.linear; layernorms,
    embeddings and the output projection stay bf16/f32 (the projection is
    tiny and feeds cosine similarities downstream).
    """
    import copy

    out = dict(params)
    out["patch"] = dict(params["patch"])
    out["patch"]["w"] = quant.quantize_weight(params["patch"]["w"])
    blocks = jax.tree_util.tree_map(lambda x: x, params["blocks"])  # shallow copy
    blocks = {
        **blocks,
        "attn": {
            **blocks["attn"],
            "wqkv": quant.quantize_weight(params["blocks"]["attn"]["wqkv"]),
            "wo": quant.quantize_weight(params["blocks"]["attn"]["wo"]),
        },
        "mlp": {
            **blocks["mlp"],
            "w1": quant.quantize_weight(params["blocks"]["mlp"]["w1"]),
            "w2": quant.quantize_weight(params["blocks"]["mlp"]["w2"]),
        },
    }
    out["blocks"] = blocks
    return out
