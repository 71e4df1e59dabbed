"""CLIP's ModifiedResNet image tower (RN50 / RN50x4 / RN50x16 / RN50x64).

The reference's two-stage ranking ensembles re-rank with RN50x64
(reference sampling.py:436-479, caption_me.py:56-74, multi_filter.py:176)
and evaluate_model's CLI lists every RN variant
(evaluate_model.py:631-633). Architecture per the published CLIP model:

- 3-conv stem (stride 2 on the first) + avgpool;
- Bottleneck blocks (expansion 4) with anti-aliased striding: stride-1
  convs plus an AvgPool after conv2 (and in the downsample path);
- attention pooling head: mean token prepended, learned positional
  embedding, one multi-head attention where the mean token is the query.

Convolutions lower to XLA's conv (MXU); batchnorm uses checkpoint running
stats (inference mode — the tower is frozen in every reference use).
Params import from OpenAI CLIP checkpoints via
tools/import_weights.clip_resnet_from_openai_state_dict, with the config
derived from tensor shapes (as clip.load does).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    heads: int = 32
    image_size: int = 224
    bn_eps: float = 1e-5

    @classmethod
    def variant(cls, name: str) -> "ResNetConfig":
        table = {
            "RN50": dict(layers=(3, 4, 6, 3), width=64, output_dim=1024,
                         heads=32, image_size=224),
            "RN101": dict(layers=(3, 4, 23, 3), width=64, output_dim=512,
                          heads=32, image_size=224),
            "RN50x4": dict(layers=(4, 6, 10, 6), width=80, output_dim=640,
                           heads=40, image_size=288),
            "RN50x16": dict(layers=(6, 8, 18, 8), width=96, output_dim=768,
                            heads=48, image_size=384),
            "RN50x64": dict(layers=(3, 15, 36, 10), width=128, output_dim=1024,
                            heads=64, image_size=448),
        }
        if name not in table:
            raise ValueError(f"unknown CLIP ResNet variant {name!r}")
        return cls(**table[name])


def _conv(x, w, stride: int = 1, padding: int = 0):
    """NCHW conv with OIHW weights (torch layout)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _bn(x, p, eps: float):
    scale = p["g"] / jnp.sqrt(p["var"] + eps)
    bias = p["b"] - p["mean"] * scale
    return x * scale[None, :, None, None] + bias[None, :, None, None]


def _avgpool(x, k: int):
    if k == 1:
        return x
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID"
    ) / (k * k)


def _bottleneck(x, p, stride: int, eps: float):
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"], eps))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], padding=1), p["bn2"], eps))
    out = _avgpool(out, stride)  # anti-aliased striding
    out = _bn(_conv(out, p["conv3"]), p["bn3"], eps)
    if "downsample" in p:
        identity = _avgpool(x, stride)
        identity = _bn(_conv(identity, p["downsample"]["conv"]), p["downsample"]["bn"], eps)
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attention_pool(x, p, heads: int):
    """x: [B, C, H, W] -> [B, output_dim] (mean-token query attention)."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h * w).transpose(2, 0, 1)  # [HW, B, C]
    x = jnp.concatenate([x.mean(axis=0, keepdims=True), x], axis=0)  # [HW+1, B, C]
    x = x + p["positional_embedding"][:, None, :]

    seq = x.transpose(1, 0, 2)  # [B, HW+1, C]
    q = jnp.dot(seq[:, :1], p["q_proj"]["w"]) + p["q_proj"]["b"]  # mean-token query
    k = jnp.dot(seq, p["k_proj"]["w"]) + p["k_proj"]["b"]
    v = jnp.dot(seq, p["v_proj"]["w"]) + p["v_proj"]["b"]

    dh = c // heads
    t = seq.shape[1]
    q = q.reshape(b, 1, heads, dh)
    k = k.reshape(b, t, heads, dh)
    v = v.reshape(b, t, heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (dh**-0.5)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, c)
    return jnp.dot(out, p["c_proj"]["w"]) + p["c_proj"]["b"]


def apply(params: dict, cfg: ResNetConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, S, S] (normalized) -> pooled image features [B, output_dim]."""
    eps = cfg.bn_eps
    x = jax.nn.relu(_bn(_conv(pixels, params["conv1"], stride=2, padding=1),
                        params["bn1"], eps))
    x = jax.nn.relu(_bn(_conv(x, params["conv2"], padding=1), params["bn2"], eps))
    x = jax.nn.relu(_bn(_conv(x, params["conv3"], padding=1), params["bn3"], eps))
    x = _avgpool(x, 2)
    for stage_idx in range(4):
        stage = params[f"layer{stage_idx + 1}"]
        for block_idx, block in enumerate(stage):
            stride = (1 if stage_idx == 0 else 2) if block_idx == 0 else 1
            x = _bottleneck(x, block, stride, eps)
    return _attention_pool(x, params["attnpool"], cfg.heads)


def init(rng: jax.Array, cfg: ResNetConfig, dtype=jnp.float32) -> dict:
    """Random init (testing/pipeline bring-up; real use imports checkpoints)."""
    key = iter(jax.random.split(rng, 4096))

    def conv_w(cout, cin, k):
        return jax.random.normal(next(key), (cout, cin, k, k), dtype) * (cin * k * k) ** -0.5

    def bn_p(c):
        return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype),
                "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}

    w = cfg.width
    params = {
        "conv1": conv_w(w // 2, 3, 3), "bn1": bn_p(w // 2),
        "conv2": conv_w(w // 2, w // 2, 3), "bn2": bn_p(w // 2),
        "conv3": conv_w(w, w // 2, 3), "bn3": bn_p(w),
    }
    inplanes = w
    for stage_idx, blocks in enumerate(cfg.layers):
        planes = w * (2**stage_idx)
        stage = []
        for block_idx in range(blocks):
            p = {
                "conv1": conv_w(planes, inplanes, 1), "bn1": bn_p(planes),
                "conv2": conv_w(planes, planes, 3), "bn2": bn_p(planes),
                "conv3": conv_w(planes * 4, planes, 1), "bn3": bn_p(planes * 4),
            }
            if block_idx == 0 and (stage_idx > 0 or inplanes != planes * 4):
                p["downsample"] = {"conv": conv_w(planes * 4, inplanes, 1),
                                   "bn": bn_p(planes * 4)}
            stage.append(p)
            inplanes = planes * 4
        params[f"layer{stage_idx + 1}"] = stage

    embed_dim = inplanes  # width * 32
    spacial = cfg.image_size // 32

    def lin(din, dout):
        return {"w": jax.random.normal(next(key), (din, dout), dtype) * din**-0.5,
                "b": jnp.zeros((dout,), dtype)}

    params["attnpool"] = {
        "positional_embedding": jax.random.normal(
            next(key), (spacial**2 + 1, embed_dim), dtype) * embed_dim**-0.5,
        "q_proj": lin(embed_dim, embed_dim),
        "k_proj": lin(embed_dim, embed_dim),
        "v_proj": lin(embed_dim, embed_dim),
        "c_proj": lin(embed_dim, cfg.output_dim),
    }
    return params
