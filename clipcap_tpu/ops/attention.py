"""Attention ops.

`dot_product_attention` is the XLA-level reference implementation (batched
einsum on the MXU, f32 softmax accumulation). A fused Pallas flash kernel
for long-sequence ViT encoding lives in ops/pallas/flash_attention.py and
is selected by `multi_head_attention(..., use_pallas=True)`.

Shapes follow the [B, T, H, Dh] convention throughout the framework.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def dot_product_attention(
    q: jnp.ndarray,  # [B, Tq, H, Dh]
    k: jnp.ndarray,  # [B, Tk, H, Dh]
    v: jnp.ndarray,  # [B, Tk, H, Dh]
    bias: Optional[jnp.ndarray] = None,  # additive, broadcastable to [B,H,Tq,Tk]
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """MXU attention with f32 logit accumulation.

    Returns [B, Tq, H, Dh] in q.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits.astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return out


def causal_bias(tq: int, tk: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal bias of shape [1, 1, tq, tk].

    Positions are aligned to the *end*: query i attends keys <= i + (tk - tq),
    which is the correct alignment for KV-cached decoding where queries are
    the last tq positions of a tk-long context.
    """
    qi = jnp.arange(tq)[:, None] + (tk - tq)
    ki = jnp.arange(tk)[None, :]
    mask = ki <= qi
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)[None, None]


def padding_bias(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, Tk] boolean/int key-validity mask -> additive [B, 1, 1, Tk] bias."""
    return jnp.where(mask[:, None, None, :].astype(bool), 0.0, NEG_INF)


def multi_head_attention(
    x: jnp.ndarray,  # [B, Tq, D]
    y: Optional[jnp.ndarray],  # [B, Tk, Dref] or None for self-attention
    wq: jnp.ndarray,  # [D, D]
    wkv: jnp.ndarray,  # [Dref, 2*D] fused K,V projection
    wo: jnp.ndarray,  # [D, D]
    num_heads: int,
    bq: Optional[jnp.ndarray] = None,
    bkv: Optional[jnp.ndarray] = None,
    bo: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    return_weights: bool = False,
):
    """Mapper-style MHA with a fused KV projection.

    Semantics match the reference's MultiHeadAttention
    (layers/MultiHeadAttention.py:4-43): a single `to_keys_values` matmul
    produces K and V interleaved as [..., 2, H, Dh]; scale is Dh^-0.5.
    """
    if y is None:
        y = x
    b, n, c = x.shape
    m = y.shape[1]
    head_dim = c // num_heads

    q = jnp.dot(x, wq)
    if bq is not None:
        q = q + bq
    kv = jnp.dot(y, wkv)
    if bkv is not None:
        kv = kv + bkv

    q = q.reshape(b, n, num_heads, head_dim)
    kv = kv.reshape(b, m, 2, num_heads, head_dim)
    k, v = kv[:, :, 0], kv[:, :, 1]

    if return_weights:
        scale = head_dim**-0.5
        logits = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            * scale
        )
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(q.dtype), v)
        out = out.reshape(b, n, c)
        out = jnp.dot(out, wo)
        if bo is not None:
            out = out + bo
        # reference returns attention as [b, n, m, h]
        return out, weights.transpose(0, 2, 3, 1)

    out = dot_product_attention(q, k, v, bias=bias)
    out = out.reshape(b, n, c)
    out = jnp.dot(out, wo)
    if bo is not None:
        out = out + bo
    return out, None
