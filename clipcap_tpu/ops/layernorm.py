"""Normalization ops with float32 statistic accumulation.

On TPU, layernorm statistics must accumulate in f32 even when activations
are bf16 — XLA fuses the cast, so there is no extra HBM traffic.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x, gamma, beta, eps: float = 1e-5):
    """LayerNorm over the last axis; stats in f32, output in x.dtype."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(orig_dtype)


def rms_norm(x, gamma, eps: float = 1e-6):
    """T5-style RMSNorm: no mean subtraction, no bias; stats in f32.

    Matches HF T5LayerNorm: the normalized activation is cast back to the
    weight dtype *before* scaling.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (gamma * y.astype(orig_dtype)).astype(orig_dtype)
