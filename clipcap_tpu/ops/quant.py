"""Int8 inference quantization for frozen encoders.

v5e's MXU runs int8 at ~2x its bf16 rate (measured 1.5x end-to-end on
chained matmuls here), so the frozen preprocessing encoders (the
webdataset -> CLIP-embedding path, BASELINE.md's 10k images/sec target)
get an opt-in int8 path:

- weights: per-output-channel symmetric absmax quantization, done once;
- activations: dynamic per-row absmax quantization at runtime;
- matmul: int8 x int8 -> int32 on the MXU, dequantized by the product of
  the two scales.

Training and parity paths are untouched — this is inference-only and
opt-in (`quantize_int8=True` on the preprocess tool / vit.apply).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> dict:
    """[..., in, out] matmul weight -> {"q": int8, "s": f32 [..., out]}."""
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.squeeze(-2)}


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and "q" in leaf and "s" in leaf


def quantize_rows(x: jnp.ndarray):
    """Dynamic per-row symmetric quantization over the last axis.

    Returns (int8 values, f32 scales with a keepdims last axis).
    """
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def int8_linear(
    x: jnp.ndarray,
    wq: dict,
    bias: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """x [..., in] @ quantized [in, out] with dynamic activation scales."""
    x8, s_x = quantize_rows(x)
    y = jax.lax.dot_general(
        x8, wq["q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * s_x * wq["s"].astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype if out_dtype is not None else x.dtype)


def linear(x: jnp.ndarray, w, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dispatch: quantized dict -> int8 path; plain array -> jnp.dot."""
    if is_quantized(w):
        return int8_linear(x, w, bias)
    y = jnp.dot(x, w)
    if bias is not None:
        y = y + bias
    return y
