"""Fused multi-head attention Pallas kernel for encoder sequences.

One grid program per IMAGE computes every head's attention entirely in
VMEM — no [B, H, T, T] score tensor in HBM, no layout transposes between
the head split and the einsums. On the encoder shapes this beats XLA's
unfused path decisively (measured on v5e): CLIP ViT-B/32 full-model encode
32.2 -> 23.2 ms at batch 256 (7.9k -> 11.0k images/sec, past the 10k
BASELINE target), BLIP @384 (577 tokens) attention ~20% faster.

The head loop is unrolled inside the kernel (static head count); each
head's [T, dh] q/k/v tiles and [T, T] f32 score block stay in VMEM. VMEM
footprint ~ 4*T*H*dh*2B + T*T*4B, fine through T=577 (~5 MB).

The decode path deliberately stays on XLA: cache streaming there is at
the HBM roofline (see models/gpt2.py:_forward_cached).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int, dh: int):
    q = q_ref[0]  # [T, H*dh]
    k = k_ref[0]
    v = v_ref[0]
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [T, T] f32
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            probs.astype(v.dtype), v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def fused_attention(
    q: jnp.ndarray,  # [B, T, H, dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    max_vmem_seq: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bidirectional fused attention; returns [B, T, H, dh]."""
    b, t, h, dh = q.shape
    if t > max_vmem_seq:
        raise ValueError(f"sequence {t} too long for the single-block kernel")
    scale = dh**-0.5

    def flat(x):
        return x.reshape(b, t, h * dh)

    spec = pl.BlockSpec((1, t, h * dh), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, heads=h, dh=dh),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h * dh), q.dtype),
        interpret=interpret,
    )(flat(q), flat(k), flat(v))
    return out.reshape(b, t, h, dh)
