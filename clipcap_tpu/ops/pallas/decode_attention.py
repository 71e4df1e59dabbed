"""Pallas decode-step attention over the stacked int8 KV cache.

STATUS: EXPERIMENTAL — correct (interpret-mode parity test in
tests/test_pallas_decode_attention.py) but NOT wired into the decode hot
path. Measured on v5e: the kernel's HBM->VMEM DMA of (maxT=72, Dh=64)
int8 slabs runs at ~113 GB/s against ~408 GB/s effective for the XLA
fused dynamic-slice read — the 64-lane minor dimension leaves half of
every (32, 128) int8 VMEM tile empty, and that swamps the ~20% traffic
saving this kernel exists to capture. It becomes interesting for models
with head_dim >= 128 (GPT-J's rotary heads are 256-wide) or if the cache
layout is repacked to pair heads into 128 lanes. Kept as the consumer of
the decode_step attend_len hint (lm/registry.py) with the Mosaic
lowering constraints documented below, so the next attempt doesn't
rediscover them.

The XLA decode path (models/gpt2.py:_forward_cached_q8) reads each layer's
K/V slab with a dynamic-slice that fuses into the attention dot, which
puts the step at the HBM roofline — but it cannot read *less* than the
full maxT-wide slab: narrowing the slice in XLA materializes a copy of
the narrowed region (measured 12% slower end-to-end, see
decode/engine.GenerationSettings.attend_quantum). Early decode steps have
written only idx+1 << maxT positions, so on average ~20% of the KV stream
at caption lengths (prefix 40, +32 tokens, maxT 72) is dead bytes.

This kernel makes the narrow read real: the *full stacked* K/V caches
are passed straight to pallas_call, the layer index rides in scalar
prefetch, and each grid program DMAs exactly its
(layer, row-block, :attend_len) slab HBM->VMEM — no XLA slice, no copy,
`attend_len` (static) positions on the wire. The per-position K/V scale
vectors are tiny (maxT floats per row vs maxT*Dh cache bytes), so those
ARE pre-sliced on the XLA side. Inside VMEM the kernel computes the same
int8 attention as the XLA path with the same quantization constants
(ops/quant.quantize_rows): int8 q@K^T on the MXU, f32 scale products,
softmax, V-scales folded into the probs, prob row-requantization, int8
p@V. Reduction order differs from XLA, so results match to float
tolerance, not bit-exactly.

Mosaic constraints that shaped this kernel (measured on v5e):
- a dot_general whose lhs has NO non-contracting dims fails to lower —
  the query keeps a unit dim ([G, 1, Dh]);
- in-kernel reshapes that merge leading (non-minor) dims crash the
  backend compiler — so the (batch, head) axes are flattened to one G
  axis OUTSIDE the kernel (a layout-trivial metadata reshape in XLA) and
  every ref arrives already flat.

Replaces the reference's per-token full recompute (inference.py:97,:249)
together with the engine; see models/gpt2.py for the cache layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(sc_ref, q_ref, sq_ref, ks_ref, vs_ref, k_ref, v_ref, o_ref,
            *, dh_scale: float):
    idx = sc_ref[1]
    q = q_ref[...]    # [G, 1, Dh] int8
    k = k_ref[0]      # [G, aT, Dh] int8
    v = v_ref[0]
    ks = ks_ref[...]  # [G, aT] f32 (pre-sliced)
    vs = vs_ref[...]
    sq = sq_ref[...]  # [G, 1] f32

    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )[:, 0, :].astype(jnp.float32)  # [G, aT]
    scores = scores * sq * ks * dh_scale
    tpos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(tpos <= idx, scores, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(scores, axis=-1)

    # fold the V scales into the probs, requantize rows (ops/quant.py)
    pv = p * vs
    sp = jnp.maximum(jnp.max(jnp.abs(pv), axis=-1, keepdims=True) / 127.0, 1e-12)
    pv8 = jnp.clip(jnp.round(pv / sp), -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        pv8[:, None, :], v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )[:, 0, :].astype(jnp.float32) * sp  # [G, Dh]
    o_ref[...] = out


def decode_attention_q8(
    q8: jnp.ndarray,    # [B, H, Dh] int8 (this step's query, row-quantized)
    sq: jnp.ndarray,    # [B, H] f32 query scales
    kc: jnp.ndarray,    # [L, B, H, maxT, Dh] int8 stacked K cache
    vc: jnp.ndarray,    # [L, B, H, maxT, Dh] int8 stacked V cache
    ks: jnp.ndarray,    # [B, H, aT] f32 K scales for THIS layer, pre-sliced
    vs: jnp.ndarray,    # [B, H, aT] f32 V scales for this layer, pre-sliced
    layer: jnp.ndarray,  # int32 scalar: which layer's K/V slab to read
    idx: jnp.ndarray,    # int32 scalar: last valid cache position
    attend_len: int | None = None,  # static: positions to stream (>= idx+1)
    block_b: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """One decode step's attention for one layer; returns [B, H, Dh] f32."""
    b, h, dh = q8.shape
    l_layers, max_t = kc.shape[0], kc.shape[3]
    a_len = max_t if attend_len is None else min(int(attend_len), max_t)
    if ks.shape[-1] != a_len:
        raise ValueError(f"scale slices must be attend_len={a_len} wide, got {ks.shape}")
    bb = min(block_b, b)
    g = bb * h
    scalars = jnp.stack([layer.astype(jnp.int32), idx.astype(jnp.int32)])

    # flatten (B, H) -> G outside the kernel: metadata-only reshapes
    q_flat = q8.reshape(b * h, 1, dh)
    sq_flat = sq.reshape(b * h, 1)
    ks_flat = ks.reshape(b * h, a_len)
    vs_flat = vs.reshape(b * h, a_len)
    kc_flat = kc.reshape(l_layers, b * h, max_t, dh)
    vc_flat = vc.reshape(l_layers, b * h, max_t, dh)

    kv_spec = pl.BlockSpec(
        (1, g, a_len, dh), lambda i, sc: (sc[0], i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    sl_spec = pl.BlockSpec((g, a_len), lambda i, sc: (i, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((g, 1, dh), lambda i, sc: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    sq_spec = pl.BlockSpec((g, 1), lambda i, sc: (i, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((g, dh), lambda i, sc: (i, 0),
                          memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(b * h, g),),
        in_specs=[q_spec, sq_spec, sl_spec, sl_spec, kv_spec, kv_spec],
        out_specs=o_spec,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, dh_scale=dh**-0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, dh), jnp.float32),
        interpret=interpret,
    )(scalars, q_flat, sq_flat, ks_flat, vs_flat, kc_flat, vc_flat)
    return out.reshape(b, h, dh)
