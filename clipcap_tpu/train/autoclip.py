"""AutoClip — adaptive gradient clipping (arXiv:2007.14469).

Rebuild of the reference's AutoClip (reference auto_clip.py:7-31): keep a
bounded history of global gradient norms and clip each step to the
`percentile`-th percentile of that history (the current step's norm is
appended *before* the percentile is taken, matching the reference's
__call__ order).

TPU-first: the history is a fixed-size ring buffer inside the train state,
so the whole clip is compiled into the train step — no host round-trip per
step (the reference syncs norms to CPU every step, auto_clip.py:21).
Non-finite norms are not recorded (reference :26-27). The percentile uses
numpy-style linear interpolation over the valid prefix of the buffer.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AutoClipState(NamedTuple):
    history: jnp.ndarray  # [max_history] f32 ring buffer
    count: jnp.ndarray  # scalar int32: total norms recorded (saturates at max)
    pos: jnp.ndarray  # scalar int32: next write position


def autoclip_init(max_history: int = 50000) -> AutoClipState:
    return AutoClipState(
        history=jnp.zeros((max_history,), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        pos=jnp.zeros((), jnp.int32),
    )


def global_norm(grads) -> jnp.ndarray:
    """L2 norm over the whole gradient pytree.

    Matches the reference's norm-of-norms (auto_clip.py:21-22), which
    equals the flat global L2 norm.
    """
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))


def _percentile_of_valid(history: jnp.ndarray, count: jnp.ndarray, percentile: float):
    """np.percentile(history[:count], percentile) with static shapes."""
    max_h = history.shape[0]
    valid = jnp.arange(max_h) < count
    sorted_hist = jnp.sort(jnp.where(valid, history, jnp.inf))
    rank = (count.astype(jnp.float32) - 1.0) * (percentile / 100.0)
    lo = jnp.clip(jnp.floor(rank).astype(jnp.int32), 0, max_h - 1)
    hi = jnp.clip(jnp.ceil(rank).astype(jnp.int32), 0, max_h - 1)
    frac = rank - jnp.floor(rank)
    return sorted_hist[lo] * (1.0 - frac) + sorted_hist[hi] * frac


def autoclip_update(
    state: AutoClipState, grads, percentile: float
) -> Tuple[object, AutoClipState, dict]:
    """Record the norm, clip grads to the percentile. Returns
    (clipped_grads, new_state, {pre/post norms})."""
    norm = global_norm(grads)
    finite = jnp.isfinite(norm)

    history = jnp.where(
        finite, state.history.at[state.pos].set(norm), state.history
    )
    max_h = state.history.shape[0]
    pos = jnp.where(finite, (state.pos + 1) % max_h, state.pos)
    count = jnp.where(finite, jnp.minimum(state.count + 1, max_h), state.count)

    clip_value = _percentile_of_valid(history, count, percentile)
    # torch.nn.utils.clip_grad_norm_ semantics: scale by clip/(norm+eps) if norm > clip
    scale = jnp.where(
        (count > 0) & (norm > clip_value), clip_value / (norm + 1e-6), 1.0
    )
    clipped = jax.tree_util.tree_map(lambda g: (g * scale).astype(g.dtype), grads)
    new_state = AutoClipState(history=history, count=count, pos=pos)
    metrics = {
        "grad_norm_pre_clip": norm,
        "grad_norm_post_clip": norm * scale,
        "autoclip_value": clip_value,
    }
    return clipped, new_state, metrics


def fixed_clip(grads, clip_value: float):
    """Standard global-norm clipping for gradient_clip_val >= 0."""
    norm = global_norm(grads)
    scale = jnp.where(norm > clip_value, clip_value / (norm + 1e-6), 1.0)
    return jax.tree_util.tree_map(lambda g: (g * scale).astype(g.dtype), grads), norm
