"""Ring-KV-cache primitives for continuous-batching decode.

Shared by the GPT-2 and GPT-J ring paths (models/{gpt2,gptj}.py
decode_step_ring / scatter_refill), driven by decode/serving.py. The
cache's time axis is treated as a ring of size T written at a single
global index, so the per-layer cache write stays ONE dynamic_update_slice
slab — the layout measured 1.6-2x faster than per-row alternatives
(models/gpt2.py _forward_cached docstring) — while every serving slot
sits at a different point in its own request. Per-slot isolation comes
from the [B, T] attention-bias window computed here.
"""

from __future__ import annotations

import jax.numpy as jnp

from .attention import NEG_INF


def ring_layout(idx, a_len: int, ring_start):
    """Ring write slot + per-row attention bias.

    Ring position p holds the K/V of global timestep
    gp(p) = idx - ((idx - p) mod T); the CURRENT token's write at `idx` is
    included (gp(idx % T) == idx). Row b may attend p iff
    gp(p) >= ring_start[b], its request's first claimed timestep. Never-
    written positions have gp < 0 <= ring_start. Causality needs no extra
    term: the ring only ever holds timesteps <= idx.

    Floor-mod (jnp.mod), NOT lax.rem: before the first wrap idx - p is
    negative for never-written positions p > idx, and truncated rem would
    give them gp == p >= start — attending zero-K/V garbage.
    """
    wslot = jnp.mod(idx, a_len)
    gp = ring_timesteps(idx, a_len)
    bias = jnp.where(gp[None, :] >= ring_start[:, None], 0.0, NEG_INF)  # [B, T]
    return wslot, bias


def ring_timesteps(idx, a_len: int):
    """gp[p]: the global timestep whose K/V ring position p currently holds
    (negative for never-written positions). Relative-position models (T5)
    need this to compute per-row query-key distances: a row with window
    start s sees ring position p at logical key position gp[p] - s."""
    return idx - jnp.mod(idx - jnp.arange(a_len), a_len)


def refill_positions(idx, prefix_len: int, a_len: int):
    """Ring slots a refilled request's P prefix entries claim.

    The prefix pretends to occupy global timesteps [idx - P, idx - 1] —
    exactly the window ring_layout grants a row with start = idx - P.
    """
    return jnp.mod(idx - prefix_len + jnp.arange(prefix_len), a_len)


def scatter_rows(big, small, slots, rp, time_axis: int):
    """Write `small`'s rows into `big` at batch rows `slots` (axis 1) and
    ring positions `rp` along `time_axis` (2 or 3). `slots` MUST be
    distinct: duplicate scatter indices have undefined write order.

    Gather-update-scatter of whole rows: refill batches are small, so the
    row copy is cheap next to a decode step.
    """
    rows = big[:, slots]
    if time_axis == 2:
        rows = rows.at[:, :, rp].set(small.astype(big.dtype))
    elif time_axis == 3:
        rows = rows.at[:, :, :, rp].set(small.astype(big.dtype))
    else:
        raise ValueError(f"unsupported time_axis {time_axis}")
    return big.at[:, slots].set(rows)
