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

import jax
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


def paste_rows(big, small, q, rp, time_axis: int):
    """Write `small`'s R rows into `big` at the CONTIGUOUS batch-row block
    [q, q+R) (axis 1, q traced, no wrap — the serving host splits refills
    at the slot-ring boundary) and ring positions `rp` along `time_axis`.
    `rp` MUST be a contiguous modular window — refill_positions output —
    since only rp[0] is consulted.

    Target rows are overwritten WHOLE: `small` is padded to the ring
    extent and rotated so its entries land at `rp`; positions outside the
    window receive unspecified junk. That is safe because ring_layout
    masks them for the refilled row (their gp is either < start or the
    current write slot, which the next decode step overwrites before
    attending), and no other row ever reads them.

    Why contiguous: this lowers to pure dynamic_update_slice — measured
    ~18 ms for 256 GPT2-XL rows on the v5e. Arbitrary-slot scatters are
    an order of magnitude worse AND blow HBM at refill sizes worth using:
    the r2 gather/set-at-rp/scatter form ran 254 ms (per-index scatter
    lowering), a rolled row-scatter ~150 ms, and at R=256 XLA inserts a
    relayout copy of the WHOLE 4.7 GB cache slab plus a 2.3 GB temp —
    OOM with params resident. The serving engine therefore retires slots
    FIFO (decode/serving.py) so every refill block is contiguous.
    """
    a_len = big.shape[time_axis]
    p = small.shape[time_axis]
    pad = [(0, 0)] * small.ndim
    pad[time_axis] = (0, a_len - p)
    full = jnp.pad(small.astype(big.dtype), pad)
    # roll right by rp[0] via doubled-array dynamic_slice (jnp.roll's
    # traced-shift lowering is itself a scatter)
    two = jnp.concatenate([full, full], axis=time_axis)
    start = [0] * full.ndim
    start[time_axis] = a_len - rp[0]
    full = jax.lax.dynamic_slice(two, start, full.shape)
    dst = [0] * big.ndim
    dst[1] = q
    return jax.lax.dynamic_update_slice(big, full, dst)


def paste_rows_axis0(big, small, q):
    """Contiguous-block row paste on axis 0 (per-request tensors with no
    layer axis: t5 enc_hidden, serving state vectors)."""
    dst = [0] * big.ndim
    dst[0] = q
    return jax.lax.dynamic_update_slice(big, small.astype(big.dtype), dst)
