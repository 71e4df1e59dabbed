"""ops/ring.py invariants, pinned against a literal ring simulation.

The serving tests (test_serving.py) pin end-to-end token parity; these
pin the primitives' corner cases directly: never-written positions before
the first wrap, exact-capacity windows at the overwrite boundary, and
refill positions across the wrap seam.
"""

import numpy as np
import jax.numpy as jnp

from clipcap_tpu.ops.attention import NEG_INF
from clipcap_tpu.ops.ring import (paste_rows, refill_positions, ring_layout,
                                  ring_timesteps)

T = 8


def _naive_gp(idx, a_len):
    """Literal simulation: replay every write 0..idx and read back which
    global timestep each ring position holds (-1 = never written)."""
    slots = [-1] * a_len
    for g in range(idx + 1):
        slots[g % a_len] = g
    return slots


def test_ring_timesteps_matches_simulation():
    for idx in [0, 3, T - 1, T, T + 1, 3 * T + 5]:
        gp = np.asarray(ring_timesteps(jnp.int32(idx), T))
        sim = _naive_gp(idx, T)
        for p in range(T):
            if sim[p] >= 0:
                assert gp[p] == sim[p], (idx, p)
            else:
                # never written: must be negative so any start >= 0 masks it
                assert gp[p] < 0, (idx, p)


def test_ring_layout_window_and_write_slot():
    # three rows with different window starts at idx=11 (wrapped once)
    idx = jnp.int32(11)
    start = jnp.asarray([0, 5, 11], jnp.int32)
    wslot, bias = ring_layout(idx, T, start)
    assert int(wslot) == 11 % T
    gp = _naive_gp(11, T)
    bias = np.asarray(bias)
    for b, s in enumerate([0, 5, 11]):
        for p in range(T):
            visible = gp[p] >= 0 and gp[p] >= s
            assert (bias[b, p] == 0.0) == visible, (b, p)
            if not visible:
                assert bias[b, p] == NEG_INF
    # row 0 wants [0, 11] but the ring only holds the last T timesteps —
    # exactly why serving sizes the ring at prefix+max_new_tokens+1
    assert np.asarray(bias)[0].tolist().count(0.0) == T


def test_refill_positions_wrap_seam():
    # refill at idx=10 with P=4: claims timesteps 6..9 -> ring slots 6,7,0,1
    rp = np.asarray(refill_positions(jnp.int32(10), 4, T))
    assert rp.tolist() == [6, 7, 0, 1]


def test_paste_rows_window_lands_and_other_rows_untouched():
    """Contract: the contiguous block [q, q+R) gets `small` at the modular
    window `rp`; rows OUTSIDE the block are untouched. Block rows'
    positions outside the window are unspecified (the roll formulation
    writes junk there — always bias-masked by ring_layout, see
    paste_rows docstring)."""
    big = jnp.full((2, 4, T, 3), 5.0)  # [L, B, T, D]
    small = jnp.ones((2, 2, 2, 3)) * 7.0
    # window crossing the wrap seam: idx=9, P=2 -> rp=[7, 0]
    rp = refill_positions(jnp.int32(9), 2, T)
    assert np.asarray(rp).tolist() == [7, 0]
    out = np.array(paste_rows(big, small, jnp.int32(1), rp, time_axis=2))
    for row in (1, 2):
        for p in (7, 0):
            assert (out[:, row, p] == 7.0).all(), (row, p)
    for row in (0, 3):
        assert (out[:, row] == 5.0).all(), row
