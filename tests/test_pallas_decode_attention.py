"""Interpret-mode parity for the experimental Pallas decode attention.

The kernel must reproduce the XLA int8 attention step of
models/gpt2.py:_forward_cached_q8 (same quantization constants, same
masking) to float tolerance, at full and narrowed attend_len.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clipcap_tpu.ops.pallas.decode_attention import decode_attention_q8

L, B, H, T, DH = 3, 8, 4, 16, 8


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return dict(
        kc=jnp.asarray(rng.integers(-127, 128, (L, B, H, T, DH)), jnp.int8),
        vc=jnp.asarray(rng.integers(-127, 128, (L, B, H, T, DH)), jnp.int8),
        ksc=jnp.asarray(rng.random((L, B, H, T), np.float32) * 0.01 + 1e-3),
        vsc=jnp.asarray(rng.random((L, B, H, T), np.float32) * 0.01 + 1e-3),
        q8=jnp.asarray(rng.integers(-127, 128, (B, H, DH)), jnp.int8),
        sq=jnp.asarray(rng.random((B, H), np.float32) * 0.01 + 1e-3),
    )


def _reference(d, layer, idx, a_len):
    """The XLA path's math (models/gpt2.py:_forward_cached_q8) in numpy."""
    k = np.asarray(d["kc"])[layer][:, :, :a_len].astype(np.float32)
    v = np.asarray(d["vc"])[layer][:, :, :a_len].astype(np.float32)
    scores = np.einsum("bhd,bhtd->bht", np.asarray(d["q8"], np.float32), k)
    scores = (scores * np.asarray(d["sq"])[..., None]
              * np.asarray(d["ksc"])[layer][:, :, :a_len] * DH**-0.5)
    t = np.arange(a_len)[None, None, :]
    scores = np.where(t <= idx, scores, -np.inf)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    pv = p * np.asarray(d["vsc"])[layer][:, :, :a_len]
    sp = np.maximum(np.abs(pv).max(-1, keepdims=True) / 127.0, 1e-12)
    pv8 = np.clip(np.round(pv / sp), -127, 127)
    return np.einsum("bht,bhtd->bhd", pv8, v) * sp


@pytest.mark.parametrize("a_len", [None, T, 12])
def test_matches_xla_attention_math(data, a_len):
    layer, idx = 1, 9
    al = T if a_len is None else a_len
    out = decode_attention_q8(
        data["q8"], data["sq"], data["kc"], data["vc"],
        data["ksc"][layer][:, :, :al], data["vsc"][layer][:, :, :al],
        jnp.asarray(layer, jnp.int32), jnp.asarray(idx, jnp.int32),
        attend_len=a_len, block_b=4, interpret=True,
    )
    ref = _reference(data, layer, idx, al)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-6)


def test_rejects_mismatched_scale_slice(data):
    with pytest.raises(ValueError):
        decode_attention_q8(
            data["q8"], data["sq"], data["kc"], data["vc"],
            data["ksc"][0], data["vsc"][0],
            jnp.asarray(0, jnp.int32), jnp.asarray(3, jnp.int32),
            attend_len=8, block_b=4, interpret=True,
        )
