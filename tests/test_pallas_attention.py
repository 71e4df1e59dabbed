"""Fused Pallas attention: parity vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clipcap_tpu.ops.attention import dot_product_attention


def fused_interpret(q, k, v):
    """Run the kernel in Pallas interpret mode (no TPU needed)."""
    import functools

    from jax.experimental import pallas as pl

    import importlib

    # the package attribute `fused_attention` is the function; fetch the module
    fa_mod = importlib.import_module("clipcap_tpu.ops.pallas.fused_attention")

    b, t, h, dh = q.shape
    scale = dh**-0.5

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, dh)

    spec = pl.BlockSpec((1, t, dh), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(fa_mod._attn_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, t, dh), q.dtype),
        interpret=True,
    )(to_bh(q), to_bh(k), to_bh(v))
    return out.reshape(b, h, t, dh).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("shape", [(2, 50, 4, 64), (1, 128, 2, 64)])
def test_fused_matches_xla(shape):
    b, t, h, dh = shape
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, shape, jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.float32)
    ref = dot_product_attention(q, k, v)
    got = fused_interpret(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_policy():
    from clipcap_tpu.models.vit import _use_pallas_attention

    # CPU backend in tests: policy must decline regardless of shape
    assert not _use_pallas_attention(577, 64)
