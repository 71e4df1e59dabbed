"""Fused Pallas attention: parity vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clipcap_tpu.ops.attention import dot_product_attention


def fused_interpret(q, k, v):
    """Run the kernel in Pallas interpret mode (no TPU needed)."""
    from clipcap_tpu.ops.pallas.fused_attention import fused_attention

    return fused_attention(q, k, v, interpret=True)


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
