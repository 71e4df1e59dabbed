"""Int8 quantization path: numerics close to f32, dispatch correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from clipcap_tpu.core.config import ViTConfig
from clipcap_tpu.models import vit
from clipcap_tpu.ops import quant


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (16, 32)) * 0.1
    wq = quant.quantize_weight(w)
    assert wq["q"].dtype == jnp.int8 and wq["s"].shape == (32,)
    deq = wq["q"].astype(jnp.float32) * wq["s"]
    np.testing.assert_allclose(np.asarray(deq), np.asarray(w), atol=2e-3)


def test_int8_linear_close_to_f32():
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (8, 64))
    w = jax.random.normal(jax.random.fold_in(k, 1), (64, 32)) * 0.05
    b = jax.random.normal(jax.random.fold_in(k, 2), (32,)) * 0.01
    ref = x @ w + b
    got = quant.int8_linear(x, quant.quantize_weight(w), b)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale = float(jnp.abs(ref).max())
    assert err < 0.03 * scale, (err, scale)


def test_linear_dispatch():
    x = jnp.ones((2, 4))
    w = jnp.ones((4, 3))
    np.testing.assert_allclose(np.asarray(quant.linear(x, w)), 4.0)
    wq = quant.quantize_weight(w)
    np.testing.assert_allclose(np.asarray(quant.linear(x, wq)), 4.0, atol=1e-3)


def test_quantized_vit_cosine_fidelity():
    cfg = ViTConfig(image_size=32, patch_size=8, width=32, layers=2, heads=4,
                    mlp_ratio=2.0, output_dim=16, style="clip")
    params = vit.init(jax.random.PRNGKey(0), cfg)
    qparams = vit.quantize_params(params)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    a = np.asarray(vit.apply(params, cfg, pixels, output="pooled"))
    b = np.asarray(vit.apply(qparams, cfg, pixels, output="pooled"))
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.995, cos
