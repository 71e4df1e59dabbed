"""Sequence parallelism (parallel/sp.py) on the 8-device virtual CPU mesh:
ring attention must match the dense attention op with a key-padding bias,
and the sequence-parallel ViT forward must match the single-chip
models/vit.apply for every output mode.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from clipcap_tpu.core.config import ViTConfig
from clipcap_tpu.core.mesh import MeshSpec, make_mesh
from clipcap_tpu.models import vit
from clipcap_tpu.ops.attention import dot_product_attention, padding_bias
from clipcap_tpu.parallel.sp import make_vit_sp_apply, ring_attention_shard


def _mesh(data=2, model=4):
    if len(jax.devices()) < data * model:
        pytest.skip(f"needs {data * model} devices")
    return make_mesh(MeshSpec(data=data, pipe=1, model=model),
                     devices=jax.devices()[: data * model])


def test_ring_attention_matches_dense():
    mesh = _mesh(data=1, model=4)
    b, t, h, dh = 2, 13, 3, 8
    t_pad = 16
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t_pad, h, dh))
    k = jax.random.normal(kk, (b, t_pad, h, dh))
    v = jax.random.normal(kv, (b, t_pad, h, dh))
    valid = jnp.arange(t_pad) < t

    mask = jnp.broadcast_to(valid[None], (b, t_pad))
    want = dot_product_attention(q, k, v, bias=padding_bias(mask))[:, :t]

    ring = jax.shard_map(
        functools.partial(ring_attention_shard, axis_name="model", n_shards=4),
        mesh=mesh,
        in_specs=(P(None, "model"), P(None, "model"), P(None, "model"),
                  P("model")),
        out_specs=P(None, "model"),
        check_vma=False,
    )
    with mesh:
        got = jax.jit(ring)(q, k, v, valid)[:, :t]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


CLIP_CFG = ViTConfig(image_size=28, patch_size=4, width=32, layers=3,
                     heads=4, output_dim=16, style="clip")
BLIP_CFG = ViTConfig(image_size=24, patch_size=4, width=32, layers=3,
                     heads=4, output_dim=None, style="blip")


@pytest.mark.parametrize("cfg,output", [
    (CLIP_CFG, "pooled"),
    (CLIP_CFG, "tokens_proj"),
    (BLIP_CFG, "tokens"),
])
def test_sp_vit_matches_single_chip(cfg, output):
    # token counts (50 clip / 37 blip) are deliberately NOT divisible by
    # the 4-way model axis — exercises the pad + key-mask path
    mesh = _mesh(data=2, model=4)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    pixels = jax.random.normal(
        jax.random.PRNGKey(1), (4, 3, cfg.image_size, cfg.image_size)
    )
    want = vit.apply(params, cfg, pixels, output=output)
    with mesh:
        sp_apply = make_vit_sp_apply(cfg, mesh)
        got = jax.jit(functools.partial(sp_apply, output=output))(
            params, pixels
        )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_sp_vit_rejects_bad_batch():
    mesh = _mesh(data=2, model=4)
    params = vit.init(jax.random.PRNGKey(0), CLIP_CFG)
    pixels = jnp.zeros((3, 3, 28, 28))
    with mesh:
        sp_apply = make_vit_sp_apply(CLIP_CFG, mesh)
        with pytest.raises(ValueError, match="not divisible"):
            sp_apply(params, pixels)
