"""Data-parallel decode on the fake 8-device mesh (parallel/dp.py): batch
sharded, params replicated — tokens must match single-device decode, for
both the bf16 engine path and the int8 weight-streaming caches (whose
scale slabs shard exactly like k/v). This is GPT-2's multi-chip decode
scale-out (25 heads do not split tensor-parallel; see parallel/tp.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from clipcap_tpu.core.config import CaptionerConfig, GPT2Config, MapperConfig
from clipcap_tpu.core.mesh import MeshSpec, make_mesh
from clipcap_tpu.decode import GenerationSettings, generate
from clipcap_tpu.models import captioner, gpt2
from clipcap_tpu.models.bundle import CaptionerBundle
from clipcap_tpu.parallel.dp import dp_decode_shardings

CFG = GPT2Config(vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4)


def _engine_tokens(lm, params, prefix, constraint=None):
    out = generate(
        lm, params, CFG, prefix,
        GenerationSettings(max_new_tokens=10, greedy=True),
        cache_constraint=constraint,
    )
    return np.asarray(out["tokens"])


def test_dp_engine_decode_matches_single_device():
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    prefix = jax.random.normal(jax.random.PRNGKey(1), (8, 5, CFG.n_embd))
    want = _engine_tokens(gpt2, params, prefix)

    mesh = make_mesh(MeshSpec(data=8, model=1))
    sh = dp_decode_shardings(mesh)
    with mesh:
        sp = jax.device_put(params, sh.params(params))
        spx = jax.device_put(prefix, sh.activations())
        got = _engine_tokens(gpt2, sp, spx, constraint=sh.constrain_cache)
    np.testing.assert_array_equal(got, want)


def test_dp_int8_cache_shards_and_matches():
    params = gpt2.init(jax.random.PRNGKey(0), CFG)
    q = gpt2.quantize_params(params)
    prefix = (jax.random.normal(jax.random.PRNGKey(2), (8, 5, CFG.n_embd)) * 0.1
              ).astype(jnp.bfloat16)
    want = _engine_tokens(gpt2.gpt2_int8, q, prefix)

    mesh = make_mesh(MeshSpec(data=8, model=1))
    sh = dp_decode_shardings(mesh)
    with mesh:
        qp = jax.device_put(q, sh.params(q))
        spx = jax.device_put(prefix, sh.activations())
        got = _engine_tokens(gpt2.gpt2_int8, qp, spx, constraint=sh.constrain_cache)
    np.testing.assert_array_equal(got, want)

    # the constraint actually shards all four int8-cache slabs on batch
    cache = gpt2.init_cache_q8(CFG, batch=8, max_len=16)
    with mesh:
        sc = jax.jit(sh.constrain_cache)(cache)
    for name in ("k", "v", "ks", "vs"):
        slab = getattr(sc, name)
        assert slab.sharding.shard_shape(slab.shape)[1] == 1, name


def test_bundle_enable_data_parallel_decode_composes_with_int8():
    map_cfg = MapperConfig(dim_clip=16, dim_embedding=CFG.n_embd,
                           prefix_length=4, clip_length=4,
                           num_layers=1, num_heads=2)
    cap_cfg = CaptionerConfig(lm_type="gpt2", mapper=map_cfg)
    params = captioner.init(jax.random.PRNGKey(0), cap_cfg, CFG)
    bundle = CaptionerBundle(params=params, cap_cfg=cap_cfg, lm_cfg=CFG,
                             tokenizer=None)
    bundle.enable_int8_decode()
    mesh = bundle.enable_data_parallel_decode()
    assert dict(mesh.shape)["data"] == len(jax.devices())
    assert bundle.cache_constraint is not None

    import pytest
    with pytest.raises(ValueError):
        bundle.enable_tensor_parallel(2)  # a sharding is already enabled
