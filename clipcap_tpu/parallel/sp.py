"""Sequence parallelism: ring attention for the long-sequence encoders.

The BLIP visual encoder runs at T=577 (24x24 patches + CLS at 384 px,
SURVEY.md L0); at larger grids the [B, H, T, T] score tensor and the
per-token activations outgrow one chip. Sequence parallelism shards the
TOKEN axis over the mesh's `model` axis (batch stays on `data`, so an
encode is 2-D parallel): layernorm / MLP / projections are per-token and
therefore embarrassingly parallel, and attention runs as a RING — each
device keeps flash-style online-softmax partials (running max, running
denominator, running output, all f32) for its local queries while the
K/V blocks rotate around the ring with `jax.lax.ppermute`. The full
[T, T] score matrix never materializes on any chip, and the collective
traffic is neighbor-to-neighbor over ICI.

The reference has no sequence-parallel story (its encoders are
single-GPU torch modules, reference train.py:132-140); like
parallel/pp.py this is beyond-reference capability, pinned against the
single-chip forward by tests/test_sp.py.

Blocks use the XLA attention path (not the Pallas kernel): per-shard
sequences are short (T/N), so the fused-kernel win at T=577 does not
apply at T=577/8, and the CPU test mesh has no Mosaic anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import ViTConfig
from ..core.mesh import DATA_AXIS, MODEL_AXIS
from ..ops import quant
from ..ops.activations import gelu_exact, quick_gelu
from ..ops.attention import NEG_INF
from ..ops.layernorm import layer_norm


def ring_attention_shard(
    q: jnp.ndarray,  # [B, Tl, H, Dh] local queries
    k: jnp.ndarray,  # [B, Tl, H, Dh] local keys (will rotate)
    v: jnp.ndarray,  # [B, Tl, H, Dh] local values (will rotate)
    kv_valid: jnp.ndarray,  # [Tl] bool, key validity of the LOCAL block
    *,
    axis_name: str,
    n_shards: int,
    scale: float | None = None,
) -> jnp.ndarray:
    """Per-device ring-attention body (call inside shard_map).

    Full (non-causal) attention of the local queries over the global key
    set, accumulated one rotating block at a time with the online-softmax
    recurrence. Matches ops.attention.dot_product_attention with a
    key-padding bias to f32 accumulation order. Returns [B, Tl, H, Dh]
    in q.dtype.
    """
    b, tl, h, dh = q.shape
    if scale is None:
        scale = dh**-0.5
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    m0 = jnp.full((b, h, tl), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, tl), jnp.float32)
    o0 = jnp.zeros((b, h, tl, dh), jnp.float32)

    def step(carry, _):
        k_blk, v_blk, valid_blk, m, l, o = carry
        logits = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k_blk,
                       preferred_element_type=jnp.float32)
            * scale
        )
        valid = valid_blk[None, None, None, :]
        logits = jnp.where(valid, logits, NEG_INF)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        # exp() of masked entries is forced to 0 (not exp(NEG_INF - m)):
        # on a fully-masked block with m still at NEG_INF that difference
        # would be exp(0) = 1 and corrupt the denominator.
        p = jnp.where(valid, jnp.exp(logits - m_new[..., None]), 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_blk.astype(jnp.float32)
        )
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        valid_blk = jax.lax.ppermute(valid_blk, axis_name, perm)
        return (k_blk, v_blk, valid_blk, m_new, l, o), None

    (_, _, _, _, l, o), _ = jax.lax.scan(
        step, (k, v, kv_valid, m0, l0, o0), None, length=n_shards
    )
    out = o / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def _sp_block(x, layer, valid, cfg: ViTConfig, act, *, axis_name, n_shards):
    """vit._block with ring attention over the sharded token axis."""
    b, tl, d = x.shape
    heads, dh = cfg.heads, d // cfg.heads

    h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"],
                   eps=cfg.layer_norm_epsilon)
    qkv = quant.linear(h, layer["attn"]["wqkv"], layer["attn"]["bqkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, tl, heads, dh)
    k = k.reshape(b, tl, heads, dh)
    v = v.reshape(b, tl, heads, dh)
    attn = ring_attention_shard(
        q, k, v, valid, axis_name=axis_name, n_shards=n_shards
    ).reshape(b, tl, d)
    x = x + quant.linear(attn, layer["attn"]["wo"], layer["attn"]["bo"])

    h = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"],
                   eps=cfg.layer_norm_epsilon)
    h = quant.linear(h, layer["mlp"]["w1"], layer["mlp"]["b1"])
    h = act(h)
    h = quant.linear(h, layer["mlp"]["w2"], layer["mlp"]["b2"])
    return x + h


def make_vit_sp_apply(cfg: ViTConfig, mesh: Mesh, remat: bool = False):
    """A drop-in for models/vit.apply with the token axis sharded over the
    mesh's `model` axis and the batch over `data` (tests/test_sp.py pins
    allclose vs the single-chip forward for both ViT styles).

    The token axis (grid² + 1, e.g. 577) is zero-padded to a multiple of
    the shard count; padded KEYS are masked out of every softmax, padded
    QUERY rows are dropped before the output heads.
    """
    from ..models import vit

    n_shards = mesh.shape[MODEL_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    act = quick_gelu if cfg.style == "clip" else gelu_exact

    block = functools.partial(
        _sp_block, cfg=cfg, act=act, axis_name=MODEL_AXIS, n_shards=n_shards
    )
    if remat:
        block = jax.checkpoint(block)

    def _stack(blocks, x_local, valid_local):
        def scan_fn(carry, layer):
            return block(carry, layer, valid_local), None

        out, _ = jax.lax.scan(scan_fn, x_local, blocks)
        return out

    stack = jax.shard_map(
        _stack,
        mesh=mesh,
        in_specs=(
            P(),                            # blocks: replicated
            P(DATA_AXIS, MODEL_AXIS, None),  # x: [B, T_pad, D]
            P(MODEL_AXIS),                  # valid: [T_pad]
        ),
        out_specs=P(DATA_AXIS, MODEL_AXIS, None),
        check_vma=False,
    )

    def apply(params, pixels, output=None):
        if output is None:
            output = "pooled" if cfg.style == "clip" else "tokens"

        x = quant.linear(vit.patchify(pixels, cfg.patch_size),
                         params["patch"]["w"], params["patch"].get("b"))
        b = x.shape[0]
        if b % n_data != 0:
            raise ValueError(f"batch {b} not divisible by data={n_data}")
        cls = jnp.broadcast_to(
            params["cls"][None, None], (b, 1, x.shape[-1])
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        t = x.shape[1]
        x = x + params["pos"][None, :t]
        if cfg.style == "clip":
            x = layer_norm(x, params["ln_pre"]["g"], params["ln_pre"]["b"],
                           eps=cfg.layer_norm_epsilon)

        t_pad = -(-t // n_shards) * n_shards
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        valid = jnp.arange(t_pad) < t

        x = stack(params["blocks"], x, valid)[:, :t]

        ln_post = lambda y: layer_norm(
            y, params["ln_post"]["g"], params["ln_post"]["b"],
            eps=cfg.layer_norm_epsilon,
        )
        if output == "pooled":
            pooled = ln_post(x[:, 0])
            if "proj" in params:
                pooled = jnp.dot(pooled, params["proj"])
            return pooled
        if output == "tokens_proj":
            if "proj" not in params:
                raise ValueError("tokens_proj needs a projection (CLIP-style ViT)")
            return jnp.dot(x, params["proj"])
        if output == "tokens":
            return ln_post(x)
        raise ValueError(f"unknown ViT output mode {output!r}")

    return apply
