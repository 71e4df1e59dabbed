"""Pipeline parallelism for the stacked-layer LMs (GPipe schedule).

TPU-native pipeline training: the models already stack per-layer weights
on a leading [L] axis (CLAUDE.md conventions), so a pipeline stage is a
contiguous [L/S] chunk of that stack sharded over a `pipe` mesh axis.
Activations rotate stage-to-stage with `jax.lax.ppermute` inside one
`jax.shard_map` — the classic rotating-buffer pipelined scan: with S
stages and M microbatches the loop runs M + S - 1 ticks; stage 0 feeds
microbatch t at tick t, stage s processes microbatch t - s, the last
stage emits microbatch t - (S - 1). Collectives ride ICI; XLA
differentiates the whole thing (ppermute's transpose is the reverse
permute), so `jax.grad` of a loss over `pipeline_lm_apply` yields the
reverse-schedule backward pipeline with no hand-written VJP.

The reference has no pipeline story (single-process Lightning with an
optional 2-GPU placement split, reference train.py:276-289 — see
SURVEY.md §2.5); this is beyond-reference capability for models whose
layer stack outgrows one chip. Embeddings / final LN / lm_head are
computed replicated on every pipe stage: they are O(vocab·d) against the
stack's O(L·12d²) and keeping them replicated avoids a separate
embedding stage that would idle the pipe (documented trade-off).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from ..ops.attention import NEG_INF
from ..ops.layernorm import layer_norm

PIPE_AXIS = "pipe"


def _pipelined_stack(blocks_chunk, xs, biases, *, block_fn, n_stages: int,
                     n_micro: int):
    """Per-device shard_map body: run this stage's layer chunk over the
    rotating microbatch stream.

    blocks_chunk: this stage's [L/S, ...] slice of the stacked layer params
    xs:           [M, mb, T, D] microbatches (stage 0 consumes these)
    biases:       [M, mb or 1, 1, T, T] attention bias per microbatch
    returns       [M, mb, T, D] outputs (valid on every stage after the
                  final psum-broadcast from the last stage)
    """
    s = jax.lax.axis_index(PIPE_AXIS)
    last = n_stages - 1

    def chunk_apply(x, bias):
        def scan_fn(carry, layer):
            return block_fn(carry, layer, bias), None

        out, _ = jax.lax.scan(scan_fn, x, blocks_chunk)
        return out

    def tick(carry, t):
        buf, ys = carry
        # stage s holds microbatch (t - s); clip keeps warm-up/drain ticks
        # in-range — their results are masked out of ys below
        m = jnp.clip(t - s, 0, n_micro - 1)
        inp = jnp.where(s == 0, xs[jnp.clip(t, 0, n_micro - 1)], buf)
        out = chunk_apply(inp, biases[m])
        w = t - last
        wc = jnp.clip(w, 0, n_micro - 1)
        write = (s == last) & (w >= 0) & (w < n_micro)
        ys = ys.at[wc].set(jnp.where(write, out, ys[wc]))
        buf = jax.lax.ppermute(
            out, PIPE_AXIS, [(i, (i + 1) % n_stages) for i in range(n_stages)]
        )
        return (buf, ys), None

    buf0 = jnp.zeros_like(xs[0])
    ys0 = jnp.zeros_like(xs)
    (_, ys), _ = jax.lax.scan(
        tick, (buf0, ys0), jnp.arange(n_micro + n_stages - 1)
    )
    # only the last stage holds real outputs; broadcast so the (replicated)
    # head below sees them on every pipe row
    ys = jax.lax.psum(jnp.where(s == last, ys, jnp.zeros_like(ys)), PIPE_AXIS)
    return ys


def make_gpt2_pp_apply(cfg, mesh: Mesh, n_micro: int, remat: bool = False):
    """A drop-in for models/gpt2.apply with the block stack pipelined over
    the mesh's `pipe` axis (batch stays sharded over `data`).

    Same signature and numerics as gpt2.apply (tests/test_pp.py pins
    allclose): embeddings + final LN + tied head run replicated per pipe
    stage; only params["blocks"] need the P('pipe', ...) leading-axis
    layout (see pp_param_shardings).
    """
    from ..models.gpt2 import _block

    n_stages = mesh.shape[PIPE_AXIS]
    if cfg.n_layer % n_stages != 0:
        raise ValueError(
            f"n_layer={cfg.n_layer} not divisible by pipe={n_stages}"
        )

    block_fn = functools.partial(_block, cfg=cfg)
    if remat:
        block_fn = jax.checkpoint(block_fn)

    stack = jax.shard_map(
        functools.partial(
            _pipelined_stack, block_fn=block_fn, n_stages=n_stages,
            n_micro=n_micro,
        ),
        mesh=mesh,
        in_specs=(
            P(PIPE_AXIS),                    # blocks: [L] chunked per stage
            P(None, DATA_AXIS),              # xs: [M, mb, T, D]
            P(None, DATA_AXIS),              # biases: [M, mb, 1, T, T]
        ),
        out_specs=P(None, DATA_AXIS),
        check_vma=False,
    )

    def apply(params, inputs_embeds, attention_mask=None,
              logits_slice: Optional[Tuple[int, int]] = None):
        b, t, d = inputs_embeds.shape
        if b % n_micro != 0:
            raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
        x = inputs_embeds + params["wpe"][jnp.arange(t)][None].astype(
            inputs_embeds.dtype
        )

        qi = jnp.arange(t)[:, None]
        ki = jnp.arange(t)[None, :]
        bias = jnp.where(ki <= qi, 0.0, NEG_INF)[None, None]  # [1,1,T,T]
        bias = jnp.broadcast_to(bias, (b, 1, t, t))
        if attention_mask is not None:
            bias = bias + jnp.where(
                attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF
            )

        mb = b // n_micro
        xs = x.reshape(n_micro, mb, t, d)
        biases = bias.reshape(n_micro, mb, 1, t, t)
        x = stack(params["blocks"], xs, biases).reshape(b, t, d)

        if logits_slice is not None:
            x = x[:, logits_slice[0] : logits_slice[1]]
        x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"],
                       eps=cfg.layer_norm_epsilon)
        return jnp.dot(x, params["wte"].T)

    return apply


def pp_param_shardings(params: Any, mesh: Mesh):
    """NamedSharding tree for a GPT-2 param pytree under pipeline layout:
    the stacked blocks chunk their leading [L] axis over `pipe`, everything
    else replicated. Optimizer state built from these params inherits the
    same layout via jit sharding propagation."""

    def blocks_spec(leaf):
        return NamedSharding(mesh, P(PIPE_AXIS, *([None] * (leaf.ndim - 1))))

    def rep(leaf):
        return NamedSharding(mesh, P())

    out = {k: jax.tree_util.tree_map(rep, v) for k, v in params.items()
           if k != "blocks"}
    out["blocks"] = jax.tree_util.tree_map(blocks_spec, params["blocks"])
    return out
