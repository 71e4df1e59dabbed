"""Tensor-parallel layouts for big-LM decode (GPT-J 6B class).

BASELINE.md config #4 ("GPT-J 6B ... bf16 KV-cache sharded decode"): shard
attention heads and MLP width over the `model` mesh axis so each chip holds
1/Nth of every layer and 1/Nth of the KV cache; XLA inserts the two
all-reduces per layer (after attention-out and MLP-out projections) over
ICI. Decode state (cache) stays sharded across steps — no gathers in the
loop.

Usage:
    shardings = gptj_decode_shardings(mesh)
    params = jax.device_put(params, shardings.params)
    cache  = jax.device_put(cache, shardings.cache(cache))
then jit the decode; computation follows the data layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS


@dataclasses.dataclass
class GPTJDecodeShardings:
    mesh: Mesh
    params: Any  # pytree of NamedSharding matching gptj params

    def cache(self, cache):
        """KV cache [L, B, T, H, Dh]: batch over data, heads over model."""
        kv = NamedSharding(self.mesh, P(None, DATA_AXIS, None, MODEL_AXIS, None))
        scalar = NamedSharding(self.mesh, P())
        return type(cache)(k=kv, v=kv, index=scalar)

    def activations(self):
        """[B, T, D] activations: batch over data, replicated feature dim."""
        return NamedSharding(self.mesh, P(DATA_AXIS, None, None))


def gptj_decode_shardings(mesh: Mesh, params_template: Any) -> GPTJDecodeShardings:
    """Build NamedShardings for a gptj param tree (models/gptj.py layout)."""
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    repl = ns()
    shardings = {
        "wte": ns(None, None),  # replicated: embedding lookups are cheap
        "blocks": {
            "ln1": {"g": ns(None, None), "b": ns(None, None)},
            "attn": {
                # column-parallel QKV (heads split), row-parallel out proj
                "wq": ns(None, None, MODEL_AXIS),
                "wk": ns(None, None, MODEL_AXIS),
                "wv": ns(None, None, MODEL_AXIS),
                "wo": ns(None, MODEL_AXIS, None),
            },
            "mlp": {
                "w_in": ns(None, None, MODEL_AXIS),
                "b_in": ns(None, MODEL_AXIS),
                "w_out": ns(None, MODEL_AXIS, None),
                "b_out": ns(None, None),
            },
        },
        "ln_f": {"g": repl, "b": repl},
        # vocab-parallel head: logits come out sharded over vocab
        "lm_head": {"w": ns(None, MODEL_AXIS), "b": ns(MODEL_AXIS)},
    }
    # match leaves defensively (e.g. missing lm_head bias variants)
    flat_t, treedef = jax.tree_util.tree_flatten(params_template)
    flat_s = jax.tree_util.tree_leaves(shardings)
    if len(flat_s) != len(flat_t):
        raise ValueError("sharding tree does not match gptj params layout")
    return GPTJDecodeShardings(mesh=mesh, params=shardings)


def apply_gptj_decode_shardings(params, cache, mesh):
    sh = gptj_decode_shardings(mesh, params)
    params = jax.device_put(params, sh.params)
    cache = jax.device_put(cache, sh.cache(cache))
    return params, cache, sh
