"""Data-parallel KV-cached decode: batch sharded, params replicated.

The generation-side equivalent of DDP (the reference's only distribution
strategy, train.py:276/279): every chip holds the full model and decodes
its slice of the caption batch, with the KV cache sharded on the batch
axis so no collective ever touches it. This is the natural multi-chip
scale-out for GPT-2 (whose 25 heads do not split tensor-parallel — see
parallel/tp.py for GPT-J's head-sharded alternative) and composes with
the int8 weight-streaming caches (models/gpt2.py Int8KVCache — the scale
slabs shard exactly like k/v).

Usage mirrors tp.py: build shardings from a mesh, `device_put` the
params/prompt, and hand `constrain_cache` to the decode engine
(engine.generate(cache_constraint=...)) so the freshly created cache is
laid out correctly inside the traced computation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

# batch-carrying cache fields across every framework cache type -> the
# axis their batch dimension lives on: the stacked [L, B, ...] slabs
# (gpt2/gptj/t5/blip KVCache, the int8 caches' scale slabs, blip's
# precomputed cross K/V) and t5/blip's [B, ...] encoder-side tensors.
# NOTE decode/beam.py keeps its own narrower list on purpose: beam
# reorder gathers only the SELF-attention slabs (cross/encoder tensors
# are shared by all beams of one prompt and must not be gathered).
_BATCH_AXIS_BY_FIELD = {
    "k": 1, "v": 1, "ks": 1, "vs": 1,
    "cross_k": 1, "cross_v": 1,
    "enc_hidden": 0, "enc_bias": 0, "cross_bias": 0,
}


@dataclasses.dataclass
class DPDecodeShardings:
    mesh: Mesh

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def params(self, params_template: Any) -> Any:
        """Fully replicated param tree (works for bf16 and quantized)."""
        rep = self.replicated()
        return jax.tree_util.tree_map(lambda _: rep, params_template)

    def activations(self) -> NamedSharding:
        """[B, ...] inputs: batch over data."""
        return NamedSharding(self.mesh, P(DATA_AXIS))

    def constrain_cache(self, cache):
        """In-jit constraint: every batch-carrying slab over `data`.

        Note: BLIP's grouped cross K/V (decoder_lm repeat>1) carry
        batch = rows/repeat — that image-batch must still divide the data
        axis for the constraint to apply cleanly."""

        def shard(x, batch_axis):
            spec = P(*([None] * batch_axis + [DATA_AXIS]
                       + [None] * (x.ndim - batch_axis - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, spec)
            )

        upd = {}
        for name, axis in _BATCH_AXIS_BY_FIELD.items():
            val = getattr(cache, name, None)
            if val is not None and hasattr(val, "ndim") and val.ndim > axis:
                upd[name] = shard(val, axis)
        return cache._replace(**upd)


def dp_decode_shardings(mesh: Mesh) -> DPDecodeShardings:
    if DATA_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{DATA_AXIS}' axis")
    return DPDecodeShardings(mesh=mesh)
