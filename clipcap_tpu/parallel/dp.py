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

# every framework cache type keeps its batched slabs in these fields with
# batch at axis 1 of [L, B, ...] (gpt2/gptj/t5/blip KVCache + Int8KVCache)
_BATCHED_CACHE_FIELDS = ("k", "v", "ks", "vs")


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
        """In-jit constraint: batch axis (axis 1 of [L, B, ...]) over data."""

        def shard(x):
            spec = P(*([None, DATA_AXIS] + [None] * (x.ndim - 2)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, spec)
            )

        upd = {name: shard(getattr(cache, name))
               for name in _BATCHED_CACHE_FIELDS if hasattr(cache, name)}
        return cache._replace(**upd)


def dp_decode_shardings(mesh: Mesh) -> DPDecodeShardings:
    if DATA_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{DATA_AXIS}' axis")
    return DPDecodeShardings(mesh=mesh)
