"""Expert parallelism for the MoE mapper (models/moe.py).

The expert axis [E] of every expert FFN weight — and of the in-flight
[E, C, D] expert buffers — is sharded over the mesh's `model` axis, so
each chip holds and runs E/N experts. The dispatch einsum
("sec,sd->ecd") then partitions over E: XLA lowers it to the
all-to-all-equivalent collective pattern over ICI, and the combine
einsum's reduction over E becomes the return path. The gate and the
attention/layernorm halves of the layer stay replicated (they are tiny
next to the expert bank).

Beyond-reference capability (the reference's mapper is dense); pinned
against the single-device MoE forward by tests/test_ep.py and exercised
by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import MODEL_AXIS

# leaf names under layers/mlp that carry a [L, E, ...] expert axis
_EXPERT_LEAVES = {"w1", "b1", "w2", "b2"}


def moe_param_shardings(params: Any, mesh: Mesh):
    """NamedSharding tree for an MoE mapper param pytree: expert-banked
    weights shard their E axis (dim 1, after the stacked [L] axis) over
    `model`; everything else replicated."""

    def spec(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if len(names) >= 3 and names[-3] == "mlp" and names[-1] in _EXPERT_LEAVES:
            return NamedSharding(
                mesh, P(None, MODEL_AXIS, *([None] * (leaf.ndim - 2)))
            )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def expert_constraint(mesh: Mesh):
    """Sharding-constraint hook for moe_ffn_apply's [E, C, D] buffers —
    pins the expert axis to `model` so the expert matmuls stay local."""

    def constrain(x):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(MODEL_AXIS, *([None] * (x.ndim - 1))))
        )

    return constrain
