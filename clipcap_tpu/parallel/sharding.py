"""Parameter / optimizer-state sharding rules.

The TPU-native replacement for the reference's distribution options:

- plain data parallelism (reference: PL DDP over NCCL, train.py:276) =
  batch sharded over the `data` mesh axis, params replicated; XLA emits
  the gradient all-reduce that DDP does by hand;
- ZeRO-style sharding (reference: DeepSpeed strategy string, train.py:279,
  model.py:166-168, utils/deepspeed_state_dicts_gen.py) = parameters and
  optimizer state laid out over the `data` axis with NamedSharding; XLA
  inserts the all-gathers/reduce-scatters ZeRO implements manually;
- tensor parallelism over the `model` axis for big-LM decode (GPT-J):
  per-model partition rules live with each model module; this file holds
  the generic machinery.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS


def _zero_spec(shape, data_size: int, min_size: int) -> P:
    """Shard the largest divisible axis over `data`; replicate otherwise."""
    if int(np.prod(shape)) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % data_size == 0 and shape[axis] >= data_size:
            spec = [None] * len(shape)
            spec[axis] = DATA_AXIS
            return P(*spec)
    return P()


def param_shardings(
    params: Any,
    mesh: Mesh,
    zero: bool = False,
    min_size_to_shard: int = 2**16,
):
    """A pytree of NamedSharding matching `params`' structure.

    zero=False: fully replicated (plain DDP equivalent).
    zero=True:  ZeRO-3-style — each tensor sharded over the data axis on
                its largest divisible dimension; small tensors replicated.
    """
    data_size = mesh.shape[DATA_AXIS]

    def one(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0 or not zero:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _zero_spec(leaf.shape, data_size, min_size_to_shard))

    return jax.tree_util.tree_map(one, params)


def shard_params(params: Any, mesh: Mesh, zero: bool = False):
    """device_put the param tree with the chosen layout."""
    sh = param_shardings(params, mesh, zero=zero)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def batch_shardings(mesh: Mesh, batch_example: Any):
    """Leading-axis `data` sharding for every array in the batch."""

    def one(leaf):
        ndim = np.ndim(leaf)
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    return jax.tree_util.tree_map(one, batch_example)
