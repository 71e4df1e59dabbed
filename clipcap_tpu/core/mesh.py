"""Device mesh and sharding helpers.

This is the TPU-native replacement for the reference's distribution stack
(NCCL DDP / DeepSpeed selected via `pl.Trainer(gpus=..., strategy=...)`,
reference train.py:276-289): a single `jax.sharding.Mesh` with named axes

    data   — data parallelism (the DDP equivalent; gradients are psum'd
             over this axis by XLA when the train step is pjit'ed)
    pipe   — pipeline parallelism (layer-stack chunks, GPipe microbatch
             schedule via shard_map + ppermute; parallel/pp.py)
    model  — tensor parallelism for big LMs (sharded attention heads /
             MLP width / vocab; used for GPT-J-class decode)

ZeRO-style parameter/optimizer-state sharding (the DeepSpeed equivalent,
reference train.py:279) is expressed by laying parameters out over the
`data` axis too — see clipcap_tpu/parallel/sharding.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. `data * pipe * model` must equal the device
    count. `pipe` sits between `data` and `model` so tensor-parallel
    collectives stay on the innermost (fastest ICI) dimension."""

    data: int = 1
    model: int = 1
    pipe: int = 1

    @property
    def axis_names(self) -> tuple:
        return (DATA_AXIS, PIPE_AXIS, MODEL_AXIS)


def make_mesh(
    spec: Optional[MeshSpec] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build a Mesh from a MeshSpec.

    Defaults to pure data parallelism over every visible device. Axis order
    is (data, model) so that the model axis maps to the innermost (fastest
    ICI) dimension of the device array.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if spec is None:
        spec = MeshSpec(data=devices.size, model=1)
    need = spec.data * spec.pipe * spec.model
    if need != devices.size:
        raise ValueError(
            f"mesh {spec.data}x{spec.pipe}x{spec.model} needs {need} devices, "
            f"have {devices.size}"
        )
    device_grid = devices.reshape(spec.data, spec.pipe, spec.model)
    return Mesh(device_grid, spec.axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch with the batch dim sharded over `data`."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, ndim=np.ndim(x))), batch
    )


def local_device_count() -> int:
    return jax.local_device_count()
