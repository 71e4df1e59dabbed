"""Checkpointing: Orbax sharded saves + the reference's naming scheme.

The reference's CheckpointSaver callback (train.py:20-47) writes
`{prefix}_epoch_{e}.ckpt`, a step-interval `{prefix}_latest.ckpt`
overwrite, and a `{prefix}_final.ckpt`; DeepSpeed runs drop the suffix
because ZeRO checkpoints are directories. Orbax checkpoints are always
directories, so every name here is a directory (the DeepSpeed case
generalized). Configs are embedded as JSON, mirroring Lightning's
save_hyperparameters (model.py:38) so inference can rebuild the mapper
without external args; `consolidate` mirrors the ZeRO->fp32 converter
(utils/deepspeed_state_dicts_gen.py:1-5).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..core.config import CaptionerConfig, TrainConfig


def _config_payload(cap_cfg, lm_cfg, train_cfg) -> dict:
    return {
        "captioner": dataclasses.asdict(cap_cfg),
        "lm": dataclasses.asdict(lm_cfg),
        "train": dataclasses.asdict(train_cfg) if train_cfg else None,
    }


def save_checkpoint(
    path: str,
    state: Any,
    cap_cfg: Optional[CaptionerConfig] = None,
    lm_cfg: Any = None,
    train_cfg: Optional[TrainConfig] = None,
) -> None:
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    if cap_cfg is not None:
        (path / "clipcap_config.json").write_text(
            json.dumps(_config_payload(cap_cfg, lm_cfg, train_cfg), indent=2)
        )


def restore_checkpoint(path: str, template: Any = None) -> Any:
    """Restore a state pytree; `template` supplies structure/dtypes."""
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, item=template)
        return ckptr.restore(path)


def load_config(path: str) -> dict:
    return json.loads((Path(path) / "clipcap_config.json").read_text())


def consolidate(path: str, out_path: str) -> None:
    """Gather a (possibly ZeRO-sharded) checkpoint into one .npz state dict —
    the reference's convert_zero_checkpoint_to_fp32_state_dict equivalent."""
    state = restore_checkpoint(path)
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}.{k}" if prefix else str(k), v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(f"{prefix}.{i}", v)
        elif node is not None:
            flat[prefix] = np.asarray(node)

    walk("", state)
    np.savez(out_path, **flat)


class CheckpointSaver:
    """Epoch / step-interval / final checkpoint policy (train.py:20-47)."""

    def __init__(
        self,
        output_path: str,
        filename_prefix: str,
        save_every_n_epochs: int = 1,
        save_every_n_steps: Optional[int] = 1000,
    ):
        self.output_path = Path(output_path)
        self.output_path.mkdir(exist_ok=True, parents=True)
        self.filename_prefix = filename_prefix
        self.save_every_n_epochs = save_every_n_epochs
        self.save_every_n_steps = save_every_n_steps

    def _save(self, name: str, state, **cfgs):
        save_checkpoint(str(self.output_path / name), state, **cfgs)

    def on_epoch_end(self, epoch: int, state, **cfgs):
        if self.save_every_n_epochs > 0 and epoch % self.save_every_n_epochs == 0:
            self._save(f"{self.filename_prefix}_epoch_{epoch}", state, **cfgs)

    def on_step(self, step: int, state, **cfgs):
        if (
            self.save_every_n_steps
            and self.save_every_n_steps > 0
            and step % self.save_every_n_steps == 0
        ):
            self._save(f"{self.filename_prefix}_latest", state, **cfgs)

    def save_final(self, state, **cfgs):
        self._save(f"{self.filename_prefix}_final", state, **cfgs)
