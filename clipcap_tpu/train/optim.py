"""Optimizer + LR schedule.

The reference uses torch AdamW (or DeepSpeed FusedAdam in adam_w mode,
reference model.py:163-172) with HF's linear warmup schedule stepped
per-step (model.py:174-185). On TPU the equivalent is optax.adamw — XLA
fuses the update into a single kernel, which is what FusedAdam's CUDA op
exists for. Frozen leaves (prefix-only training, visual encoder) are
excluded via optax.masked so no optimizer state is allocated for them.
"""

from __future__ import annotations

from typing import Optional

import optax


def linear_warmup_schedule(lr: float, warmup_steps: int, total_steps: int):
    """HF get_linear_schedule_with_warmup: 0->lr over warmup, lr->0 after."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(warmup_steps, 1)
        up = step / warm
        down = jnp.maximum(total_steps - step, 0.0) / jnp.maximum(
            total_steps - warmup_steps, 1
        )
        return lr * jnp.where(step < warmup_steps, up, down)

    return schedule


def make_optimizer(
    lr: float,
    warmup_steps: int,
    total_steps: int,
    weight_decay: float = 0.01,  # torch AdamW default, what the reference ran
    trainable_mask=None,
) -> optax.GradientTransformation:
    schedule = linear_warmup_schedule(lr, warmup_steps, total_steps)
    tx = optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=weight_decay,
    )
    if trainable_mask is not None:
        # multi_transform: frozen leaves get set_to_zero (no update, no adam
        # state) — the prefix-only regime of reference model.py:219-226
        import jax

        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx
