"""The compiled training step: loss -> grads -> AutoClip -> AdamW.

Replaces the reference's Lightning training loop plumbing
(model.py:187-216 training_step + :151-161 configure_gradient_clipping +
Trainer precision/strategy flags, train.py:275-289) with one pjit'ed
function: batch sharded over the `data` mesh axis, parameters replicated
(or ZeRO-sharded), gradient all-reduce and optimizer fusion left to XLA.
Gradient accumulation (reference acc_grad_batches, train.py:93,288) is a
lax.scan over a leading micro-batch axis.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import CaptionerConfig, TrainConfig
from ..models import captioner
from .autoclip import AutoClipState, autoclip_init, autoclip_update, fixed_clip
from .optim import make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    autoclip: AutoClipState
    step: jnp.ndarray


def create_train_state(
    rng: jax.Array,
    cap_cfg: CaptionerConfig,
    lm_cfg: Any,
    train_cfg: TrainConfig,
    params: Optional[dict] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    if params is None:
        params = captioner.init(rng, cap_cfg, lm_cfg)
    mask = captioner.trainable_filter(params, cap_cfg)
    if train_cfg.bf16_compute:
        # f32 master copies exist for the optimizer's benefit; frozen
        # subtrees (the LM in prefix-only mode, the visual encoder) never
        # see an update, so they live in bf16 outright — the reference
        # holds them in fp16 under AMP (train.py:280), and a frozen
        # GPT2-XL costs 3.1 GB instead of 6.2 + 3.1 per step
        params = jax.tree_util.tree_map(
            lambda p, keep: p.astype(jnp.bfloat16)
            if (not keep and hasattr(p, "dtype")
                and jnp.issubdtype(p.dtype, jnp.floating))
            else p,
            params, mask,
        )
    tx = make_optimizer(
        lr=train_cfg.optimizer_lr,
        warmup_steps=train_cfg.scheduler_warmup_steps,
        total_steps=train_cfg.total_steps,
        weight_decay=train_cfg.weight_decay,
        trainable_mask=mask,
    )
    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        autoclip=autoclip_init(train_cfg.autoclip_history),
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx


def make_train_step(
    cap_cfg: CaptionerConfig,
    lm_cfg: Any,
    train_cfg: TrainConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    donate: bool = True,
    visual_cfg: Any = None,
    lm_apply=None,
):
    """Build the jitted (state, batch) -> (state, metrics) function.

    batch = {"tokens": int [B, T] (-1 padded)} plus either
      "prefix": f32 visual features (precomputed-shard path), or
      "pixels": f32 [B, 3, H, W] — requires visual_cfg; the visual encoder
      runs inside the step (frozen via stop_gradient unless
      cap_cfg.train_visual_encoder, reference model.py:196-201).
    With accumulate_grad_batches > 1, arrays carry a leading [A] axis.
    lm_apply: optional LM-forward override (models/captioner.forward),
      e.g. parallel/pp.make_gpt2_pp_apply for pipeline-parallel training.
    """

    def encode_pixels(params, pixels):
        from ..models import vit

        mode = "tokens" if visual_cfg.style == "blip" else (
            "tokens_proj" if cap_cfg.mapper.use_all_features else "pooled"
        )
        feats = vit.apply(params["visual"], visual_cfg, pixels, output=mode,
                          remat=train_cfg.remat)
        if not cap_cfg.train_visual_encoder:
            feats = jax.lax.stop_gradient(feats)
        return feats

    trainable_mask = None  # built lazily from the first params tree

    def loss_fn(params, mb):
        # freeze non-trainable subtrees at the SOURCE: prefix-only training
        # must not spend the backward pass materializing LM weight grads
        # (6.2 GB f32 for GPT2-XL), and AutoClip's percentile history must
        # see the norm of the trainable (mapper) grads only — the reference
        # clips over CLIPCaptionPrefixOnly.parameters(), which excludes the
        # LM entirely (model.py:151-161, :219-226)
        nonlocal trainable_mask
        if trainable_mask is None:
            trainable_mask = captioner.trainable_filter(params, cap_cfg)
        params = jax.tree_util.tree_map(
            lambda p, keep: p if keep else jax.lax.stop_gradient(p),
            params, trainable_mask,
        )
        if train_cfg.bf16_compute:
            # mixed precision, TPU style (reference AMP fp16, train.py:280):
            # master params stay f32; the forward sees bf16 casts (grads flow
            # through the cast back to f32); losses/softmax stay f32 inside
            # the models' accumulation policy
            fwd_params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                params,
            )
        else:
            fwd_params = params
        prefix = mb["prefix"] if "prefix" in mb else encode_pixels(fwd_params, mb["pixels"])
        prefix = prefix.astype(jnp.bfloat16) if train_cfg.bf16_compute else prefix
        loss, metrics = captioner.caption_loss(
            fwd_params, cap_cfg, lm_cfg, mb["tokens"], prefix,
            remat=train_cfg.remat, lm_apply=lm_apply,
        )
        return loss, metrics

    def compute_grads(params, batch):
        # differentiate ONLY the trainable partition: frozen leaves enter
        # the loss via closure, so the backward never materializes their
        # (zero) weight grads — and non-float frozen leaves (an int8
        # frozen LM under the W8A16 training forward, models/gptj.apply_q8)
        # are legal, which value_and_grad over the full tree rejects
        nonlocal trainable_mask
        if trainable_mask is None:
            trainable_mask = captioner.trainable_filter(params, cap_cfg)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        mleaves = jax.tree_util.tree_leaves(trainable_mask)
        frozen = [None if m else l for l, m in zip(leaves, mleaves)]
        diff0 = [l for l, m in zip(leaves, mleaves) if m]

        def rebuild(diff):
            it = iter(diff)
            return jax.tree_util.tree_unflatten(
                treedef,
                [next(it) if m else f for m, f in zip(mleaves, frozen)],
            )

        grad_fn = jax.value_and_grad(
            lambda diff, mb: loss_fn(rebuild(diff), mb), has_aux=True)

        if train_cfg.accumulate_grad_batches > 1:
            def micro(acc, mb):
                (loss, aux), grads = grad_fn(diff0, mb)
                acc_grads, acc_loss = acc
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                return (acc_grads, acc_loss + loss), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, diff0)
            (g, loss_sum), _ = jax.lax.scan(
                micro, (zeros, jnp.zeros(())), batch
            )
            a = train_cfg.accumulate_grad_batches
            g = jax.tree_util.tree_map(lambda x: x / a, g)
            loss = loss_sum / a
        else:
            (loss, aux), g = grad_fn(diff0, batch)
        # reinflate to the full param-tree structure: frozen leaves get
        # zero grads — exactly what the stop_gradient-in-loss recipe
        # produced, so AutoClip's percentile history and the masked
        # optimizer see identical trees (reference model.py:151-161)
        it = iter(g)
        grads = jax.tree_util.tree_unflatten(
            treedef,
            [next(it) if m else jnp.zeros_like(f)
             for m, f in zip(mleaves, frozen)],
        )
        return loss, grads

    def train_step(state: TrainState, batch) -> Tuple[TrainState, dict]:
        loss, grads = compute_grads(state.params, batch)

        if train_cfg.gradient_clip_val < 0:
            grads, ac_state, clip_metrics = autoclip_update(
                state.autoclip, grads, train_cfg.autoclip_percentile
            )
        else:
            grads, pre_norm = fixed_clip(grads, train_cfg.gradient_clip_val)
            ac_state = state.autoclip
            clip_metrics = {"grad_norm_pre_clip": pre_norm}

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            autoclip=ac_state,
            step=state.step + 1,
        )
        metrics = {"loss": loss, "step": state.step, **clip_metrics}
        return new_state, metrics

    # Sharding follows the data: the caller lays out state (replicated or
    # ZeRO via parallel.shard_params) and batch (data-axis via
    # core.mesh.shard_batch); jit propagates those layouts and XLA inserts
    # the collectives. Donation reuses the old state's buffers in place.
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
