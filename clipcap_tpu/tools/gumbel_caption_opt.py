"""Gumbel-softmax caption optimization against BLIP-ITC similarity.

Rebuild of the reference's blip_test.py experiment (:40-209): treat a
caption as a trainable logits matrix [T, V], sample soft one-hots with the
straight-through Gumbel-softmax at an annealed temperature (1.0 -> 0.001),
embed the soft tokens through the BLIP text encoder, and maximize the ITC
cosine similarity to the image by gradient ascent.

TPU-first: the whole step (gumbel sample -> soft embedding -> text encoder
-> ITC loss -> adam update) is one jitted function; the temperature is a
traced input so annealing doesn't recompile.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..core.config import BlipTextConfig
from ..models import blip_text
from ..ops.layernorm import layer_norm


def _soft_text_hidden(params, cfg: BlipTextConfig, soft_onehot: jnp.ndarray):
    """Text-only BLIP encoder over soft token mixtures [B, T, V]."""
    t = soft_onehot.shape[1]
    x = soft_onehot @ params["word_embeddings"]
    x = x + params["position_embeddings"][None, :t]
    x = layer_norm(x, params["emb_ln"]["g"], params["emb_ln"]["b"],
                   eps=cfg.layer_norm_epsilon)

    eps = cfg.layer_norm_epsilon

    def body(x, layer):
        x = blip_text._post_ln_attention(x, x, layer["self"], cfg.num_heads, None, eps)
        x = blip_text._ffn(x, layer["mlp"], eps)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


def gumbel_softmax(rng, logits, tau, hard: bool = True):
    g = jax.random.gumbel(rng, logits.shape, dtype=logits.dtype)
    y = jax.nn.softmax((logits + g) / tau, axis=-1)
    if hard:
        idx = jnp.argmax(y, axis=-1)
        y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
        y = y_hard + y - jax.lax.stop_gradient(y)  # straight-through
    return y


def optimize_caption(
    retrieval_params: dict,  # models.blip_retrieval params
    text_cfg: BlipTextConfig,
    image_embeds: jnp.ndarray,  # [1, Tv, D] from blip_retrieval.encode_image
    tokenizer,
    caption_length: int = 12,
    steps: int = 5000,
    lr: float = 0.1,
    tau_start: float = 1.0,
    tau_end: float = 0.001,
    seed: int = 0,
    log_every: int = 500,
) -> dict:
    """Returns {"caption": str, "tokens": list[int], "itc": float}."""
    text_params = retrieval_params["text"]
    vocab = text_cfg.vocab_size

    img_feat = (image_embeds[:, 0] @ retrieval_params["vision_proj"]["w"]
                + retrieval_params["vision_proj"]["b"])
    img_feat = img_feat / jnp.linalg.norm(img_feat, axis=-1, keepdims=True)

    rng = jax.random.PRNGKey(seed)
    logits = 0.01 * jax.random.normal(rng, (1, caption_length, vocab))
    tx = optax.adam(lr)
    opt_state = tx.init(logits)

    cls = tokenizer.cls_token_id
    sep = tokenizer.sep_token_id

    def itc_of(soft):
        # fixed [CLS] ... [SEP] frame around the optimized positions
        frame = jnp.concatenate(
            [
                jax.nn.one_hot(jnp.full((1, 1), cls), vocab),
                soft,
                jax.nn.one_hot(jnp.full((1, 1), sep), vocab),
            ],
            axis=1,
        )
        hidden = _soft_text_hidden(text_params, text_cfg, frame)
        txt = (hidden[:, 0] @ retrieval_params["text_proj"]["w"]
               + retrieval_params["text_proj"]["b"])
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return jnp.sum(img_feat * txt)

    @jax.jit
    def step(logits, opt_state, rng, tau):
        def loss_fn(lg):
            soft = gumbel_softmax(rng, lg, tau)
            return -itc_of(soft)

        loss, grads = jax.value_and_grad(loss_fn)(logits)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(logits, updates), opt_state, -loss

    sim = jnp.zeros(())
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        tau = tau_start * (tau_end / tau_start) ** (i / max(steps - 1, 1))
        logits, opt_state, sim = step(logits, opt_state, sub, jnp.float32(tau))
        if log_every and (i % log_every == 0 or i == steps - 1):
            ids = [int(t) for t in jnp.argmax(logits[0], axis=-1)]
            print(f"step {i}: itc={float(sim):.4f} tau={tau:.4f} "
                  f"caption={tokenizer.decode(ids)!r}")

    ids = [int(t) for t in jnp.argmax(logits[0], axis=-1)]
    return {"caption": tokenizer.decode(ids), "tokens": ids, "itc": float(sim)}
