"""Mixture-of-experts mapper: expert-parallel capacity scaling.

Beyond-reference capability (the reference's mapper is a dense
transformer, layers/Transformer.py:9-130): an MoE variant of the prefix
mapper whose per-layer MLP is a bank of E expert FFNs with top-1/top-2
token routing, GShard/Switch-style. Built TPU-first:

- routing is FULLY STATIC-SHAPED: tokens are placed into a fixed
  [E, C, D] expert buffer (C = capacity per expert) with one-hot
  dispatch/combine einsums — no gather/scatter with data-dependent
  shapes, so the whole thing jits and differentiates;
- expert weights carry a leading [E] axis; under a mesh, that axis is
  sharded over `model` (parallel/ep.py) and the dispatch/combine
  einsums partition over E — XLA inserts the all-to-all-equivalent
  collectives over ICI;
- overflow tokens (beyond capacity) are dropped from the MoE branch and
  pass through the residual unscathed, the standard Switch behavior;
- the load-balancing auxiliary loss is the Switch/GShard
  `E * mean_e(fraction_tokens_e * mean_prob_e)` term, returned alongside
  the output for the train loss to weight.

The gate runs in f32 (softmax + argmax on bf16 activations is
tie-unstable across shardings).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import MapperConfig
from ..ops.activations import parse_act_fn
from ..ops.attention import multi_head_attention
from ..ops.layernorm import layer_norm

from . import mapper as dense_mapper


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    """MoE settings layered on top of a MapperConfig."""

    n_experts: int = 8
    n_top: int = 2  # 1 = Switch, 2 = GShard
    capacity_factor: float = 1.25
    aux_loss_weight: float = 1e-2


def moe_ffn_init(rng, dim: int, hidden: int, n_experts: int, dtype=jnp.float32):
    kg, k1, k2 = jax.random.split(rng, 3)
    bound = dim**-0.5
    u = functools.partial(jax.random.uniform, dtype=dtype)
    return {
        "gate": {"w": u(kg, (dim, n_experts), minval=-bound, maxval=bound)},
        "w1": u(k1, (n_experts, dim, hidden), minval=-bound, maxval=bound),
        "b1": jnp.zeros((n_experts, hidden), dtype),
        "w2": u(k2, (n_experts, hidden, dim), minval=-(hidden**-0.5),
                maxval=hidden**-0.5),
        "b2": jnp.zeros((n_experts, dim), dtype),
    }


def _top_choice(probs, used_mask):
    """Highest-prob expert not already used: returns (one_hot [S,E], gate [S])."""
    masked = jnp.where(used_mask, -jnp.inf, probs)
    idx = jnp.argmax(masked, axis=-1)
    one_hot = jax.nn.one_hot(idx, probs.shape[-1], dtype=probs.dtype)
    gate = jnp.sum(probs * one_hot, axis=-1)
    return one_hot, gate


def moe_ffn_apply(
    x: jnp.ndarray,  # [B, T, D]
    params: dict,
    moe_cfg: MoEConfig,
    act,
    expert_constraint=None,  # optional fn pinning [E, ...] tensors' sharding
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (y [B, T, D], aux_loss scalar f32)."""
    b, t, d = x.shape
    s = b * t
    e = moe_cfg.n_experts
    cap = max(1, int(moe_cfg.capacity_factor * moe_cfg.n_top * s / e))

    xf = x.reshape(s, d)
    logits = jnp.dot(xf.astype(jnp.float32), params["gate"]["w"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)  # [S, E] f32

    used = jnp.zeros_like(probs, dtype=bool)
    masks, gates = [], []
    for _ in range(moe_cfg.n_top):
        m, g = _top_choice(probs, used)
        used = used | (m > 0)
        masks.append(m)
        gates.append(g)
    denom = sum(gates) + 1e-9
    gates = [g / denom for g in gates]

    # first-come-first-serve capacity assignment; choice k queues behind
    # all of choice k-1's tokens (GShard's second-expert offset)
    offset = jnp.zeros((1, e), jnp.float32)
    dispatch = jnp.zeros((s, e, cap), jnp.float32)
    combine = jnp.zeros((s, e, cap), jnp.float32)
    for m, g in zip(masks, gates):
        pos = jnp.cumsum(m, axis=0) - 1 + offset  # [S, E]
        offset = offset + jnp.sum(m, axis=0, keepdims=True)
        keep = (pos < cap) & (m > 0)
        pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), cap, dtype=jnp.float32)
        sel = jnp.where(keep[..., None], pos_oh, 0.0) * m[..., None]
        dispatch = dispatch + sel
        combine = combine + sel * g[:, None, None]

    expert_in = jnp.einsum("sec,sd->ecd", dispatch.astype(x.dtype), xf)
    if expert_constraint is not None:
        expert_in = expert_constraint(expert_in)
    h = jnp.einsum("ecd,edh->ech", expert_in, params["w1"]) + params["b1"][:, None]
    h = act(h)
    out_e = jnp.einsum("ech,ehd->ecd", h, params["w2"]) + params["b2"][:, None]
    if expert_constraint is not None:
        out_e = expert_constraint(out_e)
    y = jnp.einsum("sec,ecd->sd", combine.astype(x.dtype), out_e)

    # Switch aux loss: E * sum_e f_e * p_e, f = token fraction routed (1st
    # choice), p = mean gate prob
    f = jnp.mean(masks[0], axis=0)
    p = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(f * p)
    return y.reshape(b, t, d), aux


def init(rng: jax.Array, cfg: MapperConfig, moe_cfg: MoEConfig,
         dtype=jnp.float32) -> dict:
    """MoE mapper params: the dense mapper tree with each layer's dense
    MLP replaced by a stacked-[L] bank of expert FFNs."""
    params = dense_mapper.init(rng, cfg, dtype)
    d = cfg.dim_embedding
    h = int(d * cfg.mlp_ratio)
    keys = jax.random.split(jax.random.fold_in(rng, 0x30E), cfg.num_layers)
    ffns = [moe_ffn_init(k, d, h, moe_cfg.n_experts, dtype) for k in keys]
    layers = dict(params["layers"])
    layers["mlp"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ffns)
    params["layers"] = layers
    return params


def _moe_layer_apply(carry, layer, *, num_heads: int, act, moe_cfg: MoEConfig,
                     expert_constraint):
    x, aux = carry
    h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"],
                   eps=dense_mapper.LN_EPS)
    attn_out, _ = multi_head_attention(
        h, None,
        wq=layer["attn"]["wq"], wkv=layer["attn"]["wkv"],
        wo=layer["attn"]["wo"], bo=layer["attn"]["bo"],
        num_heads=num_heads,
    )
    x = x + attn_out
    h = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"],
                   eps=dense_mapper.LN_EPS)
    y, layer_aux = moe_ffn_apply(h, layer["mlp"], moe_cfg, act,
                                 expert_constraint=expert_constraint)
    return (x + y, aux + layer_aux), None


def apply(params: dict, prefix: jnp.ndarray, cfg: MapperConfig,
          moe_cfg: MoEConfig, expert_constraint=None
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MoE mapper forward. Same contract as mapper.apply plus an aux loss:
    returns ([B, prefix_length, dim_embedding], aux_loss)."""
    act = parse_act_fn(cfg.act_fn)
    d = cfg.dim_embedding

    if cfg.use_all_features:
        x = jnp.dot(prefix, params["linear"]["w"]) + params["linear"]["b"]
        if "pos_embeddings" in params:
            x = x + params["pos_embeddings"][None, : x.shape[1]]
        visual_len = x.shape[1]
    else:
        x = jnp.dot(prefix, params["linear"]["w"]) + params["linear"]["b"]
        x = x.reshape(x.shape[0], cfg.clip_length, d)
        visual_len = cfg.clip_length

    const = jnp.broadcast_to(
        params["prefix_const"][None], (x.shape[0],) + params["prefix_const"].shape
    ).astype(x.dtype)
    seq = jnp.concatenate([x, const], axis=1)

    body = functools.partial(
        _moe_layer_apply, num_heads=cfg.num_heads, act=act, moe_cfg=moe_cfg,
        expert_constraint=expert_constraint,
    )
    (out, aux), _ = jax.lax.scan(
        body, (seq, jnp.zeros((), jnp.float32)), params["layers"]
    )
    return out[:, visual_len:], aux / cfg.num_layers
