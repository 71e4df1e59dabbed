"""GPT-2 decoder stack (functional JAX, KV-cached decode).

Capability-equivalent of the reference's HF-backed GPT-2 wrapper
(reference lms/GPT2.py:6-19: embedding lookup, `call(inputs_embeds,
attention_mask)`), rebuilt TPU-first:

- parameters are an explicit pytree with layers stacked on a leading [L]
  axis, executed via lax.scan (one compiled block body for gpt2-xl's 48
  layers);
- a fixed-shape KV cache + `decode_step` replaces the reference's
  full-sequence recompute per generated token (reference inference.py:97,
  :249 — the reference has no KV cache anywhere and even creates GPT-2
  with use_cache=False, train.py:192);
- numerics match HF's GPT2LMHeadModel in fp32 (gelu_new MLP, pre-LN,
  causal + additive padding mask, tied lm_head) — verified by
  tests/test_gpt2_parity.py against a randomly initialized torch model.

Layout conventions: linear weights are [in, out] (HF GPT-2's Conv1D
already stores [in, out], so import is copy-through); activations are
[B, T, D]; the KV cache is a dict of [L, B, maxT, H, Dh] arrays.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import GPT2Config
from ..ops.activations import gelu_new
from ..ops.attention import NEG_INF, dot_product_attention
from ..ops.layernorm import layer_norm
from ..ops.ring import paste_rows, refill_positions, ring_layout


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, maxT, H, Dh]
    v: jnp.ndarray  # [L, B, maxT, H, Dh]
    index: jnp.ndarray  # scalar int32: number of valid positions


def init(rng: jax.Array, cfg: GPT2Config, dtype=jnp.float32) -> dict:
    """GPT-2 init: N(0, 0.02) weights, zero biases, scaled residual projs."""
    d, v, p, l = cfg.n_embd, cfg.vocab_size, cfg.n_positions, cfg.n_layer
    keys = jax.random.split(rng, 8)
    std = 0.02
    resid_std = std / (2 * l) ** 0.5  # GPT-2 paper residual-proj scaling

    def norm(key, shape, s=std):
        return jax.random.normal(key, shape, dtype) * s

    blocks = {
        "ln1": {"g": jnp.ones((l, d), dtype), "b": jnp.zeros((l, d), dtype)},
        "attn": {
            "c_attn": {"w": norm(keys[0], (l, d, 3 * d)), "b": jnp.zeros((l, 3 * d), dtype)},
            "c_proj": {"w": norm(keys[1], (l, d, d), resid_std), "b": jnp.zeros((l, d), dtype)},
        },
        "ln2": {"g": jnp.ones((l, d), dtype), "b": jnp.zeros((l, d), dtype)},
        "mlp": {
            "c_fc": {"w": norm(keys[2], (l, d, 4 * d)), "b": jnp.zeros((l, 4 * d), dtype)},
            "c_proj": {"w": norm(keys[3], (l, 4 * d, d), resid_std), "b": jnp.zeros((l, d), dtype)},
        },
    }
    return {
        "wte": norm(keys[4], (v, d)),
        "wpe": norm(keys[5], (p, d)),
        "blocks": blocks,
        "ln_f": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }


def embed_tokens(params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
    """wte lookup — the reference's get_embedding_text (lms/GPT2.py:14)."""
    return params["wte"][tokens]


def embedding_size(params: dict) -> int:
    return params["wte"].shape[1]


def _block(x: jnp.ndarray, layer: dict, bias: jnp.ndarray, cfg: GPT2Config):
    """One pre-LN GPT-2 block (uncached path; the cached variant lives in
    _forward_cached with the carry-resident cache)."""
    b, t, d = x.shape
    h_heads, dh = cfg.n_head, d // cfg.n_head

    h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=cfg.layer_norm_epsilon)
    qkv = jnp.dot(h, layer["attn"]["c_attn"]["w"]) + layer["attn"]["c_attn"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h_heads, dh)
    k = k.reshape(b, t, h_heads, dh)
    v = v.reshape(b, t, h_heads, dh)

    attn = dot_product_attention(q, k, v, bias=bias).reshape(b, t, d)
    x = x + jnp.dot(attn, layer["attn"]["c_proj"]["w"]) + layer["attn"]["c_proj"]["b"]

    h = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"], eps=cfg.layer_norm_epsilon)
    h = jnp.dot(h, layer["mlp"]["c_fc"]["w"]) + layer["mlp"]["c_fc"]["b"]
    h = gelu_new(h)
    h = jnp.dot(h, layer["mlp"]["c_proj"]["w"]) + layer["mlp"]["c_proj"]["b"]
    return x + h


def apply(
    params: dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,  # [B, T, D]
    attention_mask: Optional[jnp.ndarray] = None,  # [B, T] 1=attend
    remat: bool = False,
    logits_slice: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Full training/eval forward over inputs_embeds -> logits [B, T, V].

    The uniform `call(inputs_embeds, attention_mask)` surface of the
    reference LM wrappers (lms/GPT2.py:17-19). Loss is computed by the
    caller (models/captioner.py), matching reference model.py:208-209.

    logits_slice=(start, stop): run the final LN + tied lm_head on
    positions [start, stop) only and return [B, stop-start, V]. The
    caption loss discards every position outside prefix_length-1:-1
    (reference model.py:208), so slicing before the head skips the
    dead fifth of its [*, D]x[D, 50257] matmul and logits memory.
    """
    b, t, d = inputs_embeds.shape
    positions = jnp.arange(t)
    x = inputs_embeds + params["wpe"][positions][None]

    qi = jnp.arange(t)[:, None]
    ki = jnp.arange(t)[None, :]
    bias = jnp.where(ki <= qi, 0.0, NEG_INF)[None, None]  # [1,1,T,T]
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
        bias = bias + pad

    body = functools.partial(_block, cfg=cfg)
    if remat:
        body = jax.checkpoint(body)

    def scan_fn(carry, layer):
        return body(carry, layer, bias), None

    x, _ = jax.lax.scan(scan_fn, x, params["blocks"])
    if logits_slice is not None:
        x = x[:, logits_slice[0] : logits_slice[1]]
    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], eps=cfg.layer_norm_epsilon)
    logits = jnp.dot(x, params["wte"].T)  # tied lm_head
    return logits


def init_cache(cfg: GPT2Config, batch: int, max_len: int, dtype=jnp.float32) -> KVCache:
    l, h, dh = cfg.n_layer, cfg.n_head, cfg.n_embd // cfg.n_head
    shape = (l, batch, max_len, h, dh)
    return KVCache(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype), index=jnp.zeros((), jnp.int32)
    )


def _forward_cached(
    params: dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,  # [B, T, D]
    cache: KVCache,
    fresh: bool = False,
    full_logits: bool = True,
    ring: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # (pos [B], start [B])
) -> Tuple[jnp.ndarray, KVCache]:
    """Shared prefill/step forward writing into the fixed-shape cache.

    TPU-critical layout: the FULL stacked cache rides in the layer-scan
    *carry* and each layer writes only its new [1,B,T,H,Dh] slab with
    dynamic_update_slice. Passing per-layer cache slices through scan
    xs/ys instead makes XLA accumulate a fresh cache (plus a ping-pong
    copy in the decode loop) — measured 1.6x slower and 2x the HBM for
    GPT2-XL decode.

    Static specializations (measured on GPT2-XL, B=256):
    - fresh=True (prefill from an empty cache): attention runs directly on
      this call's q/k/v with a [T,T] causal bias instead of reading the
      maxT-wide zero cache back — saves the full K/V cache read (~5.7 GB
      at maxT=72) plus the wider score matrix.
    - T==1 (decode): the query's length-1 axis is squeezed out of the
      score/weighted-sum contractions, avoiding degenerate [.., 1, maxT]
      MXU tiles.
    - full_logits=False: the tied lm_head runs on the LAST position only
      and returns [B, 1, V] — decode only ever consumes logits[:, -1]
      (a [B,40,50257] f32 logits tensor is 2 GB otherwise).

    (An attend_len narrowing of the KV read existed through r2 and was
    removed: XLA materializes the narrowed slice instead of fusing it —
    measured 12% slower end-to-end. See decode/engine.py NOTE.)
    """
    b, t, d = inputs_embeds.shape
    h_heads, dh = cfg.n_head, d // cfg.n_head
    a_len = cache.k.shape[2]
    idx = cache.index

    if ring is not None:
        if t != 1:
            raise ValueError("ring mode is decode-only (t == 1); refills prefill "
                             "a fresh small cache and scatter_refill it in")
        ring_pos, ring_start = ring
        wslot, ring_bias = ring_layout(idx, a_len, ring_start)
        # per-row logical positions: each serving slot is at its own point
        x = inputs_embeds + jnp.take(params["wpe"], ring_pos, axis=0)[
            :, None
        ].astype(inputs_embeds.dtype)
    else:
        wslot = idx
        positions = idx + jnp.arange(t)
        x = inputs_embeds + jnp.take(params["wpe"], positions, axis=0)[None].astype(
            inputs_embeds.dtype
        )

    if fresh and t > 1:
        # prefill bias over this call's keys only
        qi = jnp.arange(t)[:, None]
        ki = jnp.arange(t)[None, :]
        bias = jnp.where(ki <= qi, 0.0, NEG_INF)[None, None]  # [1,1,T,T]
    elif ring is not None:
        bias = ring_bias  # [B, a_len]
    else:
        # causal-over-cache bias: query at position idx+i attends keys <= it
        qpos = idx + jnp.arange(t)[:, None]  # [T, 1]
        kpos = jnp.arange(a_len)[None, :]  # [1, a_len]
        bias = jnp.where(kpos <= qpos, 0.0, NEG_INF)[None, None]  # [1,1,T,a_len]

    def scan_fn(carry, xs):
        x, k_cache, v_cache = carry
        layer, l = xs
        h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=cfg.layer_norm_epsilon)
        qkv = jnp.dot(h, layer["attn"]["c_attn"]["w"]) + layer["attn"]["c_attn"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h_heads, dh)
        k = k.reshape(b, t, h_heads, dh)
        v = v.reshape(b, t, h_heads, dh)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k[None].astype(k_cache.dtype), (l, 0, wslot, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v[None].astype(v_cache.dtype), (l, 0, wslot, 0, 0)
        )
        if fresh and t > 1:
            attn = dot_product_attention(q, k, v, bias=bias).reshape(b, t, d)
        elif t == 1:
            keys = jax.lax.dynamic_index_in_dim(k_cache, l, 0, keepdims=False)[:, :a_len]
            vals = jax.lax.dynamic_index_in_dim(v_cache, l, 0, keepdims=False)[:, :a_len]
            q1 = q[:, 0].astype(keys.dtype)  # [B, H, Dh]
            scores = jnp.einsum(
                "bhd,bthd->bht", q1, keys, preferred_element_type=jnp.float32
            ) * (dh**-0.5)
            step_bias = bias if ring is not None else bias[:, 0, 0, :]
            scores = scores + step_bias[:, None, :]
            w = jax.nn.softmax(scores, axis=-1).astype(vals.dtype)
            attn = jnp.einsum("bht,bthd->bhd", w, vals).reshape(b, 1, d)
        else:
            keys = jax.lax.dynamic_index_in_dim(k_cache, l, 0, keepdims=False)[:, :a_len]
            vals = jax.lax.dynamic_index_in_dim(v_cache, l, 0, keepdims=False)[:, :a_len]
            attn = dot_product_attention(q, keys, vals, bias=bias).reshape(b, t, d)
        attn = attn.astype(x.dtype)
        x = x + jnp.dot(attn, layer["attn"]["c_proj"]["w"]) + layer["attn"]["c_proj"]["b"]
        h = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"], eps=cfg.layer_norm_epsilon)
        h = jnp.dot(h, layer["mlp"]["c_fc"]["w"]) + layer["mlp"]["c_fc"]["b"]
        h = gelu_new(h)
        h = jnp.dot(h, layer["mlp"]["c_proj"]["w"]) + layer["mlp"]["c_proj"]["b"]
        return (x + h, k_cache, v_cache), None

    (x, new_k, new_v), _ = jax.lax.scan(
        scan_fn,
        (x, cache.k, cache.v),
        (params["blocks"], jnp.arange(cfg.n_layer)),
    )
    if not full_logits:
        x = x[:, -1:]
    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], eps=cfg.layer_norm_epsilon)
    logits = jnp.dot(x, params["wte"].T)
    return logits, KVCache(k=new_k, v=new_v, index=idx + t)


def prefill(
    params: dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,
    cache: KVCache,
    full_logits: bool = False,
) -> Tuple[jnp.ndarray, KVCache]:
    """Encode the prompt (prefix embeddings ‖ text embeds) into the cache.

    Requires a FRESH cache (index 0) — every decode path in the framework
    prefills exactly once. Returns (logits, cache); logits are [B, 1, V]
    (last position only) unless full_logits=True, since generation only
    consumes logits[:, -1]. Decode continues with decode_step.
    """
    return _forward_cached(
        params, cfg, inputs_embeds, cache, fresh=True, full_logits=full_logits
    )


def decode_step(
    params: dict,
    cfg: GPT2Config,
    token_embed: jnp.ndarray,
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """One autoregressive step: token_embed [B, 1, D] -> logits [B, V]."""
    logits, cache = _forward_cached(
        params, cfg, token_embed, cache, fresh=False, full_logits=False,
    )
    return logits[:, -1], cache


def decode_step_ring(
    params: dict,
    cfg: GPT2Config,
    token_embed: jnp.ndarray,  # [B, 1, D]
    cache: KVCache,
    pos: jnp.ndarray,  # [B] int32 logical position of this token in its request
    start: jnp.ndarray,  # [B] int32 global timestep of the row's window start
) -> Tuple[jnp.ndarray, KVCache]:
    """Ring-cache decode step for continuous batching (decode/serving.py).

    cache.index is the GLOBAL step counter; the slab write lands at
    index % maxT and row b attends exactly its own request's window
    [start[b], index] (see _ring_layout). Requires
    maxT >= prefix_len + max_new_tokens + 1: the write at `index`
    overwrites the entry from timestep index - maxT, which the
    longest-lived row still needs this step at equality.
    """
    logits, cache = _forward_cached(
        params, cfg, token_embed, cache, fresh=False, full_logits=False,
        ring=(pos, start),
    )
    return logits[:, -1], cache


def scatter_refill(
    cache: KVCache, small: KVCache, q: jnp.ndarray
) -> KVCache:
    """Write a freshly prefilled R-row small cache into the CONTIGUOUS
    ring-cache row block [q, q+R) (q traced, no wrap — serving retires
    slots FIFO and splits refills at the slot-ring boundary, so blocks
    stay contiguous and the write is pure dynamic_update_slice; see
    ops/ring.py paste_rows for why scattered slots are not viable).

    `small` comes from a standard prefill (init_cache(batch=R, max_len=P)
    + prefill) of the new requests' prefixes; its P entries claim global
    timesteps [index - P, index - 1], i.e. ring slots
    (index - P + i) % maxT — exactly the window _ring_layout grants a row
    with start = index - P.
    """
    rp = refill_positions(cache.index, small.k.shape[2], cache.k.shape[2])
    return KVCache(
        k=paste_rows(cache.k, small.k, q, rp, time_axis=2),
        v=paste_rows(cache.v, small.v, q, rp, time_axis=2),
        index=cache.index,
    )


# --------------------------------------------------------------------------
# int8 weight-streaming decode path
#
# Decode throughput on one chip is HBM-bound: each step streams every
# parameter (3.1 GB bf16 for GPT2-XL) plus the whole KV cache (5.7 GB bf16
# at B=256, maxT=72). Quantizing BOTH to int8 (per-output-channel weight
# scales; per-(batch,head,position) K/V scales; dynamic per-row activation
# scales) halves the stream and runs the matmuls int8xint8->int32 on the
# MXU. Measured: 16.9 -> ~11 ms/step on GPT2-XL.
#
# The attention dequantization trick: per-position K scales factor out of
# the scores AFTER the q@K^T int8 matmul (score_t *= s_q * s_k[t]); V
# scales fold INTO the softmax probabilities BEFORE the p@V matmul
# (p'_t = p_t * s_v[t], then p' is itself row-quantized). The int8 cache
# is head-major [L, B, H, maxT, Dh] so both contractions batch over (B,H).
#
# This replaces the reference's full-recompute decode loops
# (inference.py:97, :249) at the same API surface; `gpt2_int8` plugs into
# decode/engine via the lm/registry protocol.
# --------------------------------------------------------------------------

from ..ops.quant import int8_linear, quantize_rows, quantize_weight  # noqa: E402


class Int8KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, H, maxT, Dh] int8
    v: jnp.ndarray  # [L, B, H, maxT, Dh] int8
    ks: jnp.ndarray  # [L, B, H, maxT] f32 per-position K scales
    vs: jnp.ndarray  # [L, B, H, maxT] f32 per-position V scales
    index: jnp.ndarray  # scalar int32


def quantize_params(params: dict) -> dict:
    """bf16/f32 GPT-2 params -> int8 decode params.

    Matmul weights become {"q": int8, "s": f32[out]} (per-output-channel
    symmetric); embeddings, positional table, LN gains/biases stay bf16.
    The tied lm_head is stored pre-transposed ([D, V]) and quantized so the
    per-step vocab projection streams int8 too.
    """
    bf16 = jnp.bfloat16

    def qlin(leaf):
        return {"w": quantize_weight(leaf["w"]), "b": leaf["b"].astype(bf16)}

    blocks = params["blocks"]
    return {
        "wte": params["wte"].astype(bf16),
        "wpe": params["wpe"].astype(bf16),
        "blocks": {
            "ln1": jax.tree_util.tree_map(lambda a: a.astype(bf16), blocks["ln1"]),
            "ln2": jax.tree_util.tree_map(lambda a: a.astype(bf16), blocks["ln2"]),
            "attn": {
                "c_attn": qlin(blocks["attn"]["c_attn"]),
                "c_proj": qlin(blocks["attn"]["c_proj"]),
            },
            "mlp": {
                "c_fc": qlin(blocks["mlp"]["c_fc"]),
                "c_proj": qlin(blocks["mlp"]["c_proj"]),
            },
        },
        "ln_f": jax.tree_util.tree_map(lambda a: a.astype(bf16), params["ln_f"]),
        "lm_head": quantize_weight(params["wte"].T.astype(jnp.float32)),
    }


def init_cache_q8(cfg: GPT2Config, batch: int, max_len: int, dtype=None) -> Int8KVCache:
    """int8 KV cache (dtype arg accepted for protocol compat, ignored)."""
    l, h, dh = cfg.n_layer, cfg.n_head, cfg.n_embd // cfg.n_head
    return Int8KVCache(
        k=jnp.zeros((l, batch, h, max_len, dh), jnp.int8),
        v=jnp.zeros((l, batch, h, max_len, dh), jnp.int8),
        ks=jnp.zeros((l, batch, h, max_len), jnp.float32),
        vs=jnp.zeros((l, batch, h, max_len), jnp.float32),
        index=jnp.zeros((), jnp.int32),
    )


def _forward_cached_q8(
    params: dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,  # [B, T, D]
    cache: Int8KVCache,
    fresh: bool = False,
    full_logits: bool = False,
    ring: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # (pos [B], start [B])
) -> Tuple[jnp.ndarray, Int8KVCache]:
    b, t, d = inputs_embeds.shape
    h_heads, dh = cfg.n_head, d // cfg.n_head
    a_len = cache.k.shape[3]
    idx = cache.index
    eps = cfg.layer_norm_epsilon

    if ring is not None:
        if t != 1:
            raise ValueError("ring mode is decode-only (t == 1)")
        ring_pos, ring_start = ring
        wslot, step_bias = ring_layout(idx, a_len, ring_start)  # bias [B, T]
        x = inputs_embeds.astype(jnp.bfloat16) + jnp.take(
            params["wpe"], ring_pos, axis=0
        )[:, None]
    else:
        wslot = idx
        positions = idx + jnp.arange(t)
        x = inputs_embeds.astype(jnp.bfloat16) + jnp.take(
            params["wpe"], positions, axis=0
        )[None]

    if fresh and t > 1:
        qi = jnp.arange(t)[:, None]
        ki = jnp.arange(t)[None, :]
        prefill_bias = jnp.where(ki <= qi, 0.0, NEG_INF)[None, None]
    elif ring is None:
        kpos = jnp.arange(a_len)[None, :]
        step_bias = jnp.where(kpos <= idx + t - 1, 0.0, NEG_INF)  # [1, a_len]

    def scan_fn(carry, xs):
        x, kc, vc, ksc, vsc = carry
        layer, l = xs
        h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=eps)
        qkv = int8_linear(h, layer["attn"]["c_attn"]["w"], layer["attn"]["c_attn"]["b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h_heads, dh)
        k = k.reshape(b, t, h_heads, dh)
        v = v.reshape(b, t, h_heads, dh)

        # quantize new K/V per (b, t, h) over dh, store head-major
        k8, sk = quantize_rows(k)  # sk [B,T,H,1]
        v8, sv = quantize_rows(v)
        kc = jax.lax.dynamic_update_slice(
            kc, k8.transpose(0, 2, 1, 3)[None], (l, 0, 0, wslot, 0)
        )
        vc = jax.lax.dynamic_update_slice(
            vc, v8.transpose(0, 2, 1, 3)[None], (l, 0, 0, wslot, 0)
        )
        ksc = jax.lax.dynamic_update_slice(
            ksc, sk[..., 0].transpose(0, 2, 1)[None], (l, 0, 0, wslot)
        )
        vsc = jax.lax.dynamic_update_slice(
            vsc, sv[..., 0].transpose(0, 2, 1)[None], (l, 0, 0, wslot)
        )

        if fresh and t > 1:
            # prefill attention in bf16 on this call's q/k/v (exact shapes,
            # no cache readback); the cache holds the quantized copy
            attn = dot_product_attention(q, k, v, bias=prefill_bias).reshape(b, t, d)
        else:
            keys = jax.lax.dynamic_index_in_dim(kc, l, 0, keepdims=False)[:, :, :a_len]
            vals = jax.lax.dynamic_index_in_dim(vc, l, 0, keepdims=False)[:, :, :a_len]
            skt = jax.lax.dynamic_index_in_dim(ksc, l, 0, keepdims=False)[:, :, :a_len]
            svt = jax.lax.dynamic_index_in_dim(vsc, l, 0, keepdims=False)[:, :, :a_len]
            q8, sq = quantize_rows(q[:, 0])  # [B,H,Dh] int8, sq [B,H,1]
            scores = jax.lax.dot_general(
                q8, keys, (((2,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # [B,H,maxT]
            scores = scores * sq * skt * (dh**-0.5) + step_bias[:, None, :]
            p = jax.nn.softmax(scores, axis=-1)
            pv8, sp = quantize_rows(p * svt)  # fold V scales into the probs
            attn = jax.lax.dot_general(
                pv8, vals, (((2,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * sp  # [B,H,Dh]
            attn = attn.reshape(b, 1, d)
        attn = attn.astype(x.dtype)
        x = x + int8_linear(attn, layer["attn"]["c_proj"]["w"], layer["attn"]["c_proj"]["b"])
        h = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"], eps=eps)
        h = int8_linear(h, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"])
        h = gelu_new(h)
        h = int8_linear(h, layer["mlp"]["c_proj"]["w"], layer["mlp"]["c_proj"]["b"])
        return (x + h, kc, vc, ksc, vsc), None

    (x, kc, vc, ksc, vsc), _ = jax.lax.scan(
        scan_fn,
        (x, cache.k, cache.v, cache.ks, cache.vs),
        (params["blocks"], jnp.arange(cfg.n_layer)),
    )
    if not full_logits:
        x = x[:, -1:]
    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], eps=cfg.layer_norm_epsilon)
    logits = int8_linear(x, params["lm_head"], out_dtype=jnp.float32)
    return logits, Int8KVCache(k=kc, v=vc, ks=ksc, vs=vsc, index=idx + t)


def prefill_q8(
    params: dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,
    cache: Int8KVCache,
    full_logits: bool = False,
) -> Tuple[jnp.ndarray, Int8KVCache]:
    """int8-path prefill. Requires a fresh cache (index 0), like prefill()."""
    return _forward_cached_q8(
        params, cfg, inputs_embeds, cache, fresh=True, full_logits=full_logits
    )


def decode_step_q8(
    params: dict,
    cfg: GPT2Config,
    token_embed: jnp.ndarray,
    cache: Int8KVCache,
) -> Tuple[jnp.ndarray, Int8KVCache]:
    logits, cache = _forward_cached_q8(
        params, cfg, token_embed, cache
    )
    return logits[:, -1], cache


def decode_step_ring_q8(
    params: dict,
    cfg: GPT2Config,
    token_embed: jnp.ndarray,
    cache: Int8KVCache,
    pos: jnp.ndarray,  # [B] int32
    start: jnp.ndarray,  # [B] int32
) -> Tuple[jnp.ndarray, Int8KVCache]:
    """int8 ring-cache decode step — see decode_step_ring."""
    logits, cache = _forward_cached_q8(
        params, cfg, token_embed, cache, ring=(pos, start)
    )
    return logits[:, -1], cache


def scatter_refill_q8(
    cache: Int8KVCache, small: Int8KVCache, q: jnp.ndarray
) -> Int8KVCache:
    """int8 scatter_refill; the head-major layout puts time on axis 3."""
    rp = refill_positions(cache.index, small.k.shape[3], cache.k.shape[3])

    def put(big, sm):
        return paste_rows(big, sm, q, rp, time_axis=3)

    return Int8KVCache(
        k=put(cache.k, small.k), v=put(cache.v, small.v),
        ks=put(cache.ks, small.ks), vs=put(cache.vs, small.vs),
        index=cache.index,
    )


class Int8BeamCache(NamedTuple):
    """Shared-prefix batched-beam cache: prefill K/V stored ONCE PER IMAGE.

    All `beam` rows of an image share the prefill positions bit-for-bit
    (decode/beam.py expands one prefilled row per image and the reorder
    gather is block-diagonal), so the batched beam path keeps them in
    per-image slabs ([L, N, H, P, Dh]) that are never replicated,
    reordered, or re-streamed per beam row; each beam row carries only its
    generated tail. vs the beam-replicated full cache this divides the
    prefix's HBM (storage AND per-step attention stream) by beam_size and
    shrinks the per-step beam-reorder gather to the tail slabs — at
    GPT2-XL N=64 x beam=5 P=40 the replicated cache alone is 3.3 GB int8
    and its whole-cache reorder demanded 17 GB of gather temps (measured
    r4, CLAUDE.md).

    The tail slabs are stored FLAT and TIME-MAJOR ([L, R, NT*H*Dh], one
    H*Dh block per timestep) rather than as 5D arrays: the per-step beam
    reorder is then a plain row permutation of an array whose minor dim is
    a large multiple of 128 — measured 344 GB/s r+w as a gather, 540 GB/s
    as a one-hot int8 matmul, vs ~80 GB/s effective when the same bytes
    are gathered through a [L,R,H,NT,64] view (XLA inserts 2x-padded
    tiled relayout copies around the reshape; r4 probes, CLAUDE.md). The
    attention dots consume a bitcast [R, NT, H, Dh] view directly — reads
    fused into dots never pay the padding, only materialized copies do.

    Row-count ceiling (measured r5, CLAUDE.md "Beam N=128 regression"):
    decode_step_beam_q8 is linear to ~R=480 rows, then XLA layout
    assignment flips the in-loop activation chain to batch-minor and the
    step lands ~2.6x off linear by R=640 — robust to every structural
    ablation tried (prefix dots/stream, tail write, slab orientation,
    2D activations). Keep N*beam <= ~480 per executable (bench pins
    N=64 x beam=5, which is at the 5-rows-per-caption engine roofline).
    """

    pk: jnp.ndarray  # [L, N, H, P, Dh] int8 prefix keys (per image)
    pv: jnp.ndarray  # [L, N, H, P, Dh] int8
    pks: jnp.ndarray  # [L, N, H, P] f32 prefix K scales
    pvs: jnp.ndarray  # [L, N, H, P] f32 prefix V scales
    k: jnp.ndarray  # [L, N*beam, NT*H*Dh] int8 tail keys (per beam row)
    v: jnp.ndarray  # [L, N*beam, NT*H*Dh] int8
    ks: jnp.ndarray  # [L, N*beam, NT*H] f32
    vs: jnp.ndarray  # [L, N*beam, NT*H] f32
    index: jnp.ndarray  # scalar int32: GLOBAL position (prefix included)


def beam_prefix_cache_q8(
    cfg: GPT2Config, cache: Int8KVCache, beam: int, p_len: int
) -> Int8BeamCache:
    """Split a batch-N prefilled Int8KVCache (index == p_len) into the
    shared-prefix beam cache: prefix slabs are the prefill's own bytes
    (static slice — p_len is the static prompt length), tails start empty
    at N*beam rows."""
    l, n, h, maxt, dh = cache.k.shape
    nt = maxt - p_len
    return Int8BeamCache(
        pk=cache.k[:, :, :, :p_len],
        pv=cache.v[:, :, :, :p_len],
        pks=cache.ks[:, :, :, :p_len],
        pvs=cache.vs[:, :, :, :p_len],
        k=jnp.zeros((l, n * beam, nt * h * dh), jnp.int8),
        v=jnp.zeros((l, n * beam, nt * h * dh), jnp.int8),
        ks=jnp.zeros((l, n * beam, nt * h), jnp.float32),
        vs=jnp.zeros((l, n * beam, nt * h), jnp.float32),
        index=cache.index,
    )


def decode_step_beam_q8(
    params: dict,
    cfg: GPT2Config,
    token_embed: jnp.ndarray,  # [N*beam, 1, D]
    bc: Int8BeamCache,
) -> Tuple[jnp.ndarray, Int8BeamCache]:
    """One beam decode step over the shared-prefix cache.

    BITWISE-identical logits to decode_step_q8 on the equivalent
    beam-replicated full cache, by construction: the prefix K/V bytes and
    scales are the prefill's own, scores over [prefix | tail] concatenate
    to the same [*, maxT] vector the full path softmaxes, and the
    softmax·V int8 dot uses ONE quantization scale shared across both
    segments — int8 dots accumulate exactly in int32, and the partial sums
    (<= 127*127*maxT << 2^24) convert to f32 exactly, so splitting the dot
    at the segment boundary is associativity-free. The only structural
    change is WHERE the prefix operand lives: per image, contracted with a
    grouped dot_general ([N, H, beam, Dh] x [N, H, P, Dh] over batch dims
    (N, H)) instead of per row.
    """
    b, t, d = token_embed.shape
    h_heads, dh = cfg.n_head, d // cfg.n_head
    p_len = bc.pk.shape[3]
    n_img = bc.pk.shape[1]
    beam = b // n_img
    nt = bc.k.shape[2] // (h_heads * dh)
    idx = bc.index
    wslot = idx - p_len
    eps = cfg.layer_norm_epsilon

    x = token_embed.astype(jnp.bfloat16) + jnp.take(
        params["wpe"], idx + jnp.arange(t), axis=0
    )[None]
    tail_bias = jnp.where(jnp.arange(nt)[None, :] <= wslot, 0.0, NEG_INF)

    def group(a):  # [N*beam, H, X] -> [N, H, beam, X]
        return a.reshape(n_img, beam, h_heads, -1).transpose(0, 2, 1, 3)

    def ungroup(a):  # [N, H, beam, X] -> [N*beam, H, X]
        return a.transpose(0, 2, 1, 3).reshape(b, h_heads, -1)

    def scan_fn(carry, xs):
        x, kc, vc, ksc, vsc = carry
        layer, pk, pv, pks, pvs, l = xs
        h = layer_norm(x, layer["ln1"]["g"], layer["ln1"]["b"], eps=eps)
        qkv = int8_linear(h, layer["attn"]["c_attn"]["w"], layer["attn"]["c_attn"]["b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h_heads, dh)
        k = k.reshape(b, t, h_heads, dh)
        v = v.reshape(b, t, h_heads, dh)

        k8, sk = quantize_rows(k)
        v8, sv = quantize_rows(v)
        # time-major flat tail write: one [R, H*Dh] block at offset
        # wslot*H*Dh (the h-major layout within a timestep is what k8's
        # own [b, h, dh] layout already is — no transpose)
        kc = jax.lax.dynamic_update_slice(
            kc, k8.reshape(b, h_heads * dh)[None], (l, 0, wslot * h_heads * dh)
        )
        vc = jax.lax.dynamic_update_slice(
            vc, v8.reshape(b, h_heads * dh)[None], (l, 0, wslot * h_heads * dh)
        )
        ksc = jax.lax.dynamic_update_slice(
            ksc, sk[:, 0, :, 0][None], (l, 0, wslot * h_heads)
        )
        vsc = jax.lax.dynamic_update_slice(
            vsc, sv[:, 0, :, 0][None], (l, 0, wslot * h_heads)
        )

        # bitcast views for the attention dots (time-major: [R, NT, H, *])
        keys = jax.lax.dynamic_index_in_dim(
            kc, l, 0, keepdims=False).reshape(b, nt, h_heads, dh)
        vals = jax.lax.dynamic_index_in_dim(
            vc, l, 0, keepdims=False).reshape(b, nt, h_heads, dh)
        skt = jax.lax.dynamic_index_in_dim(
            ksc, l, 0, keepdims=False).reshape(b, nt, h_heads).transpose(0, 2, 1)
        svt = jax.lax.dynamic_index_in_dim(
            vsc, l, 0, keepdims=False).reshape(b, nt, h_heads).transpose(0, 2, 1)

        q8, sq = quantize_rows(q[:, 0])  # [N*beam, H, Dh], sq [.., 1]
        s_pre = jax.lax.dot_general(
            group(q8), pk, (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [N, H, beam, P]
        s_pre = s_pre * group(sq) * pks[:, :, None, :] * (dh**-0.5)
        s_tail = jax.lax.dot_general(
            q8, keys, (((2,), (3,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [N*beam, H, NT]
        s_tail = s_tail * sq * skt * (dh**-0.5) + tail_bias[:, None, :]
        p = jax.nn.softmax(
            jnp.concatenate([ungroup(s_pre), s_tail], axis=-1), axis=-1
        )  # [N*beam, H, P+NT]

        # fold V scales in, then quantize BOTH segments with one shared
        # per-(row, head) scale — this is what keeps the split bitwise
        # equal to quantize_rows over the full concatenated row
        pre = p[:, :, :p_len] * ungroup(
            jnp.broadcast_to(
                pvs[:, :, None, :], (n_img, h_heads, beam, p_len)
            )
        )
        tail = p[:, :, p_len:] * svt
        m = jnp.maximum(
            jnp.max(jnp.abs(pre), axis=-1, keepdims=True),
            jnp.max(jnp.abs(tail), axis=-1, keepdims=True),
        )
        sp = jnp.maximum(m / 127.0, 1e-12)
        p8_pre = jnp.clip(jnp.round(pre / sp), -127, 127).astype(jnp.int8)
        p8_tail = jnp.clip(jnp.round(tail / sp), -127, 127).astype(jnp.int8)
        a_pre = jax.lax.dot_general(
            group(p8_pre), pv, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32,
        )  # [N, H, beam, Dh] int32 (exact)
        a_tail = jax.lax.dot_general(
            p8_tail, vals, (((2,), (1,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.int32,
        )  # [N*beam, H, Dh] int32 (exact)
        attn = (
            ungroup(a_pre).astype(jnp.float32) + a_tail.astype(jnp.float32)
        ) * sp
        attn = attn.reshape(b, 1, d).astype(x.dtype)

        x = x + int8_linear(attn, layer["attn"]["c_proj"]["w"], layer["attn"]["c_proj"]["b"])
        h = layer_norm(x, layer["ln2"]["g"], layer["ln2"]["b"], eps=eps)
        h = int8_linear(h, layer["mlp"]["c_fc"]["w"], layer["mlp"]["c_fc"]["b"])
        h = gelu_new(h)
        h = int8_linear(h, layer["mlp"]["c_proj"]["w"], layer["mlp"]["c_proj"]["b"])
        return (x + h, kc, vc, ksc, vsc), None

    (x, kc, vc, ksc, vsc), _ = jax.lax.scan(
        scan_fn,
        (x, bc.k, bc.v, bc.ks, bc.vs),
        (params["blocks"], bc.pk, bc.pv, bc.pks, bc.pvs,
         jnp.arange(cfg.n_layer)),
    )
    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], eps=cfg.layer_norm_epsilon)
    logits = int8_linear(x, params["lm_head"], out_dtype=jnp.float32)
    return logits[:, -1], bc._replace(k=kc, v=vc, ks=ksc, vs=vsc, index=idx + t)


def reorder_beam_tail_q8(
    bc: Int8BeamCache, global_source: jnp.ndarray
) -> Int8BeamCache:
    """Beam-reorder ONLY the tail slabs' row axis (prefix slabs are
    per-image and beam-invariant), as a ONE-HOT MATMUL on the flat
    time-major slabs: a permutation matmul is bitwise exact (each output
    element is a sum with exactly one nonzero term; the int8 dot
    accumulates in int32, the f32 dot's 1.0/0.0 products are exact) and
    the MXU streams it at ~540 GB/s r+w vs ~344 GB/s for the row gather
    and ~80 GB/s for a gather through the padded 5D view (r4 probes,
    CLAUDE.md)."""
    r = bc.k.shape[1]
    oh8 = (global_source[:, None] == jnp.arange(r)[None, :]).astype(jnp.int8)
    ohf = oh8.astype(jnp.float32)

    def perm_q8(a):
        return jnp.einsum(
            "nr,lrf->lnf", oh8, a, preferred_element_type=jnp.int32
        ).astype(jnp.int8)

    def perm_f32(a):
        return jnp.einsum("nr,lrf->lnf", ohf, a)

    return bc._replace(
        k=perm_q8(bc.k), v=perm_q8(bc.v),
        ks=perm_f32(bc.ks), vs=perm_f32(bc.vs),
    )


class _Int8Module:
    """lm/registry-protocol adapter for the int8 decode path.

    Use `gpt2.quantize_params(params)` once, then pass `gpt2.gpt2_int8` as
    the engine's lm module with the quantized params.
    """

    takes_token_ids = False
    init_cache = staticmethod(init_cache_q8)
    prefill = staticmethod(prefill_q8)
    decode_step = staticmethod(decode_step_q8)
    decode_step_ring = staticmethod(decode_step_ring_q8)
    scatter_refill = staticmethod(scatter_refill_q8)
    embed_tokens = staticmethod(embed_tokens)
    embedding_size = staticmethod(embedding_size)
    # shared-prefix batched beam (decode/beam.py uses these when present)
    beam_prefix_cache = staticmethod(beam_prefix_cache_q8)
    decode_step_beam = staticmethod(decode_step_beam_q8)
    reorder_beam_tail = staticmethod(reorder_beam_tail_q8)


gpt2_int8 = _Int8Module()
