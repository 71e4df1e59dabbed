"""T5 / T0 encoder-decoder (RMSNorm, relative-position buckets).

Capability-equivalent of the reference's T0 wrapper (lms/T0.py:6-20,
default bigscience/T0pp). The reference's `call` feeds the projected
prefix embeddings to BOTH the encoder and the decoder
(`decoder_inputs_embeds=inputs_embeds`, lms/T0.py:19) — `apply` here
reproduces exactly that contract, and the cached decode path encodes the
prompt once (prefill) then extends only the decoder with cached self-attn
K/V and precomputed cross-attn K/V (the reference recomputes the entire
encoder+decoder per generated token).

Numerics match HF T5ForConditionalGeneration in fp32
(tests/test_t5_parity.py): unscaled attention (T5 bakes the scale into
init), relative-attention bias only from layer 0's embedding table
(shared by all layers of a stack), RMSNorm with pre-scaling cast, and the
d_model**-0.5 logit rescale when embeddings are tied.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import T5Config
from ..ops.activations import gelu_new
from ..ops.attention import NEG_INF
from ..ops.ring import (paste_rows, paste_rows_axis0, refill_positions,
                        ring_layout, ring_timesteps)
from ..ops.layernorm import rms_norm
from ..ops.quant import linear


# ---------------------------------------------------------------------------
# relative position buckets (HF T5Attention._relative_position_bucket)
# ---------------------------------------------------------------------------


def _relative_position_bucket(rel_pos, bidirectional: bool, num_buckets: int, max_distance: int):
    ret = jnp.zeros_like(rel_pos)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (rel_pos > 0).astype(jnp.int32) * num_buckets
        rel_pos = jnp.abs(rel_pos)
    else:
        rel_pos = -jnp.minimum(rel_pos, 0)
    max_exact = num_buckets // 2
    is_small = rel_pos < max_exact
    # guard log(0) for the is_small rows (discarded by the where below);
    # values >= max_exact are untouched, so the bucket matches HF exactly
    safe_rel = jnp.maximum(rel_pos, 1).astype(jnp.float32)
    rel_large = max_exact + (
        jnp.log(safe_rel / max_exact)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rel_large = jnp.minimum(rel_large, num_buckets - 1)
    return ret + jnp.where(is_small, rel_pos, rel_large)


def _position_bias(rel_table, qpos, kpos, bidirectional: bool, cfg: T5Config):
    """rel_table [num_buckets, H]; qpos [Tq], kpos [Tk] -> bias [1, H, Tq, Tk]."""
    rel = kpos[None, :] - qpos[:, None]
    buckets = _relative_position_bucket(
        rel, bidirectional, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    bias = rel_table[buckets]  # [Tq, Tk, H]
    return bias.transpose(2, 0, 1)[None]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _attn_init(key, d_model, inner, dtype):
    ks = jax.random.split(key, 4)

    def n(k, shape, s):
        return jax.random.normal(k, shape, dtype) * s

    return {
        "wq": n(ks[0], (d_model, inner), (d_model * inner) ** -0.25),
        "wk": n(ks[1], (d_model, inner), d_model**-0.5),
        "wv": n(ks[2], (d_model, inner), d_model**-0.5),
        "wo": n(ks[3], (inner, d_model), inner**-0.5),
    }


def _mlp_init(key, cfg: T5Config, dtype):
    ks = jax.random.split(key, 3)
    d, f = cfg.d_model, cfg.d_ff

    def n(k, shape, s):
        return jax.random.normal(k, shape, dtype) * s

    p = {"wi_0": n(ks[0], (d, f), d**-0.5), "wo": n(ks[2], (f, d), f**-0.5)}
    if cfg.feed_forward_proj == "gated-gelu":
        p["wi_1"] = n(ks[1], (d, f), d**-0.5)
    return p


def init(rng: jax.Array, cfg: T5Config, dtype=jnp.float32) -> dict:
    inner = cfg.num_heads * cfg.d_kv
    d = cfg.d_model
    keys = jax.random.split(rng, 8)

    def stack_layers(key, n, make):
        layers = [make(k) for k in jax.random.split(key, n)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

    def enc_layer(k):
        k1, k2 = jax.random.split(k)
        return {
            "ln1": {"g": jnp.ones((d,), dtype)},
            "attn": _attn_init(k1, d, inner, dtype),
            "ln2": {"g": jnp.ones((d,), dtype)},
            "mlp": _mlp_init(k2, cfg, dtype),
        }

    def dec_layer(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "ln1": {"g": jnp.ones((d,), dtype)},
            "self_attn": _attn_init(k1, d, inner, dtype),
            "ln2": {"g": jnp.ones((d,), dtype)},
            "cross_attn": _attn_init(k2, d, inner, dtype),
            "ln3": {"g": jnp.ones((d,), dtype)},
            "mlp": _mlp_init(k3, cfg, dtype),
        }

    params = {
        "shared": jax.random.normal(keys[0], (cfg.vocab_size, d), dtype),
        "encoder": {
            "blocks": stack_layers(keys[1], cfg.num_layers, enc_layer),
            "rel_bias": jax.random.normal(
                keys[2], (cfg.relative_attention_num_buckets, cfg.num_heads), dtype
            ) * (d // cfg.num_heads) ** -0.5,
            "ln_f": {"g": jnp.ones((d,), dtype)},
        },
        "decoder": {
            "blocks": stack_layers(keys[3], cfg.num_decoder_layers, dec_layer),
            "rel_bias": jax.random.normal(
                keys[4], (cfg.relative_attention_num_buckets, cfg.num_heads), dtype
            ) * (d // cfg.num_heads) ** -0.5,
            "ln_f": {"g": jnp.ones((d,), dtype)},
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": jax.random.normal(keys[5], (d, cfg.vocab_size), dtype) * d**-0.5}
    return params


def embed_tokens(params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
    return params["shared"][tokens]


def embedding_size(params: dict) -> int:
    return params["shared"].shape[1]


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------


def _attend(h_q, h_kv, attn, num_heads: int, d_kv: int, bias):
    """Unscaled T5 attention. h_q [B,Tq,D], h_kv [B,Tk,D], bias [.,H,Tq,Tk]."""
    b, tq, _ = h_q.shape
    tk = h_kv.shape[1]
    q = linear(h_q, attn["wq"]).reshape(b, tq, num_heads, d_kv)
    k = linear(h_kv, attn["wk"]).reshape(b, tk, num_heads, d_kv)
    v = linear(h_kv, attn["wv"]).reshape(b, tk, num_heads, d_kv)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, tq, num_heads * d_kv)
    return linear(out, attn["wo"])


def _mlp(h, mlp, cfg: T5Config):
    if cfg.feed_forward_proj == "gated-gelu":
        gate = gelu_new(linear(h, mlp["wi_0"]))
        h = gate * linear(h, mlp["wi_1"])
    else:
        h = jax.nn.relu(linear(h, mlp["wi_0"]))
    return linear(h, mlp["wo"])


def _encode(params, cfg: T5Config, embeds, attention_mask):
    b, t, d = embeds.shape
    pos = jnp.arange(t)
    bias = _position_bias(params["encoder"]["rel_bias"], pos, pos, True, cfg)
    if attention_mask is not None:
        bias = bias + jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)

    def body(x, layer):
        h = rms_norm(x, layer["ln1"]["g"], eps=cfg.layer_norm_epsilon)
        x = x + _attend(h, h, layer["attn"], cfg.num_heads, cfg.d_kv, bias)
        h = rms_norm(x, layer["ln2"]["g"], eps=cfg.layer_norm_epsilon)
        x = x + _mlp(h, layer["mlp"], cfg)
        return x, None

    x, _ = jax.lax.scan(body, embeds, params["encoder"]["blocks"])
    return rms_norm(x, params["encoder"]["ln_f"]["g"], eps=cfg.layer_norm_epsilon)


def _decode_stack(params, cfg, dec_embeds, enc_hidden, enc_mask, self_bias, cross_bias):
    def body(x, layer):
        h = rms_norm(x, layer["ln1"]["g"], eps=cfg.layer_norm_epsilon)
        x = x + _attend(h, h, layer["self_attn"], cfg.num_heads, cfg.d_kv, self_bias)
        h = rms_norm(x, layer["ln2"]["g"], eps=cfg.layer_norm_epsilon)
        x = x + _attend(h, enc_hidden, layer["cross_attn"], cfg.num_heads, cfg.d_kv, cross_bias)
        h = rms_norm(x, layer["ln3"]["g"], eps=cfg.layer_norm_epsilon)
        x = x + _mlp(h, layer["mlp"], cfg)
        return x, None

    x, _ = jax.lax.scan(body, dec_embeds, params["decoder"]["blocks"])
    return rms_norm(x, params["decoder"]["ln_f"]["g"], eps=cfg.layer_norm_epsilon)


def _lm_logits(params, cfg: T5Config, x):
    if cfg.tie_word_embeddings:
        x = x * (cfg.d_model**-0.5)
        return jnp.dot(x, params["shared"].T)
    return linear(x, params["lm_head"]["w"])


def apply(
    params: dict,
    cfg: T5Config,
    inputs_embeds: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    decoder_inputs_embeds: Optional[jnp.ndarray] = None,
    remat: bool = False,
    logits_slice=None,
) -> jnp.ndarray:
    """The reference T0 `call` contract (lms/T0.py:19): the same embeds go
    to encoder and decoder unless decoder_inputs_embeds is given."""
    if decoder_inputs_embeds is None:
        decoder_inputs_embeds = inputs_embeds
    enc_hidden = _encode(params, cfg, inputs_embeds, attention_mask)

    t = decoder_inputs_embeds.shape[1]
    pos = jnp.arange(t)
    self_bias = _position_bias(params["decoder"]["rel_bias"], pos, pos, False, cfg)
    causal = jnp.where(pos[None, :] <= pos[:, None], 0.0, NEG_INF)[None, None]
    self_bias = self_bias + causal
    cross_bias = None
    if attention_mask is not None:
        cross_bias = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)

    x = _decode_stack(params, cfg, decoder_inputs_embeds, enc_hidden,
                      attention_mask, self_bias, cross_bias)
    if logits_slice is not None:
        # head on the loss-relevant positions only (see gpt2.apply)
        x = x[:, logits_slice[0] : logits_slice[1]]
    return _lm_logits(params, cfg, x)


# ---------------------------------------------------------------------------
# cached decode (encoder runs once; decoder self-attn KV cached)
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, maxT, H, Dkv] decoder self-attn keys
    v: jnp.ndarray
    enc_hidden: jnp.ndarray  # [B, Te, D]
    enc_bias: Optional[jnp.ndarray]  # [B, 1, 1, Te] cross-attn mask or None
    index: jnp.ndarray


def init_cache(cfg: T5Config, batch: int, max_len: int, dtype=jnp.float32) -> KVCache:
    l, h, dkv = cfg.num_decoder_layers, cfg.num_heads, cfg.d_kv
    shape = (l, batch, max_len, h, dkv)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        enc_hidden=jnp.zeros((batch, 1, cfg.d_model), dtype),  # filled by prefill
        enc_bias=None,
        index=jnp.zeros((), jnp.int32),
    )


def _decoder_cached(params, cfg: T5Config, dec_embeds, cache: KVCache,
                    ring=None):
    b, t, d = dec_embeds.shape
    a_len = cache.k.shape[2]
    idx = cache.index

    if ring is not None:  # continuous batching (decode/serving.py)
        if t != 1:
            raise ValueError("ring mode is decode-only (t == 1)")
        ring_pos, ring_start = ring
        wslot, window = ring_layout(idx, a_len, ring_start)  # window [B, T]
        # per-row relative positions: ring position p holds the key of the
        # row's logical position gp[p] - start[b]; the query sits at
        # pos[b]. Out-of-window positions get garbage distances, but the
        # window mask zeroes them before the softmax either way.
        gp = ring_timesteps(idx, a_len)
        rel = (gp[None, :] - ring_start[:, None]) - ring_pos[:, None]  # [B, T]
        buckets = _relative_position_bucket(
            rel, False, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        bias = params["decoder"]["rel_bias"][buckets]  # [B, T, H]
        self_bias = (bias.transpose(0, 2, 1)[:, :, None, :]
                     + window[:, None, None, :])  # [B, H, 1, T]
    else:
        wslot = idx
        qpos = idx + jnp.arange(t)
        kpos = jnp.arange(a_len)
        self_bias = _position_bias(params["decoder"]["rel_bias"], qpos, kpos, False, cfg)
        causal = jnp.where(kpos[None, :] <= qpos[:, None], 0.0, NEG_INF)[None, None]
        self_bias = self_bias + causal

    # cache rides in the scan carry with in-place slab writes — see
    # models/gpt2.py:_forward_cached for the layout rationale
    def body(carry, xs):
        x, k_cache, v_cache = carry
        layer, l = xs
        h = rms_norm(x, layer["ln1"]["g"], eps=cfg.layer_norm_epsilon)
        q = linear(h, layer["self_attn"]["wq"]).reshape(b, t, cfg.num_heads, cfg.d_kv)
        k = linear(h, layer["self_attn"]["wk"]).reshape(b, t, cfg.num_heads, cfg.d_kv)
        v = linear(h, layer["self_attn"]["wv"]).reshape(b, t, cfg.num_heads, cfg.d_kv)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k[None].astype(k_cache.dtype), (l, 0, wslot, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v[None].astype(v_cache.dtype), (l, 0, wslot, 0, 0)
        )
        keys = jax.lax.dynamic_index_in_dim(k_cache, l, 0, keepdims=False)[:, :a_len]
        vals = jax.lax.dynamic_index_in_dim(v_cache, l, 0, keepdims=False)[:, :a_len]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, keys, preferred_element_type=jnp.float32)
        logits = logits + self_bias.astype(jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(vals.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, vals).reshape(b, t, -1)
        x = x + linear(attn, layer["self_attn"]["wo"])

        h = rms_norm(x, layer["ln2"]["g"], eps=cfg.layer_norm_epsilon)
        x = x + _attend(h, cache.enc_hidden, layer["cross_attn"], cfg.num_heads,
                        cfg.d_kv, cache.enc_bias)
        h = rms_norm(x, layer["ln3"]["g"], eps=cfg.layer_norm_epsilon)
        x = x + _mlp(h, layer["mlp"], cfg)
        return (x, k_cache, v_cache), None

    (x, new_k, new_v), _ = jax.lax.scan(
        body,
        (dec_embeds, cache.k, cache.v),
        (params["decoder"]["blocks"], jnp.arange(cfg.num_decoder_layers)),
    )
    x = rms_norm(x, params["decoder"]["ln_f"]["g"], eps=cfg.layer_norm_epsilon)
    logits = _lm_logits(params, cfg, x)
    return logits, KVCache(new_k, new_v, cache.enc_hidden, cache.enc_bias, idx + t)


def prefill(params, cfg: T5Config, inputs_embeds, cache: KVCache,
            attention_mask: Optional[jnp.ndarray] = None):
    """Encode the prompt once and run it as the decoder prefix (the
    reference's both-sides contract), writing decoder self-attn KV."""
    enc_hidden = _encode(params, cfg, inputs_embeds, attention_mask)
    enc_bias = None
    if attention_mask is not None:
        enc_bias = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
    cache = cache._replace(enc_hidden=enc_hidden, enc_bias=enc_bias)
    return _decoder_cached(params, cfg, inputs_embeds, cache)


def decode_step(params, cfg: T5Config, token_embed, cache: KVCache):
    logits, cache = _decoder_cached(params, cfg, token_embed, cache)
    return logits[:, -1], cache


def decode_step_ring(params, cfg: T5Config, token_embed, cache: KVCache,
                     pos, start):
    """Ring-cache decode step for continuous batching — see
    models/gpt2.py decode_step_ring; the relative-position bias is
    computed per row from the ring timesteps (ops/ring.ring_timesteps)."""
    logits, cache = _decoder_cached(params, cfg, token_embed, cache,
                                    ring=(pos, start))
    return logits[:, -1], cache


def scatter_refill(cache: KVCache, small: KVCache, q) -> KVCache:
    """Write a freshly prefilled R-row small cache into the contiguous
    ring-cache row block [q, q+R) (see models/gpt2.py scatter_refill for
    the window/contiguity contract).

    Beyond the self-attention K/V slabs, the per-request encoder output
    swaps in by a contiguous row paste: cross-attention reads
    enc_hidden[b] directly, nothing rides the ring. Serving prefixes
    carry no attention mask (enc_bias None)."""
    if cache.enc_bias is not None or small.enc_bias is not None:
        raise ValueError("serving refill does not support enc_bias "
                         "(masked encoder prompts)")
    rp = refill_positions(cache.index, small.k.shape[2], cache.k.shape[2])
    return KVCache(
        k=paste_rows(cache.k, small.k, q, rp, time_axis=2),
        v=paste_rows(cache.v, small.v, q, rp, time_axis=2),
        enc_hidden=paste_rows_axis0(cache.enc_hidden, small.enc_hidden, q),
        enc_bias=None,
        index=cache.index,
    )


def quantize_params(params: dict) -> dict:
    """bf16/f32 T5 params -> int8 decode params (ops.quant.linear dispatch).

    Attention projections and MLP weights quantize per-output-channel;
    the shared embedding table, relative-bias tables and RMSNorm scales
    stay dense. Beyond halving the per-token weight stream, this is what
    lets a T0-11B-class checkpoint FIT a single 16 GB chip at all
    (22 GB bf16 -> ~11 GB int8). With tied embeddings the lm_head stays
    the dense shared-table transpose (it is the embedding lookup table).
    """
    from ..ops.quant import quantize_weight

    def attn(a):
        return {k: quantize_weight(a[k]) for k in ("wq", "wk", "wv", "wo")}

    def mlp(m):
        out = {k: quantize_weight(m[k]) for k in m if k.startswith("wi") or k == "wo"}
        return out

    def stack(blocks, names):
        out = {}
        for name, sub in blocks.items():
            if name in ("ln1", "ln2", "ln3"):
                out[name] = sub
            elif name in ("attn", "self_attn", "cross_attn"):
                out[name] = attn(sub)
            elif name == "mlp":
                out[name] = mlp(sub)
            else:
                raise ValueError(f"unexpected t5 block entry {name!r}")
        return out

    q = {
        "shared": params["shared"],
        "encoder": {
            "blocks": stack(params["encoder"]["blocks"], None),
            "rel_bias": params["encoder"]["rel_bias"],
            "ln_f": params["encoder"]["ln_f"],
        },
        "decoder": {
            "blocks": stack(params["decoder"]["blocks"], None),
            "rel_bias": params["decoder"]["rel_bias"],
            "ln_f": params["decoder"]["ln_f"],
        },
    }
    if "lm_head" in params:
        q["lm_head"] = {"w": quantize_weight(params["lm_head"]["w"])}
    return q
