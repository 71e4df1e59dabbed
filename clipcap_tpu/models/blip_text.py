"""BLIP's BERT-style text model: decoder (caption sampling) + encoder
(ITM/ITC ranking), with cross-attention to image features.

Capability-equivalent of the non-vendored BLIP text stack the reference
drives in Gen B: `blip_model.text_decoder` in the batched heterogeneous
sampler (reference sampling.py:166-279, :283-326) and the ITM/ITC text
encoder used for ranking (reference sampling.py:40-62). Post-LN BERT
blocks (LayerNorm after each residual, eps 1e-12), learned absolute
positions applied at the embedding layer, gelu MLP, optional per-layer
cross-attention whose K/V come from the ViT tokens, and an MLM-style LM
head. Numerics match HF's BlipTextLMHeadModel in fp32
(tests/test_blip_text_parity.py).

For KV-cached generation use `decoder_lm(...)`, which closes over the
image features and exposes the framework LM protocol (lm/registry.py) so
decode/engine.py and decode/hetero.py drive BLIP exactly like GPT-2.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import BlipTextConfig
from ..ops.activations import gelu_exact
from ..ops.attention import NEG_INF
from ..ops.layernorm import layer_norm
from ..ops.ring import paste_rows, refill_positions, ring_layout
from ..ops.quant import linear


def init(rng: jax.Array, cfg: BlipTextConfig, dtype=jnp.float32) -> dict:
    d, l, f = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    ew = cfg.encoder_width
    keys = jax.random.split(rng, 12)
    std = 0.02

    def n(key, shape, s=std):
        return jax.random.normal(key, shape, dtype) * s

    def attn(key, kv_width):
        ks = jax.random.split(key, 4)
        return {
            "wq": n(ks[0], (l, d, d)), "bq": jnp.zeros((l, d), dtype),
            "wk": n(ks[1], (l, kv_width, d)), "bk": jnp.zeros((l, d), dtype),
            "wv": n(ks[2], (l, kv_width, d)), "bv": jnp.zeros((l, d), dtype),
            "wo": n(ks[3], (l, d, d)), "bo": jnp.zeros((l, d), dtype),
            "ln": {"g": jnp.ones((l, d), dtype), "b": jnp.zeros((l, d), dtype)},
        }

    blocks = {
        "self": attn(keys[0], d),
        "cross": attn(keys[1], ew),
        "mlp": {
            "w1": n(keys[2], (l, d, f)), "b1": jnp.zeros((l, f), dtype),
            "w2": n(keys[3], (l, f, d)), "b2": jnp.zeros((l, d), dtype),
            "ln": {"g": jnp.ones((l, d), dtype), "b": jnp.zeros((l, d), dtype)},
        },
    }
    return {
        "word_embeddings": n(keys[4], (cfg.vocab_size, d)),
        "position_embeddings": n(keys[5], (cfg.max_position_embeddings, d)),
        "emb_ln": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "blocks": blocks,
        "cls": {
            "transform": {"w": n(keys[6], (d, d)), "b": jnp.zeros((d,), dtype)},
            "transform_ln": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
            "decoder": {"w": n(keys[7], (d, cfg.vocab_size)), "b": jnp.zeros((cfg.vocab_size,), dtype)},
        },
    }


def _post_ln_attention(h_q, kv, attn_p, heads: int, bias, eps: float):
    """BERT attention sublayer: attn -> dense -> residual -> LayerNorm."""
    b, tq, d = h_q.shape
    tk = kv.shape[1]
    dh = d // heads
    q = linear(h_q, attn_p["wq"], attn_p["bq"]).reshape(b, tq, heads, dh)
    k = linear(kv, attn_p["wk"], attn_p["bk"]).reshape(b, tk, heads, dh)
    v = linear(kv, attn_p["wv"], attn_p["bv"]).reshape(b, tk, heads, dh)
    return _finish_attention(h_q, q, k, v, attn_p, bias, eps)


def _finish_attention(h_q, q, k, v, attn_p, bias, eps):
    b, tq, heads, dh = q.shape
    d = heads * dh
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        * (dh**-0.5)
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, tq, d)
    out = linear(out, attn_p["wo"], attn_p["bo"])
    return layer_norm(h_q + out, attn_p["ln"]["g"], attn_p["ln"]["b"], eps=eps)


def _finish_attention_grouped(h_q, q, k, v, attn_p, bias, eps, repeat: int):
    """_finish_attention where `repeat` consecutive query rows share one
    K/V row (k/v batch = q batch / repeat).

    Gen-B samples `sample_count` candidate captions per image by repeating
    the image row (reference sampling.py:288) — but the cross-attention
    K/V of those rows are IDENTICAL, and streaming them per candidate row
    made the repeated K/V the dominant decode traffic (~850 MB/step at 40
    candidates, BLIP-base, 577 image tokens). Folding the repeat into the
    query axis reads each image's K/V once per step (40x less) and turns
    the per-row attention matvecs into [repeat, Tv] matmuls.
    """
    if repeat == 1:
        return _finish_attention(h_q, q, k, v, attn_p, bias, eps)
    b, tq, heads, dh = q.shape
    d = heads * dh
    bi = b // repeat
    # rows are image-major ([img0 x repeat, img1 x repeat, ...], the
    # jnp.repeat layout), so (b, tq) -> (bi, repeat*tq) is a pure reshape
    qg = q.reshape(bi, repeat * tq, heads, dh)
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", qg, k, preferred_element_type=jnp.float32)
        * (dh**-0.5)
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)  # [bi,1,1,Tv] broadcasts
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, tq, d)
    out = linear(out, attn_p["wo"], attn_p["bo"])
    return layer_norm(h_q + out, attn_p["ln"]["g"], attn_p["ln"]["b"], eps=eps)


def _ffn(x, mlp, eps: float):
    h = gelu_exact(linear(x, mlp["w1"], mlp["b1"]))
    h = linear(h, mlp["w2"], mlp["b2"])
    return layer_norm(x + h, mlp["ln"]["g"], mlp["ln"]["b"], eps=eps)


def embeddings(params: dict, cfg: BlipTextConfig, tokens: jnp.ndarray,
               position_offset=0) -> jnp.ndarray:
    """position_offset: scalar, or a [B] vector (ring decode — every
    serving slot sits at its own logical position)."""
    t = tokens.shape[1]
    if jnp.ndim(position_offset) == 1:
        pos = position_offset[:, None] + jnp.arange(t)[None]  # [B, T]
        pos_emb = jnp.take(params["position_embeddings"], pos, axis=0)
    else:
        pos = position_offset + jnp.arange(t)
        pos_emb = jnp.take(params["position_embeddings"], pos, axis=0)[None]
    x = params["word_embeddings"][tokens] + pos_emb
    return layer_norm(x, params["emb_ln"]["g"], params["emb_ln"]["b"],
                      eps=cfg.layer_norm_epsilon)


def apply(
    params: dict,
    cfg: BlipTextConfig,
    tokens: jnp.ndarray,  # [B, T]
    attention_mask: Optional[jnp.ndarray] = None,
    encoder_hidden_states: Optional[jnp.ndarray] = None,  # [B, Tv, encoder_width]
    encoder_attention_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    with_lm_head: bool = False,
) -> jnp.ndarray:
    """Full forward. encoder_hidden_states=None -> text-only (ITC mode);
    causal=True -> decoder mode (caption generation teacher-forcing)."""
    b, t = tokens.shape
    x = embeddings(params, cfg, tokens)

    bias = jnp.zeros((1, 1, t, t), jnp.float32)
    if causal:
        qi = jnp.arange(t)[:, None]
        ki = jnp.arange(t)[None, :]
        bias = bias + jnp.where(ki <= qi, 0.0, NEG_INF)[None, None]
    if attention_mask is not None:
        bias = bias + jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)

    cross_bias = None
    if encoder_attention_mask is not None:
        cross_bias = jnp.where(
            encoder_attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF
        )

    eps = cfg.layer_norm_epsilon

    def body(x, layer):
        x = _post_ln_attention(x, x, layer["self"], cfg.num_heads, bias, eps)
        if encoder_hidden_states is not None:
            x = _post_ln_attention(
                x, encoder_hidden_states, layer["cross"], cfg.num_heads, cross_bias, eps
            )
        x = _ffn(x, layer["mlp"], eps)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    if with_lm_head:
        return lm_logits(params, cfg, x)
    return x


def lm_logits(params: dict, cfg: BlipTextConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """MLM-style head: dense -> gelu -> LayerNorm -> decoder matmul."""
    h = gelu_exact(linear(hidden, params["cls"]["transform"]["w"], params["cls"]["transform"]["b"]))
    h = layer_norm(h, params["cls"]["transform_ln"]["g"], params["cls"]["transform_ln"]["b"],
                   eps=cfg.layer_norm_epsilon)
    return linear(h, params["cls"]["decoder"]["w"], params["cls"]["decoder"]["b"])


# ---------------------------------------------------------------------------
# KV-cached decoding (the Gen-B sampler's hot path)
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, maxT, H, Dh] self-attn keys
    v: jnp.ndarray
    cross_k: jnp.ndarray  # [L, B, Tv, H, Dh] precomputed from image tokens
    cross_v: jnp.ndarray
    cross_bias: Optional[jnp.ndarray]
    index: jnp.ndarray


def _precompute_cross(params, cfg: BlipTextConfig, encoder_hidden_states):
    b, tv, _ = encoder_hidden_states.shape
    h, dh = cfg.num_heads, cfg.hidden_size // cfg.num_heads

    def per_layer(_, layer):
        k = linear(encoder_hidden_states, layer["cross"]["wk"], layer["cross"]["bk"])
        v = linear(encoder_hidden_states, layer["cross"]["wv"], layer["cross"]["bv"])
        return None, (k.reshape(b, tv, h, dh), v.reshape(b, tv, h, dh))

    _, (ck, cv) = jax.lax.scan(per_layer, None, params["blocks"])
    return ck, cv


def _forward_cached(params, cfg: BlipTextConfig, tokens, cache: KVCache,
                    cross_repeat: int = 1, ring=None):
    b, t = tokens.shape
    heads, dh = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    a_len = cache.k.shape[2]
    idx = cache.index
    eps = cfg.layer_norm_epsilon

    if ring is not None:  # continuous batching (decode/serving.py)
        if t != 1:
            raise ValueError("ring mode is decode-only (t == 1)")
        if cross_repeat != 1:
            raise ValueError("grouped cross-attention (repeat>1) is a Gen-B "
                             "candidate layout, not a serving one")
        ring_pos, ring_start = ring
        wslot, ring_bias = ring_layout(idx, a_len, ring_start)
        bias = ring_bias[:, None, None, :]  # [B, 1, 1, a_len]
        x = embeddings(params, cfg, tokens, position_offset=ring_pos)
    else:
        wslot = idx
        x = embeddings(params, cfg, tokens, position_offset=idx)
        qpos = idx + jnp.arange(t)[:, None]
        kpos = jnp.arange(a_len)[None, :]
        bias = jnp.where(kpos <= qpos, 0.0, NEG_INF)[None, None]

    # cache rides in the scan carry with in-place slab writes — see
    # models/gpt2.py:_forward_cached for the layout rationale
    def body(carry, xs):
        x, k_cache, v_cache = carry
        layer, ck, cv, l = xs
        h_q = x
        q = linear(h_q, layer["self"]["wq"], layer["self"]["bq"]).reshape(b, t, heads, dh)
        k = linear(h_q, layer["self"]["wk"], layer["self"]["bk"]).reshape(b, t, heads, dh)
        v = linear(h_q, layer["self"]["wv"], layer["self"]["bv"]).reshape(b, t, heads, dh)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k[None].astype(k_cache.dtype), (l, 0, wslot, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v[None].astype(v_cache.dtype), (l, 0, wslot, 0, 0)
        )
        keys = jax.lax.dynamic_index_in_dim(k_cache, l, 0, keepdims=False)[:, :a_len]
        vals = jax.lax.dynamic_index_in_dim(v_cache, l, 0, keepdims=False)[:, :a_len]
        x = _finish_attention(x, q, keys, vals, layer["self"], bias, eps)
        # cross-attention with precomputed (and possibly row-shared) K/V
        q2 = linear(x, layer["cross"]["wq"], layer["cross"]["bq"]).reshape(b, t, heads, dh)
        x = _finish_attention_grouped(x, q2, ck, cv, layer["cross"],
                                      cache.cross_bias, eps, cross_repeat)
        x = _ffn(x, layer["mlp"], eps)
        return (x, k_cache, v_cache), None

    (x, new_k, new_v), _ = jax.lax.scan(
        body,
        (x, cache.k, cache.v),
        (params["blocks"], cache.cross_k, cache.cross_v,
         jnp.arange(cfg.num_layers)),
    )
    logits = lm_logits(params, cfg, x)
    return logits, cache._replace(k=new_k, v=new_v, index=idx + t)


def decoder_lm(
    params: dict,
    cfg: BlipTextConfig,
    encoder_hidden_states: jnp.ndarray,
    encoder_attention_mask: Optional[jnp.ndarray] = None,
    repeat: int = 1,
):
    """Adapter exposing the framework LM protocol over (params, image feats).

    BERT applies positions + LayerNorm inside its embedding layer, so this
    adapter's prefill/decode_step take raw token ids ([B, T] int) instead
    of embeddings; `takes_token_ids=True` tells decode/engine.generate()
    to feed ids. Cross-attention K/V are precomputed here once from the
    image tokens (the reference recomputes them every generated token,
    sampling.py:193).

    repeat > 1: each image row serves `repeat` consecutive decode rows
    (Gen-B's sample_count candidates, reference sampling.py:288) — pass
    the UNREPEATED image features; the cross K/V are stored and streamed
    once per image instead of once per candidate (see
    _finish_attention_grouped).
    """
    ck, cv = _precompute_cross(params, cfg, encoder_hidden_states)
    cross_bias = None
    if encoder_attention_mask is not None:
        cross_bias = jnp.where(
            encoder_attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF
        )

    def init_cache(cfg_, batch, max_len, dtype=None):
        if batch != encoder_hidden_states.shape[0] * repeat:
            raise ValueError(
                f"decode batch {batch} != images {encoder_hidden_states.shape[0]}"
                f" x repeat {repeat}"
            )
        # activations follow the image features' dtype (bf16 on TPU); the
        # engine's f32 token-mode fallback would silently upcast every layer
        dtype = encoder_hidden_states.dtype if dtype is None else dtype
        l, h, dh = cfg.num_layers, cfg.num_heads, cfg.hidden_size // cfg.num_heads
        shape = (l, batch, max_len, h, dh)
        return KVCache(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            cross_k=ck.astype(dtype), cross_v=cv.astype(dtype),
            cross_bias=cross_bias, index=jnp.zeros((), jnp.int32),
        )

    def prefill(params_, cfg_, token_ids, cache):
        return _forward_cached(params, cfg, token_ids, cache,
                               cross_repeat=repeat)

    def decode_step(params_, cfg_, token_ids, cache):
        logits, cache = _forward_cached(
            params, cfg, token_ids, cache, cross_repeat=repeat,
        )
        return logits[:, -1], cache

    return SimpleNamespace(
        init_cache=init_cache,
        prefill=prefill,
        decode_step=decode_step,
        takes_token_ids=True,
    )


def serving_decoder_lm(params: dict, cfg: BlipTextConfig,
                       prompt_ids, num_image_tokens: int):
    """Continuous-batching adapter (decode/serving.py) for the BLIP decoder.

    Unlike `decoder_lm`, which closes over ONE batch of image features,
    this adapter treats the image features as the per-request prefix:
    serving's prefill receives an [R, Tv, D] feature batch, computes that
    batch's cross-attention K/V into the (small) cache, and runs the FIXED
    decoder prompt (`prompt_ids`, e.g. the tokenized "a picture of" — the
    reference's Gen-B prompt, sampling.py:288) through the self-attention
    ring. scatter_refill swaps both the self-attn slabs and the
    per-request cross K/V rows. Pass ServingEngine prefix_len =
    num_image_tokens and prompt_len = len(prompt_ids).
    """
    prompt_ids = jnp.asarray(prompt_ids, jnp.int32).reshape(1, -1)

    def init_cache(cfg_, batch, max_len, dtype=None):
        dtype = jnp.float32 if dtype is None else dtype
        l, h, dh = cfg.num_layers, cfg.num_heads, cfg.hidden_size // cfg.num_heads
        shape = (l, batch, max_len, h, dh)
        return KVCache(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            cross_k=jnp.zeros((l, batch, num_image_tokens, h, dh), dtype),
            cross_v=jnp.zeros((l, batch, num_image_tokens, h, dh), dtype),
            cross_bias=None, index=jnp.zeros((), jnp.int32),
        )

    def prefill(params_, cfg_, image_feats, cache):
        ck, cv = _precompute_cross(params, cfg, image_feats)
        cache = cache._replace(
            cross_k=ck.astype(cache.cross_k.dtype),
            cross_v=cv.astype(cache.cross_v.dtype),
        )
        ids = jnp.broadcast_to(prompt_ids, (image_feats.shape[0],
                                            prompt_ids.shape[1]))
        return _forward_cached(params, cfg, ids, cache)

    def decode_step(params_, cfg_, token_ids, cache):
        logits, cache = _forward_cached(params, cfg, token_ids, cache)
        return logits[:, -1], cache

    def decode_step_ring(params_, cfg_, token_ids, cache, pos, start):
        logits, cache = _forward_cached(params, cfg, token_ids, cache,
                                        ring=(pos, start))
        return logits[:, -1], cache

    def scatter_refill(cache, small, q):
        # contiguous block [q, q+R) — see models/gpt2.py scatter_refill
        rp = refill_positions(cache.index, small.k.shape[2], cache.k.shape[2])

        def paste_axis1(big, sm):
            # per-request image K/V swap whole rows (nothing rides the
            # ring: cross-attention has no time axis of its own)
            dst = [0] * big.ndim
            dst[1] = q
            return jax.lax.dynamic_update_slice(
                big, sm.astype(big.dtype), dst)

        return cache._replace(
            k=paste_rows(cache.k, small.k, q, rp, time_axis=2),
            v=paste_rows(cache.v, small.v, q, rp, time_axis=2),
            cross_k=paste_axis1(cache.cross_k, small.cross_k),
            cross_v=paste_axis1(cache.cross_v, small.cross_v),
        )

    return SimpleNamespace(
        init_cache=init_cache,
        prefill=prefill,
        decode_step=decode_step,
        decode_step_ring=decode_step_ring,
        scatter_refill=scatter_refill,
        takes_token_ids=True,
    )


def quantize_params(params: dict) -> dict:
    """bf16/f32 BLIP text params -> int8 decode params.

    Every matmul weight (self/cross attention projections, MLP, the MLM
    head) becomes {"q": int8, "s": f32[out]} consumed by ops.quant.linear's
    dispatch — the forward code is shared between precisions. Embedding
    tables, biases and layernorms stay dense. Gen-B decode streams the
    decoder weights once per generated token (reference sampling.py:193
    recomputes everything); quantizing halves that stream.
    """
    from ..ops.quant import quantize_weight

    def attn(a):
        out = {k: quantize_weight(a[k]) for k in ("wq", "wk", "wv", "wo")}
        out.update({k: a[k] for k in ("bq", "bk", "bv", "bo", "ln")})
        return out

    blocks = params["blocks"]
    return {
        "word_embeddings": params["word_embeddings"],
        "position_embeddings": params["position_embeddings"],
        "emb_ln": params["emb_ln"],
        "blocks": {
            "self": attn(blocks["self"]),
            "cross": attn(blocks["cross"]),
            "mlp": {
                "w1": quantize_weight(blocks["mlp"]["w1"]),
                "b1": blocks["mlp"]["b1"],
                "w2": quantize_weight(blocks["mlp"]["w2"]),
                "b2": blocks["mlp"]["b2"],
                "ln": blocks["mlp"]["ln"],
            },
        },
        "cls": {
            "transform": {
                "w": quantize_weight(params["cls"]["transform"]["w"]),
                "b": params["cls"]["transform"]["b"],
            },
            "transform_ln": params["cls"]["transform_ln"],
            "decoder": {
                "w": quantize_weight(params["cls"]["decoder"]["w"]),
                "b": params["cls"]["decoder"]["b"],
            },
        },
    }
