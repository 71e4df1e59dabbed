"""Torch-checkpoint -> JAX param-tree converters for every model family.

The reference loads all five model families from torch checkpoints
(HF `from_pretrained` at lms/GPT2.py:9, lms/GPTJ.py:7, lms/T0.py:8;
`clip.load` at train.py:206; BLIP checkpoints at sampling.py:330-351).
This module converts those state dicts into this framework's stacked
param pytrees. Inputs are plain `{name: numpy array}` dicts, so callers
can feed `torch.load(...)` results or HF `model.state_dict()` without
this module importing torch.

Conventions: our linear weights are [in, out]; torch nn.Linear stores
[out, in] (transposed on import); HF GPT-2's Conv1D already stores
[in, out] (copied through). Per-layer tensors are stacked on a leading
[L] axis to match the lax.scan execution layout.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from ..core.config import GPT2Config, GPTJConfig


def _np(x) -> np.ndarray:
    """Accept torch tensors or numpy arrays."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _stack(sd: Mapping, template: str, n: int, transform: Callable = _np):
    return jnp.asarray(np.stack([transform(sd[template.format(i=i)]) for i in range(n)]))


def _cast_tree(tree, dtype):
    import jax

    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), tree)


def gpt2_from_state_dict(sd: Mapping, cfg: GPT2Config, dtype=jnp.float32) -> dict:
    """Convert an HF GPT2LMHeadModel state dict (keys `transformer.*`)."""
    p = "transformer."
    if p + "wte.weight" not in sd and "wte.weight" in sd:
        p = ""  # bare GPT2Model state dict
    l = cfg.n_layer

    def stk(t):
        return _stack(sd, p + "h.{i}." + t, l)

    params = {
        "wte": jnp.asarray(_np(sd[p + "wte.weight"]), dtype),
        "wpe": jnp.asarray(_np(sd[p + "wpe.weight"]), dtype),
        "blocks": {
            "ln1": {"g": stk("ln_1.weight"), "b": stk("ln_1.bias")},
            "attn": {
                # HF Conv1D weights are already [in, out]
                "c_attn": {"w": stk("attn.c_attn.weight"), "b": stk("attn.c_attn.bias")},
                "c_proj": {"w": stk("attn.c_proj.weight"), "b": stk("attn.c_proj.bias")},
            },
            "ln2": {"g": stk("ln_2.weight"), "b": stk("ln_2.bias")},
            "mlp": {
                "c_fc": {"w": stk("mlp.c_fc.weight"), "b": stk("mlp.c_fc.bias")},
                "c_proj": {"w": stk("mlp.c_proj.weight"), "b": stk("mlp.c_proj.bias")},
            },
        },
        "ln_f": {
            "g": jnp.asarray(_np(sd[p + "ln_f.weight"]), dtype),
            "b": jnp.asarray(_np(sd[p + "ln_f.bias"]), dtype),
        },
    }
    return _cast_tree(params, dtype)


def gptj_from_state_dict(sd: Mapping, cfg: GPTJConfig, dtype=jnp.float32) -> dict:
    """Convert an HF GPTJForCausalLM state dict (keys `transformer.*`)."""
    p = "transformer."
    if p + "wte.weight" not in sd and "wte.weight" in sd:
        p = ""
    l = cfg.n_layer

    def stk(t, transpose=False):
        tr = (lambda x: _np(x).T) if transpose else _np
        return _stack(sd, p + "h.{i}." + t, l, tr)

    params = {
        "wte": jnp.asarray(_np(sd[p + "wte.weight"])),
        "blocks": {
            "ln1": {"g": stk("ln_1.weight"), "b": stk("ln_1.bias")},
            "attn": {
                # torch nn.Linear [out, in] -> [in, out]
                "wq": stk("attn.q_proj.weight", transpose=True),
                "wk": stk("attn.k_proj.weight", transpose=True),
                "wv": stk("attn.v_proj.weight", transpose=True),
                "wo": stk("attn.out_proj.weight", transpose=True),
            },
            "mlp": {
                "w_in": stk("mlp.fc_in.weight", transpose=True),
                "b_in": stk("mlp.fc_in.bias"),
                "w_out": stk("mlp.fc_out.weight", transpose=True),
                "b_out": stk("mlp.fc_out.bias"),
            },
        },
        "ln_f": {
            "g": jnp.asarray(_np(sd[p + "ln_f.weight"])),
            "b": jnp.asarray(_np(sd[p + "ln_f.bias"])),
        },
        "lm_head": {
            "w": jnp.asarray(_np(sd["lm_head.weight"]).T),
            "b": jnp.asarray(_np(sd["lm_head.bias"])),
        },
    }
    return _cast_tree(params, dtype)


def mapper_from_torch_state_dict(sd: Mapping, cfg, dtype=jnp.float32) -> dict:
    """Convert a torch mapper state dict (reference layers/Transformer.py).

    Key layout of the reference modules:
      linear.weight/bias, prefix_const, [pos_embeddings],
      transformer.layers.{i}.norm1.weight/bias,
      transformer.layers.{i}.attn.to_queries.weight,
      transformer.layers.{i}.attn.to_keys_values.weight,
      transformer.layers.{i}.attn.project.weight/bias,
      transformer.layers.{i}.norm2.*, .mlp.fc1.*, .mlp.fc2.*
    """
    l = cfg.num_layers

    def stk(t, transpose=False):
        tr = (lambda x: _np(x).T) if transpose else _np
        return _stack(sd, "transformer.layers.{i}." + t, l, tr)

    params = {
        "linear": {
            "w": jnp.asarray(_np(sd["linear.weight"]).T),
            "b": jnp.asarray(_np(sd["linear.bias"])),
        },
        "prefix_const": jnp.asarray(_np(sd["prefix_const"])),
        "layers": {
            "ln1": {"g": stk("norm1.weight"), "b": stk("norm1.bias")},
            "attn": {
                "wq": stk("attn.to_queries.weight", transpose=True),
                "wkv": stk("attn.to_keys_values.weight", transpose=True),
                "wo": stk("attn.project.weight", transpose=True),
                "bo": stk("attn.project.bias"),
            },
            "ln2": {"g": stk("norm2.weight"), "b": stk("norm2.bias")},
            "mlp": {
                "w1": stk("mlp.fc1.weight", transpose=True),
                "b1": stk("mlp.fc1.bias"),
                "w2": stk("mlp.fc2.weight", transpose=True),
                "b2": stk("mlp.fc2.bias"),
            },
        },
    }
    if "pos_embeddings" in sd:
        params["pos_embeddings"] = jnp.asarray(_np(sd["pos_embeddings"]))
    return _cast_tree(params, dtype)


# ---------------------------------------------------------------------------
# Vision towers (CLIP / BLIP ViT) and the CLIP text tower
# ---------------------------------------------------------------------------


def _conv_patch_to_matmul(w) -> np.ndarray:
    """Conv2d weight [D, C, P, P] -> per-patch linear [C*P*P, D]."""
    w = _np(w)
    d = w.shape[0]
    return w.reshape(d, -1).T


def _fused_qkv(sd, fmt: str, n: int, transpose=True):
    """Stack per-layer fused [D, 3D] qkv weights from separate q/k/v linears."""
    ws, bs = [], []
    for i in range(n):
        q = _np(sd[fmt.format(i=i, p="q_proj") + ".weight"]).T
        k = _np(sd[fmt.format(i=i, p="k_proj") + ".weight"]).T
        v = _np(sd[fmt.format(i=i, p="v_proj") + ".weight"]).T
        ws.append(np.concatenate([q, k, v], axis=1))
        qb = _np(sd[fmt.format(i=i, p="q_proj") + ".bias"])
        kb = _np(sd[fmt.format(i=i, p="k_proj") + ".bias"])
        vb = _np(sd[fmt.format(i=i, p="v_proj") + ".bias"])
        bs.append(np.concatenate([qb, kb, vb]))
    return jnp.asarray(np.stack(ws)), jnp.asarray(np.stack(bs))


def clip_vit_from_hf_state_dict(sd: Mapping, cfg, dtype=jnp.float32) -> dict:
    """HF CLIPVisionModelWithProjection (keys `vision_model.*`,
    `visual_projection.weight`) -> our ViT params (style='clip')."""
    p = "vision_model."
    l = cfg.layers
    lay = p + "encoder.layers.{i}."

    def stk(t, transpose=False):
        tr = (lambda x: _np(x).T) if transpose else _np
        return _stack(sd, lay + t, l, tr)

    wqkv, bqkv = _fused_qkv(sd, lay + "self_attn.{p}", l)
    params = {
        "patch": {"w": jnp.asarray(_conv_patch_to_matmul(sd[p + "embeddings.patch_embedding.weight"]))},
        "cls": jnp.asarray(_np(sd[p + "embeddings.class_embedding"]).reshape(-1)),
        "pos": jnp.asarray(_np(sd[p + "embeddings.position_embedding.weight"])),
        "ln_pre": {
            "g": jnp.asarray(_np(sd[p + "pre_layrnorm.weight"])),
            "b": jnp.asarray(_np(sd[p + "pre_layrnorm.bias"])),
        },
        "blocks": {
            "ln1": {"g": stk("layer_norm1.weight"), "b": stk("layer_norm1.bias")},
            "attn": {
                "wqkv": wqkv,
                "bqkv": bqkv,
                "wo": stk("self_attn.out_proj.weight", transpose=True),
                "bo": stk("self_attn.out_proj.bias"),
            },
            "ln2": {"g": stk("layer_norm2.weight"), "b": stk("layer_norm2.bias")},
            "mlp": {
                "w1": stk("mlp.fc1.weight", transpose=True),
                "b1": stk("mlp.fc1.bias"),
                "w2": stk("mlp.fc2.weight", transpose=True),
                "b2": stk("mlp.fc2.bias"),
            },
        },
        "ln_post": {
            "g": jnp.asarray(_np(sd[p + "post_layernorm.weight"])),
            "b": jnp.asarray(_np(sd[p + "post_layernorm.bias"])),
        },
    }
    if "visual_projection.weight" in sd:
        params["proj"] = jnp.asarray(_np(sd["visual_projection.weight"]).T)
    return _cast_tree(params, dtype)


def clip_vit_from_openai_state_dict(sd: Mapping, cfg, dtype=jnp.float32) -> dict:
    """OpenAI CLIP checkpoint (keys `visual.*`) -> ViT params (style='clip')."""
    p = "visual."
    l = cfg.layers
    lay = p + "transformer.resblocks.{i}."

    def stk(t, transpose=False):
        tr = (lambda x: _np(x).T) if transpose else _np
        return _stack(sd, lay + t, l, tr)

    params = {
        "patch": {"w": jnp.asarray(_conv_patch_to_matmul(sd[p + "conv1.weight"]))},
        "cls": jnp.asarray(_np(sd[p + "class_embedding"]).reshape(-1)),
        "pos": jnp.asarray(_np(sd[p + "positional_embedding"])),
        "ln_pre": {
            "g": jnp.asarray(_np(sd[p + "ln_pre.weight"])),
            "b": jnp.asarray(_np(sd[p + "ln_pre.bias"])),
        },
        "blocks": {
            "ln1": {"g": stk("ln_1.weight"), "b": stk("ln_1.bias")},
            "attn": {
                # in_proj_weight is [3D, D] with rows q,k,v
                "wqkv": stk("attn.in_proj_weight", transpose=True),
                "bqkv": stk("attn.in_proj_bias"),
                "wo": stk("attn.out_proj.weight", transpose=True),
                "bo": stk("attn.out_proj.bias"),
            },
            "ln2": {"g": stk("ln_2.weight"), "b": stk("ln_2.bias")},
            "mlp": {
                "w1": stk("mlp.c_fc.weight", transpose=True),
                "b1": stk("mlp.c_fc.bias"),
                "w2": stk("mlp.c_proj.weight", transpose=True),
                "b2": stk("mlp.c_proj.bias"),
            },
        },
        "ln_post": {
            "g": jnp.asarray(_np(sd[p + "ln_post.weight"])),
            "b": jnp.asarray(_np(sd[p + "ln_post.bias"])),
        },
        "proj": jnp.asarray(_np(sd[p + "proj"])),  # already [D, out]
    }
    return _cast_tree(params, dtype)


def blip_vit_from_hf_state_dict(sd: Mapping, cfg, dtype=jnp.float32) -> dict:
    """HF BlipVisionModel (keys `embeddings.*`, `encoder.layers.*`,
    `post_layernorm.*`) -> ViT params (style='blip')."""
    prefix = "" if "embeddings.class_embedding" in sd else "vision_model."
    p = prefix
    l = cfg.layers
    lay = p + "encoder.layers.{i}."

    def stk(t, transpose=False):
        tr = (lambda x: _np(x).T) if transpose else _np
        return _stack(sd, lay + t, l, tr)

    params = {
        "patch": {
            "w": jnp.asarray(_conv_patch_to_matmul(sd[p + "embeddings.patch_embedding.weight"])),
            "b": jnp.asarray(_np(sd[p + "embeddings.patch_embedding.bias"])),
        },
        "cls": jnp.asarray(_np(sd[p + "embeddings.class_embedding"]).reshape(-1)),
        "pos": jnp.asarray(_np(sd[p + "embeddings.position_embedding"]).reshape(-1, cfg.width)),
        "blocks": {
            "ln1": {"g": stk("layer_norm1.weight"), "b": stk("layer_norm1.bias")},
            "attn": {
                "wqkv": stk("self_attn.qkv.weight", transpose=True),
                "bqkv": stk("self_attn.qkv.bias"),
                "wo": stk("self_attn.projection.weight", transpose=True),
                "bo": stk("self_attn.projection.bias"),
            },
            "ln2": {"g": stk("layer_norm2.weight"), "b": stk("layer_norm2.bias")},
            "mlp": {
                "w1": stk("mlp.fc1.weight", transpose=True),
                "b1": stk("mlp.fc1.bias"),
                "w2": stk("mlp.fc2.weight", transpose=True),
                "b2": stk("mlp.fc2.bias"),
            },
        },
        "ln_post": {
            "g": jnp.asarray(_np(sd[p + "post_layernorm.weight"])),
            "b": jnp.asarray(_np(sd[p + "post_layernorm.bias"])),
        },
    }
    return _cast_tree(params, dtype)


def clip_text_from_hf_state_dict(sd: Mapping, cfg, dtype=jnp.float32) -> dict:
    """HF CLIPTextModelWithProjection -> clip_text params."""
    p = "text_model."
    l = cfg.layers
    lay = p + "encoder.layers.{i}."

    def stk(t, transpose=False):
        tr = (lambda x: _np(x).T) if transpose else _np
        return _stack(sd, lay + t, l, tr)

    wqkv, bqkv = _fused_qkv(sd, lay + "self_attn.{p}", l)
    params = {
        "token_embedding": jnp.asarray(_np(sd[p + "embeddings.token_embedding.weight"])),
        "pos": jnp.asarray(_np(sd[p + "embeddings.position_embedding.weight"])),
        "blocks": {
            "ln1": {"g": stk("layer_norm1.weight"), "b": stk("layer_norm1.bias")},
            "attn": {
                "wqkv": wqkv,
                "bqkv": bqkv,
                "wo": stk("self_attn.out_proj.weight", transpose=True),
                "bo": stk("self_attn.out_proj.bias"),
            },
            "ln2": {"g": stk("layer_norm2.weight"), "b": stk("layer_norm2.bias")},
            "mlp": {
                "w1": stk("mlp.fc1.weight", transpose=True),
                "b1": stk("mlp.fc1.bias"),
                "w2": stk("mlp.fc2.weight", transpose=True),
                "b2": stk("mlp.fc2.bias"),
            },
        },
        "ln_final": {
            "g": jnp.asarray(_np(sd[p + "final_layer_norm.weight"])),
            "b": jnp.asarray(_np(sd[p + "final_layer_norm.bias"])),
        },
        "text_projection": jnp.asarray(_np(sd["text_projection.weight"]).T),
    }
    return _cast_tree(params, dtype)


def clip_text_from_openai_state_dict(sd: Mapping, cfg, dtype=jnp.float32) -> dict:
    """OpenAI CLIP checkpoint (text tower keys at top level) -> clip_text."""
    l = cfg.layers
    lay = "transformer.resblocks.{i}."

    def stk(t, transpose=False):
        tr = (lambda x: _np(x).T) if transpose else _np
        return _stack(sd, lay + t, l, tr)

    params = {
        "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"])),
        "pos": jnp.asarray(_np(sd["positional_embedding"])),
        "blocks": {
            "ln1": {"g": stk("ln_1.weight"), "b": stk("ln_1.bias")},
            "attn": {
                "wqkv": stk("attn.in_proj_weight", transpose=True),
                "bqkv": stk("attn.in_proj_bias"),
                "wo": stk("attn.out_proj.weight", transpose=True),
                "bo": stk("attn.out_proj.bias"),
            },
            "ln2": {"g": stk("ln_2.weight"), "b": stk("ln_2.bias")},
            "mlp": {
                "w1": stk("mlp.c_fc.weight", transpose=True),
                "b1": stk("mlp.c_fc.bias"),
                "w2": stk("mlp.c_proj.weight", transpose=True),
                "b2": stk("mlp.c_proj.bias"),
            },
        },
        "ln_final": {
            "g": jnp.asarray(_np(sd["ln_final.weight"])),
            "b": jnp.asarray(_np(sd["ln_final.bias"])),
        },
        "text_projection": jnp.asarray(_np(sd["text_projection"])),
    }
    return _cast_tree(params, dtype)


# ---------------------------------------------------------------------------
# T5 / T0
# ---------------------------------------------------------------------------


def t5_from_state_dict(sd: Mapping, cfg, dtype=jnp.float32) -> dict:
    """HF T5ForConditionalGeneration state dict -> t5 params."""
    gated = cfg.feed_forward_proj == "gated-gelu"

    def attn(prefix):
        return {
            "wq": _np(sd[prefix + ".q.weight"]).T,
            "wk": _np(sd[prefix + ".k.weight"]).T,
            "wv": _np(sd[prefix + ".v.weight"]).T,
            "wo": _np(sd[prefix + ".o.weight"]).T,
        }

    def mlp(prefix):
        if gated:
            return {
                "wi_0": _np(sd[prefix + ".wi_0.weight"]).T,
                "wi_1": _np(sd[prefix + ".wi_1.weight"]).T,
                "wo": _np(sd[prefix + ".wo.weight"]).T,
            }
        return {
            "wi_0": _np(sd[prefix + ".wi.weight"]).T,
            "wo": _np(sd[prefix + ".wo.weight"]).T,
        }

    def stack(trees):
        import jax

        return jax.tree_util.tree_map(lambda *xs: jnp.asarray(np.stack(xs)), *trees)

    enc_layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}"
        enc_layers.append(
            {
                "ln1": {"g": _np(sd[f"{p}.layer.0.layer_norm.weight"])},
                "attn": attn(f"{p}.layer.0.SelfAttention"),
                "ln2": {"g": _np(sd[f"{p}.layer.1.layer_norm.weight"])},
                "mlp": mlp(f"{p}.layer.1.DenseReluDense"),
            }
        )
    dec_layers = []
    for i in range(cfg.num_decoder_layers):
        p = f"decoder.block.{i}"
        dec_layers.append(
            {
                "ln1": {"g": _np(sd[f"{p}.layer.0.layer_norm.weight"])},
                "self_attn": attn(f"{p}.layer.0.SelfAttention"),
                "ln2": {"g": _np(sd[f"{p}.layer.1.layer_norm.weight"])},
                "cross_attn": attn(f"{p}.layer.1.EncDecAttention"),
                "ln3": {"g": _np(sd[f"{p}.layer.2.layer_norm.weight"])},
                "mlp": mlp(f"{p}.layer.2.DenseReluDense"),
            }
        )

    params = {
        "shared": jnp.asarray(_np(sd["shared.weight"])),
        "encoder": {
            "blocks": stack(enc_layers),
            "rel_bias": jnp.asarray(
                _np(sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])
            ),
            "ln_f": {"g": jnp.asarray(_np(sd["encoder.final_layer_norm.weight"]))},
        },
        "decoder": {
            "blocks": stack(dec_layers),
            "rel_bias": jnp.asarray(
                _np(sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])
            ),
            "ln_f": {"g": jnp.asarray(_np(sd["decoder.final_layer_norm.weight"]))},
        },
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = {"w": jnp.asarray(_np(sd["lm_head.weight"]).T)}
    return _cast_tree(params, dtype)


# ---------------------------------------------------------------------------
# BLIP text (BERT-style decoder/encoder with cross-attention) + ITM/ITC heads
# ---------------------------------------------------------------------------


def blip_text_from_hf_state_dict(sd: Mapping, cfg, prefix: str = "", dtype=jnp.float32) -> dict:
    """HF BlipTextLMHeadModel / BlipTextModel state dict -> blip_text params.

    `prefix` selects the submodel inside a larger checkpoint (e.g.
    "text_decoder." for BlipForConditionalGeneration). Handles both
    "bert."-rooted LM-head checkpoints and bare text models.
    """
    p = prefix
    if p + "bert.embeddings.word_embeddings.weight" in sd:
        b = p + "bert."
    else:
        b = p
    l = cfg.num_layers
    lay = b + "encoder.layer.{i}."

    def stk(t, transpose=False):
        tr = (lambda x: _np(x).T) if transpose else _np
        return _stack(sd, lay + t, l, tr)

    def attn_params(kind):
        return {
            "wq": stk(f"{kind}.self.query.weight", transpose=True),
            "bq": stk(f"{kind}.self.query.bias"),
            "wk": stk(f"{kind}.self.key.weight", transpose=True),
            "bk": stk(f"{kind}.self.key.bias"),
            "wv": stk(f"{kind}.self.value.weight", transpose=True),
            "bv": stk(f"{kind}.self.value.bias"),
            "wo": stk(f"{kind}.output.dense.weight", transpose=True),
            "bo": stk(f"{kind}.output.dense.bias"),
            "ln": {
                "g": stk(f"{kind}.output.LayerNorm.weight"),
                "b": stk(f"{kind}.output.LayerNorm.bias"),
            },
        }

    params = {
        "word_embeddings": jnp.asarray(_np(sd[b + "embeddings.word_embeddings.weight"])),
        "position_embeddings": jnp.asarray(_np(sd[b + "embeddings.position_embeddings.weight"])),
        "emb_ln": {
            "g": jnp.asarray(_np(sd[b + "embeddings.LayerNorm.weight"])),
            "b": jnp.asarray(_np(sd[b + "embeddings.LayerNorm.bias"])),
        },
        "blocks": {
            "self": attn_params("attention"),
            "cross": attn_params("crossattention"),
            "mlp": {
                "w1": stk("intermediate.dense.weight", transpose=True),
                "b1": stk("intermediate.dense.bias"),
                "w2": stk("output.dense.weight", transpose=True),
                "b2": stk("output.dense.bias"),
                "ln": {
                    "g": stk("output.LayerNorm.weight"),
                    "b": stk("output.LayerNorm.bias"),
                },
            },
        },
    }
    if p + "cls.predictions.decoder.weight" in sd:
        params["cls"] = {
            "transform": {
                "w": jnp.asarray(_np(sd[p + "cls.predictions.transform.dense.weight"]).T),
                "b": jnp.asarray(_np(sd[p + "cls.predictions.transform.dense.bias"])),
            },
            "transform_ln": {
                "g": jnp.asarray(_np(sd[p + "cls.predictions.transform.LayerNorm.weight"])),
                "b": jnp.asarray(_np(sd[p + "cls.predictions.transform.LayerNorm.bias"])),
            },
            "decoder": {
                "w": jnp.asarray(_np(sd[p + "cls.predictions.decoder.weight"]).T),
                "b": jnp.asarray(_np(sd[p + "cls.predictions.bias"])),
            },
        }
    return _cast_tree(params, dtype)


# ---------------------------------------------------------------------------
# CLIP ModifiedResNet (RN50 / RN50x4 / RN50x16 / RN50x64)
# ---------------------------------------------------------------------------


def clip_resnet_config_from_state_dict(sd: Mapping):
    """Derive ResNetConfig from an OpenAI checkpoint (like clip.load does)."""
    from ..models.clip_resnet import ResNetConfig

    counts = []
    for stage in range(1, 5):
        blocks = {k.split(".")[2] for k in sd
                  if k.startswith(f"visual.layer{stage}.")}
        counts.append(len(blocks))
    width = _np(sd["visual.conv3.weight"]).shape[0]
    embed_dim = width * 32
    output_dim = _np(sd["visual.attnpool.c_proj.weight"]).shape[0]
    spacial = int(round((_np(sd["visual.attnpool.positional_embedding"]).shape[0] - 1) ** 0.5))
    return ResNetConfig(layers=tuple(counts), width=width, output_dim=output_dim,
                        heads=embed_dim // 64, image_size=spacial * 32)


def clip_resnet_from_openai_state_dict(sd: Mapping, cfg=None, dtype=jnp.float32) -> dict:
    """OpenAI CLIP checkpoint (keys `visual.*`) -> clip_resnet params."""
    if cfg is None:
        cfg = clip_resnet_config_from_state_dict(sd)

    def bn(prefix):
        return {
            "g": _np(sd[prefix + ".weight"]),
            "b": _np(sd[prefix + ".bias"]),
            "mean": _np(sd[prefix + ".running_mean"]),
            "var": _np(sd[prefix + ".running_var"]),
        }

    params = {
        "conv1": _np(sd["visual.conv1.weight"]), "bn1": bn("visual.bn1"),
        "conv2": _np(sd["visual.conv2.weight"]), "bn2": bn("visual.bn2"),
        "conv3": _np(sd["visual.conv3.weight"]), "bn3": bn("visual.bn3"),
    }
    for stage_idx, blocks in enumerate(cfg.layers):
        stage = []
        for b_idx in range(blocks):
            p = f"visual.layer{stage_idx + 1}.{b_idx}"
            block = {
                "conv1": _np(sd[f"{p}.conv1.weight"]), "bn1": bn(f"{p}.bn1"),
                "conv2": _np(sd[f"{p}.conv2.weight"]), "bn2": bn(f"{p}.bn2"),
                "conv3": _np(sd[f"{p}.conv3.weight"]), "bn3": bn(f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": _np(sd[f"{p}.downsample.0.weight"]),
                    "bn": bn(f"{p}.downsample.1"),
                }
            stage.append(block)
        params[f"layer{stage_idx + 1}"] = stage

    ap = "visual.attnpool"
    params["attnpool"] = {
        "positional_embedding": _np(sd[f"{ap}.positional_embedding"]),
        "q_proj": {"w": _np(sd[f"{ap}.q_proj.weight"]).T, "b": _np(sd[f"{ap}.q_proj.bias"])},
        "k_proj": {"w": _np(sd[f"{ap}.k_proj.weight"]).T, "b": _np(sd[f"{ap}.k_proj.bias"])},
        "v_proj": {"w": _np(sd[f"{ap}.v_proj.weight"]).T, "b": _np(sd[f"{ap}.v_proj.bias"])},
        "c_proj": {"w": _np(sd[f"{ap}.c_proj.weight"]).T, "b": _np(sd[f"{ap}.c_proj.bias"])},
    }
    return _cast_tree(params, dtype)


def blip_retrieval_from_hf_state_dict(sd: Mapping, vit_cfg, text_cfg, dtype=jnp.float32) -> dict:
    """HF BlipForImageTextRetrieval -> blip_retrieval params
    (vision tower + text encoder with cross-attn + ITM/ITC heads)."""
    def lin(prefix):
        return {"w": jnp.asarray(_np(sd[prefix + ".weight"]).T),
                "b": jnp.asarray(_np(sd[prefix + ".bias"]))}

    params = {
        "visual": blip_vit_from_hf_state_dict(
            {k[len("vision_model."):]: v for k, v in sd.items()
             if k.startswith("vision_model.")}, vit_cfg, dtype=dtype),
        "text": blip_text_from_hf_state_dict(
            {k[len("text_encoder."):]: v for k, v in sd.items()
             if k.startswith("text_encoder.")}, text_cfg, dtype=dtype),
        "vision_proj": lin("vision_proj"),
        "text_proj": lin("text_proj"),
        "itm_head": lin("itm_head"),
    }
    return _cast_tree(params, dtype)
