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
