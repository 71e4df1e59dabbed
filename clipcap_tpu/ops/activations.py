"""Activation functions.

Includes the mapper's configurable activations (reference
layers/Transformer.py:112-130: relu/elu/gelu/selu/geglu, where geglu
doubles the fc1 width) plus the model-zoo activations: CLIP's quickgelu
and GPT-2's tanh-approximated "gelu_new".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def geglu(x: jnp.ndarray) -> jnp.ndarray:
    """Gated GELU over a doubled-width input: split last dim, gate with gelu.

    Matches the reference's `geglu` (layers/Transformer.py:112-114) which
    chunks into (value, gate) and returns value * gelu(gate). Note torch's
    default F.gelu is the exact erf form, so we use approximate=False.
    """
    value, gate = jnp.split(x, 2, axis=-1)
    return value * jax.nn.gelu(gate, approximate=False)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """GPT-2's tanh-approximated GELU (HF activation "gelu_new")."""
    return (
        0.5
        * x
        * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * jnp.power(x, 3.0))))
    )


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


_ACTS = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "gelu": gelu_exact,
    "selu": jax.nn.selu,
    "geglu": geglu,
    "quick_gelu": quick_gelu,
    "gelu_new": gelu_new,
}


def parse_act_fn(name: str):
    """Name -> activation, matching reference layers/Transformer.py:117-130."""
    key = name.lower()
    if key not in _ACTS:
        raise ValueError(f"Specified activation function {name} is not supported.")
    return _ACTS[key]


def is_gated(name: str) -> bool:
    """Gated activations need a doubled fc1 width (reference :74)."""
    return name.lower() == "geglu"
