"""Dtype policy for TPU execution.

The reference trains with AMP fp16 (`pl.Trainer(precision=16)`,
reference train.py:280). On TPU the native mixed-precision story is
bfloat16 compute with float32 parameters/optimizer state and float32
softmax/layernorm accumulation; this module centralizes that policy so
every model takes a `DTypePolicy` instead of hardcoding dtypes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Dtype roles for one model.

    param_dtype:   storage dtype of parameters (f32 for training; bf16 for
                   inference-only replicas).
    compute_dtype: dtype activations/matmul inputs are cast to. MXU wants
                   bf16; parity tests use f32.
    accum_dtype:   accumulation dtype for attention logits / softmax /
                   layernorm statistics — always f32 on TPU.
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return x.astype(self.compute_dtype) if x.dtype != self.compute_dtype else x

    def cast_accum(self, x):
        return x.astype(self.accum_dtype) if x.dtype != self.accum_dtype else x


def default_policy(training: bool = True) -> DTypePolicy:
    return DTypePolicy(
        param_dtype=jnp.float32,
        compute_dtype=jnp.bfloat16,
        accum_dtype=jnp.float32,
    )


# Exact policy used by numerics-parity tests (matches torch fp32).
FP32 = DTypePolicy(
    param_dtype=jnp.float32, compute_dtype=jnp.float32, accum_dtype=jnp.float32
)

# Inference replica policy: bf16 weights, bf16 compute, f32 accumulation.
BF16_INFERENCE = DTypePolicy(
    param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32
)
