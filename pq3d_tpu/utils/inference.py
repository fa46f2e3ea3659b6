"""Inference-serving helpers.

``cast_params_bf16`` converts a variables pytree to bfloat16 for serving:
with bf16 params AND bf16 activations every matmul runs at the MXU's bf16
rate and HBM traffic halves (flax Dense with dtype=None promotes to the
widest input dtype, so casting parameters alone flips the whole forward
once the inputs follow).  f32 is kept for training; this is the standard
TPU serving configuration.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_params_bf16(variables: Any) -> Any:
    """Cast every float32 leaf (params, batch_stats, ...) to bfloat16.

    Integer leaves (embedding ids, index tables) are untouched.  Note norm
    scales/stats are cast too — keeping them f32 would re-promote every
    following matmul back to f32 and defeat the cast.
    """
    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x
    return jax.tree.map(cast, variables)


def cast_batch_bf16(batch: Any) -> Any:
    """Cast float32 batch arrays to bfloat16 (pair with cast_params_bf16:
    flax promotes bf16 params back to f32 wherever an f32 input flows in,
    so the inputs must follow for the serving cast to take effect)."""
    return cast_params_bf16(batch)
