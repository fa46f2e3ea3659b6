"""Coordinate positional encodings.

JAX re-design of the Fourier/sine coordinate embedding used by the reference
(reference: modules/third_party/mask3d/position_embedding.py:46-179 and the
CoordinateEncoder wrapper at model/query3d_unified.py:15-27).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.models.layers import dense_init


def shift_scale_points(xyz: jnp.ndarray, src_range: Tuple[jnp.ndarray, jnp.ndarray]
                       ) -> jnp.ndarray:
    """Normalize (B, N, 3) points from [min, max] to [0, 1] per batch."""
    lo, hi = src_range
    diff = jnp.maximum(hi - lo, 1e-6)
    return (xyz - lo[:, None, :]) / diff[:, None, :]


class FourierPositionEncoding(nn.Module):
    """Gaussian Fourier features of 3D coordinates -> d_pos channels.

    The Gaussian projection matrix is a fixed (non-trainable) buffer drawn
    at init, like the reference's ``gauss_B`` (position_embedding.py:72-74).
    """
    d_pos: int
    d_in: int = 3
    gauss_scale: float = 1.0
    normalize: bool = True

    @nn.compact
    def __call__(self, xyz: jnp.ndarray,
                 input_range: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                 ) -> jnp.ndarray:
        assert self.d_pos % 2 == 0
        gauss_b = self.variable(
            "buffers", "gauss_B",
            lambda: nn.initializers.normal(stddev=1.0)(
                self.make_rng("params"), (self.d_in, self.d_pos // 2),
                jnp.float32) * self.gauss_scale).value
        x = xyz.astype(jnp.float32)
        if self.normalize and input_range is not None:
            x = shift_scale_points(x, input_range)
        x = x * (2 * math.pi)
        proj = jnp.einsum("bnd,df->bnf", x, gauss_b)
        out = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        # sin/cos computed in f32 for precision; emit the caller's dtype so
        # a bf16 serving cast (utils/inference.py) is not re-promoted to f32
        return out.astype(xyz.dtype)


class CoordinateEncoder(nn.Module):
    """Fourier PE + Linear/LayerNorm projection
    (ref model/query3d_unified.py:15-27)."""
    hidden_size: int
    use_projection: bool = True

    @nn.compact
    def __call__(self, coords: jnp.ndarray,
                 input_range: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                 ) -> jnp.ndarray:
        pos = FourierPositionEncoding(self.hidden_size, name="pos_enc")(
            coords, input_range)
        if self.use_projection:
            pos = nn.Dense(self.hidden_size, kernel_init=dense_init)(pos)
            pos = nn.LayerNorm()(pos)
        return pos
