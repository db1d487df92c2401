"""Transformer feed-forward blocks for FGT.

``FusionFeedForward`` is the T2T-style FFN of the reference
(FGT/models/transformer_base/ffn_base.py:33-77): Dense up-projection, then a
fold -> overlap-average -> unfold smoothing in patch space (tokens are
interpreted as ``hidden/ (kh*kw)`` channels at ``kh x kw`` patch positions),
then Dense down-projection. The fold/unfold pair is the exact torch adjoint
implemented in :mod:`fgt_tpu.ops.fold`.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from fgt_tpu.ops.fold import fold_average, unfold


class FeedForward(nn.Module):
    """Plain MLP FFN (reference ffn_base.py:8-30)."""

    d_model: int
    mlp_ratio: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.Dense(self.d_model * self.mlp_ratio)(x)
        y = nn.relu(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model)(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y


class FusionFeedForward(nn.Module):
    """T2T fusion FFN with fold/unfold token-overlap averaging."""

    d_model: int
    mlp_ratio: int
    kernel_size: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray, output_size: tuple,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: [B, N, d_model]; output_size: token-grid source (H/4, W/4)."""
        kshape = int(self.kernel_size[0] * self.kernel_size[1])
        hidden = kshape * self.mlp_ratio
        y = nn.Dense(hidden, name="conv1")(x)
        b, n, c = y.shape
        # tokens -> patch space: channels c-major over (mlp_ratio) channels
        img = fold_average(y, output_size, self.kernel_size, self.stride,
                           self.padding)
        y = unfold(img, self.kernel_size, self.stride, self.padding)
        y = y.reshape(b, n, c)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, name="conv2")(y)
        return y
