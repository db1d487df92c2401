"""Reconstruction layers (reference FGT/models/utils/reconstructionLayers.py).

The reference models use only ``ResidualBlock_noBN`` (via LAFC-single);
``ResBlock_noBN_new`` and ``CCALayer`` are part of the published block
library, so they ship here for capability parity. Layouts are channel-last
(NHWC for 2D, NTHWC for the 3D block).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from fgt_tpu.models.lafc_single import ResidualBlockNoBN  # noqa: F401  (re-export)


def leaky_relu_02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def make_layer(block_fn, n_layers: int):
    """Sequential stack factory (reference reconstructionLayers.py:27-31).

    ``block_fn(i)`` builds the i-th block module; returns a callable
    applying them in order.
    """
    blocks = [block_fn(i) for i in range(n_layers)]

    def apply(x):
        for b in blocks:
            x = b(x)
        return x

    return apply


def mean_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Per-(batch, channel) spatial mean, kept as [B, 1, 1, C]
    (reference :131-134 operates on NCHW; ours is NHWC)."""
    assert x.ndim == 4, f"want NHWC, got {x.shape}"
    return x.mean(axis=(1, 2), keepdims=True)


def stdv_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Per-(batch, channel) spatial std (biased, like the reference
    :137-141)."""
    assert x.ndim == 4, f"want NHWC, got {x.shape}"
    m = mean_channels(x)
    var = ((x - m) ** 2).mean(axis=(1, 2), keepdims=True)
    return jnp.sqrt(var)


class ResBlockNoBNNew(nn.Module):
    """Multi-dilation (1/2/4/8) spatial residual block over [B, T, H, W, C]
    (reference :64-95: (1,3,3) convs, progressive-sum concat, LeakyReLU)."""

    features: int

    @nn.compact
    def __call__(self, x):
        nf4 = self.features // 4
        y = leaky_relu_02(nn.Conv(nf4, (1, 3, 3), padding=(0, 1, 1),
                                  name="c1")(x))
        d1 = nn.Conv(nf4, (1, 3, 3), padding=(0, 1, 1), name="d1")(y)
        d2 = nn.Conv(nf4, (1, 3, 3), padding=(0, 2, 2),
                     kernel_dilation=(1, 2, 2), name="d2")(y)
        d3 = nn.Conv(nf4, (1, 3, 3), padding=(0, 4, 4),
                     kernel_dilation=(1, 4, 4), name="d3")(y)
        d4 = nn.Conv(nf4, (1, 3, 3), padding=(0, 8, 8),
                     kernel_dilation=(1, 8, 8), name="d4")(y)
        add1 = d1 + d2
        add2 = add1 + d3
        add3 = add2 + d4
        combine = jnp.concatenate([d1, add1, add2, add3], axis=-1)
        out = nn.Conv(self.features, (1, 3, 3), padding=(0, 1, 1),
                      name="c2")(leaky_relu_02(combine))
        return x + out


class CCALayer(nn.Module):
    """Contrast-channel-attention residual block (reference :98-128):
    conv-lrelu-conv, then a per-channel gate from contrast (std) + mean
    through a 1x1 bottleneck with tanh."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = leaky_relu_02(nn.Conv(self.features, (3, 3), padding=1,
                                  name="conv1")(x))
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        stat = stdv_channels(y) + mean_channels(y)      # [B, 1, 1, C]
        g = nn.Conv(4, (1, 1), name="du1")(stat)
        g = nn.relu(g)
        g = jnp.tanh(nn.Conv(self.features, (1, 1), name="du2")(g))
        return g * stat + x
