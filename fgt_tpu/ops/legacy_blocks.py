"""Legacy building blocks from the reference's utility layer.

Capability-parity port of ``FGT/models/utils/util.py:125-329`` (and the
LAFC copy): ASPP, gated 2D/3D convs with optional spectral norm, and
their resize-deconv variants. These are dead code in the reference's
shipped models (nothing imports them), but they are part of its public
block library, so they exist here as idiomatic channel-last flax modules
built on :class:`fgt_tpu.ops.conv_blocks.ConvND` (which carries the
torch-compatible padding semantics and the SN power-iteration state).

The legacy 3D "Discriminator" in the same file (`util.py:66-122`,
marked "todo: debug" upstream) is the T-PatchGAN; its maintained
equivalent lives in :mod:`fgt_tpu.models.discriminator`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgt_tpu.ops.conv_blocks import ConvND


def _leaky(x):
    return nn.leaky_relu(x, 0.2)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference util.py:125-144).

    The input is pre-scaled by ``1/len(rates)``; each branch is a 3x3
    dilated conv (padding == dilation, torch semantics) + LeakyReLU(0.2)
    producing ``out_channels // len(rates)`` features; branch outputs
    concatenate on the channel axis. Input: ``[B, H, W, C]``.
    """

    out_channels: int
    rates: Sequence[int] = (1, 2, 4, 8)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x / len(self.rates)
        outs = []
        for i, r in enumerate(self.rates):
            y = ConvND(self.out_channels // len(self.rates), (3, 3),
                       padding=r, dilation=r, name=f"conv{i:02d}")(x)
            outs.append(_leaky(y))
        return jnp.concatenate(outs, axis=-1)


class GatedConv2dWithActivation(nn.Module):
    """``act(conv(x)) * sigmoid(mask_conv(x))`` (util.py:147-183; the SN
    variant at :208-243 is ``spectral_norm=True``). NHWC."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    spectral_norm: bool = False
    use_activation: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, sn_update: bool = False):
        kw = dict(kernel_size=self.kernel_size, strides=self.strides,
                  padding=self.padding, dilation=self.dilation,
                  spectral_norm=self.spectral_norm)
        feat = ConvND(self.features, name="conv", **kw)(x, sn_update)
        gate = ConvND(self.features, name="mask_conv", **kw)(x, sn_update)
        if self.use_activation:
            feat = _leaky(feat)
        return feat * nn.sigmoid(gate)


class GatedDeConv2dWithActivation(nn.Module):
    """Nearest-resize upsample then gated conv (util.py:186-205 /
    SN variant :245-263)."""

    scale_factor: int
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, sn_update: bool = False):
        b, h, w, c = x.shape
        x = jax.image.resize(
            x, (b, h * self.scale_factor, w * self.scale_factor, c),
            method="nearest")
        return GatedConv2dWithActivation(
            self.features, self.kernel_size, self.strides, self.padding,
            spectral_norm=self.spectral_norm, name="conv2d")(x, sn_update)


class GatedConv3d(nn.Module):
    """3D gated conv: ``act(conv(x)) * sigmoid(gating(x))``
    (util.py:266-281). Input ``[B, T, H, W, C]`` (NDHWC)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        kw = dict(kernel_size=self.kernel_size, strides=self.strides,
                  padding=self.padding)
        feat = _leaky(ConvND(self.features, name="input_conv", **kw)(x))
        gate = ConvND(self.features, name="gating_conv", **kw)(x)
        return feat * nn.sigmoid(gate)


class GatedDeconv3d(nn.Module):
    """Spatial-only nearest upsample then 3D gated conv
    (util.py:284-294; temporal axis is never scaled)."""

    scale_factor: int
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, t, h, w, c = x.shape
        x = jax.image.resize(
            x, (b, t, h * self.scale_factor, w * self.scale_factor, c),
            method="nearest")
        return GatedConv3d(self.features, self.kernel_size, self.strides,
                           self.padding, name="deconv")(x)


def trunc_normal_init(std: float = 1.0, mean: float = 0.0,
                      a: float = -2.0, b: float = 2.0):
    """Truncated-normal initializer matching ``trunc_normal_``
    (util.py:297-329): samples from N(mean, std) clipped to [a, b]."""

    def init(key, shape, dtype=jnp.float32):
        # jax's truncated_normal samples std-normal truncated to
        # [lower, upper]; rescale to the requested mean/std
        lower = (a - mean) / std
        upper = (b - mean) / std
        return (jax.random.truncated_normal(key, lower, upper, shape,
                                            dtype) * std + mean)

    return init
