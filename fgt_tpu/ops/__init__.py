"""Reusable network building blocks (flax.linen, NHWC/NDHWC layouts)."""

from fgt_tpu.ops.conv_blocks import (
    VanillaConv,
    VanillaDeconv,
    GatedConv,
    GatedDeconv,
    PartialConv,
    PartialDeconv,
    conv_classes,
)
