"""Temporal PatchGAN discriminator (flax/NDHWC).

Capability parity with the reference T-PatchGAN
(FGT/models/temporal_patch_gan.py:7-76): six 3D convolutions with kernel
(3, 5, 5), stride (1, 2, 2), spectral norm on all but the last, LeakyReLU
between, optional sigmoid. Consumes video as ``[B, T, H, W, C]`` so the
temporal axis maps to the conv depth dimension.
"""

from __future__ import annotations

from flax import linen as nn

from fgt_tpu.ops.conv_blocks import ConvND, leaky_relu_02


def kaiming_fan_in():
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class TemporalPatchGAN(nn.Module):
    in_channels: int = 3
    dist_cnum: int = 32
    use_sigmoid: bool = False
    use_spectral_norm: bool = True

    @nn.compact
    def __call__(self, x, sn_update: bool = False):
        """x: [B, T, H, W, C] -> patch logits [B, T, H', W', C']."""
        nf = self.dist_cnum
        widths = [nf, nf * 2, nf * 4, nf * 4, nf * 4]
        y = x
        for i, width in enumerate(widths):
            y = ConvND(width, (3, 5, 5), strides=(1, 2, 2), padding=(1, 2, 2),
                       use_bias=not self.use_spectral_norm,
                       spectral_norm=self.use_spectral_norm,
                       kernel_init=kaiming_fan_in(),
                       name=f"conv{i}")(y, sn_update=sn_update)
            y = leaky_relu_02(y)
        y = ConvND(nf * 4, (3, 5, 5), strides=(1, 2, 2), padding=(1, 2, 2),
                   use_bias=True, kernel_init=kaiming_fan_in(),
                   name="conv5")(y)
        if self.use_sigmoid:
            y = nn.sigmoid(y)
        return y
