"""LAFC-single — 2D single-flow completion network (flax/NHWC).

Capability parity with the reference (LAFC/models/lafc_single.py:9-112,
byte-near-identical copy at FGT/models/lafc_single.py): the LAFC topology
with every P3D block replaced by a plain 2D conv, one flow in / one flow
out. Used frozen as the cheap flow oracle during FGT training
(FGT/networks/network.py:43-49).

Reference quirk preserved: the FINAL decoder conv of lafc_single does NOT
pass ``activation=None`` (lafc_single.py:63), so the predicted flow passes
through a LeakyReLU(0.2) — unlike lafc.py whose flow head is linear. The
pretrained weights compensate for this; we replicate it for weight parity.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from fgt_tpu.models.lafc import EdgeDetection, LAFCConfig, kaiming_fan_in
from fgt_tpu.ops.conv_blocks import (conv_classes, leaky_relu_02,
                                     replication_pad)


class ResidualBlockNoBN(nn.Module):
    """Conv-LReLU-Conv residual block, no norm
    (reference FGT/models/utils/reconstructionLayers.py:27-48)."""

    features: int

    @nn.compact
    def __call__(self, x):
        from fgt_tpu.ops.conv_blocks import ConvND

        y = ConvND(self.features, (3, 3), strides=1, padding=1, use_bias=True,
                   kernel_init=kaiming_fan_in(), name="conv1")(x)
        y = leaky_relu_02(y)
        y = ConvND(self.features, (3, 3), strides=1, padding=1, use_bias=True,
                   kernel_init=kaiming_fan_in(), name="conv2")(y)
        return x + y


class P3DNetSingle(nn.Module):
    cfg: LAFCConfig

    @nn.compact
    def __call__(self, flow, mask, edge=None, train: bool = False):
        c = self.cfg
        Conv2, Deconv2 = conv_classes[c.conv_type]
        nf = c.cnum

        def conv2d(feats, k=3, s=1, p=1, act="default", dilation=1, name=None):
            return Conv2(feats, (k, k), strides=s, padding=p,
                         dilation=dilation, use_bias=c.use_bias, norm=None,
                         activation=leaky_relu_02 if act == "default" else act,
                         kernel_init=kaiming_fan_in(), name=name)

        inputs = flow
        if c.pass_mask:
            inputs = jnp.concatenate([flow, mask], axis=-1)
        if edge is not None:
            inputs = jnp.concatenate([inputs, edge], axis=-1)

        x = replication_pad(inputs, 2)
        e2 = conv2d(nf, k=5, p=0, name="enc2_conv0")(x, train=train)
        e2 = conv2d(nf * 2, s=2, name="enc2_conv1")(e2, train=train)
        e4 = conv2d(nf * 2, name="enc4_conv0")(e2, train=train)
        e4 = conv2d(nf * 4, s=2, name="enc4_conv1")(e4, train=train)

        y = e4
        for i in range(c.res_blocks):
            y = ResidualBlockNoBN(nf * 4, name=f"res{i}")(y)

        for i, d in enumerate((8, 4, 2, 1)):
            y = conv2d(nf * 4, dilation=d, p=d, name=f"middle{i}")(
                y, train=train)

        y = jnp.concatenate([y, e4], axis=-1)
        y = Deconv2(nf * 2, (3, 3), padding=1, use_bias=c.use_bias, norm=None,
                    kernel_init=kaiming_fan_in(), name="dec2_deconv")(
            y, train=train)
        y = conv2d(nf * 2, name="dec2_conv0")(y, train=train)
        y = conv2d(nf * 2, name="dec2_conv1")(y, train=train)

        y = jnp.concatenate([y, e2], axis=-1)
        y = Deconv2(nf, (3, 3), padding=1, use_bias=c.use_bias, norm=None,
                    kernel_init=kaiming_fan_in(), name="dec_deconv")(
            y, train=train)
        y = conv2d(nf // 2, name="dec_conv0")(y, train=train)
        # quirk: default activation retained on the flow head (see module doc)
        out = conv2d(2, name="dec_conv1")(y, train=train)

        edge_pred = EdgeDetection(c.conv_type, name="edge_detector")(
            out, train=train)
        return out, edge_pred


class Model(nn.Module):
    """``Model(config)(flow [B,H,W,2], mask [B,H,W,1])`` -> (flow, edge)."""

    config: dict

    def setup(self):
        self.net = P3DNetSingle(LAFCConfig.from_dict(self.config))

    def __call__(self, flow, mask, edge=None, **kw):
        return self.net(flow, mask, edge, **kw)
