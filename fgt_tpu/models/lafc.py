"""LAFC — local-aggregation flow completion network (P3D, flax/NDHWC).

Capability parity with the reference (LAFC/models/lafc.py:6-148): P3D
encoder (spatial 1xkxk conv followed by temporal 3x1x1 conv), temporal
condense convs with kernel (num_flows, 1, 1) collapsing the flow-window
axis, optional P3D residual blocks, a 4-stage dilated 2D middle
(dilations 8/4/2/1), skip-concat decoders, a 2-channel flow head and a
sigmoid edge head.

Layout: ``[B, T, H, W, C]`` (NDHWC); T = num_flows stays intact through the
encoders and is collapsed by the condense convs, exactly like the
reference's Conv3d with temporal kernel = num_flows.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fgt_tpu.ops.conv_blocks import (conv_classes, leaky_relu_02,
                                     replication_pad)


def kaiming_fan_in():
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


@dataclasses.dataclass
class LAFCConfig:
    """Reference LAFC/config/train.yaml:51-68."""

    num_flows: int = 3
    cnum: int = 48
    in_channel: int = 3            # 2 flow + 1 mask when PASSMASK
    pass_mask: bool = True
    use_residual: bool = True
    res_blocks: int = 1
    use_bias: bool = True
    conv_type: str = "vanilla"
    use_edges: bool = False

    @classmethod
    def from_dict(cls, cfg: dict) -> "LAFCConfig":
        get = cfg.get
        return cls(
            num_flows=get("num_flows", 3),
            cnum=get("cnum", 48),
            in_channel=get("in_channel", 3),
            pass_mask=bool(get("PASSMASK", get("pass_mask", 1))),
            use_residual=bool(get("use_residual", 1)),
            res_blocks=get("resBlocks", get("res_blocks", 1)),
            use_bias=bool(get("use_bias", 1)),
            conv_type=get("conv_type", "vanilla"),
            use_edges=bool(get("use_edges", 0)),
        )


class P3DBlock(nn.Module):
    """(1, k, k) spatial conv then (3, 1, 1) temporal conv, optional residual
    (reference LAFC/models/lafc.py:108-125)."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool
    conv_type: str
    use_residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        Conv = conv_classes[self.conv_type][0]
        k = self.kernel_size
        y = Conv(self.features, (1, k, k), strides=(1, self.stride, self.stride),
                 padding=(0, self.padding, self.padding), use_bias=self.use_bias,
                 norm=None, kernel_init=kaiming_fan_in(), name="conv1")(
            x, train=train)
        y = Conv(self.features, (3, 1, 1), strides=1, padding=(1, 0, 0),
                 use_bias=self.use_bias, norm=None,
                 kernel_init=kaiming_fan_in(), name="conv2")(y, train=train)
        if self.use_residual:
            return x + y
        return y


class EdgeDetection(nn.Module):
    """Flow -> edge probability head (reference lafc.py:128-148)."""

    conv_type: str = "vanilla"
    mid_channels: int = 16
    out_channels: int = 1

    @nn.compact
    def __call__(self, flow, train: bool = False):
        Conv = conv_classes[self.conv_type][0]

        def block(feats, k, act, name):
            return Conv(feats, (k, k), strides=1, padding=(k - 1) // 2,
                        norm=None, activation=act,
                        kernel_init=kaiming_fan_in(), name=name)

        proj = block(self.mid_channels, 3, leaky_relu_02, "projection")(
            flow, train=train)
        e = block(self.mid_channels, 3, leaky_relu_02, "mid1")(proj, train=train)
        e = block(self.mid_channels, 3, None, "mid2")(e, train=train)
        e = nn.leaky_relu(proj + e, negative_slope=0.01)
        e = block(self.out_channels, 1, None, "out")(e, train=train)
        return nn.sigmoid(e)


class P3DNet(nn.Module):
    """The LAFC trunk (reference lafc.py:18-105).

    Note: the reference appends the SAME residual-block module instance
    ``res_blocks`` times, i.e. repeated blocks share weights
    (lafc.py:36-43). The default config uses res_blocks=1 where this is
    indistinguishable; we instantiate distinct blocks (strictly more
    expressive) and the weight converter maps the shared reference weights
    onto every repeat.
    """

    cfg: LAFCConfig

    @nn.compact
    def __call__(self, flows, masks, edges=None, train: bool = False):
        c = self.cfg
        Conv2, Deconv2 = conv_classes[c.conv_type]
        nf = c.cnum

        def conv2d(feats, act="default", name=None, dilation=1, padding=1):
            return Conv2(feats, (3, 3), strides=1, padding=padding,
                         dilation=dilation, use_bias=c.use_bias, norm=None,
                         activation=leaky_relu_02 if act == "default" else act,
                         kernel_init=kaiming_fan_in(), name=name)

        inputs = flows
        if c.pass_mask:
            inputs = jnp.concatenate([flows, masks], axis=-1)
        if edges is not None:
            inputs = jnp.concatenate([inputs, edges], axis=-1)

        # ---- encoder (P3D, T intact) ----
        x = replication_pad(inputs, 2)
        e2 = P3DBlock(nf, 5, 1, 0, c.use_bias, c.conv_type, False,
                      name="enc2_block0")(x, train=train)
        e2 = P3DBlock(nf * 2, 3, 2, 1, c.use_bias, c.conv_type, False,
                      name="enc2_block1")(e2, train=train)
        e4 = P3DBlock(nf * 2, 3, 1, 1, c.use_bias, c.conv_type,
                      c.use_residual, name="enc4_block0")(e2, train=train)
        e4 = P3DBlock(nf * 4, 3, 2, 1, c.use_bias, c.conv_type, False,
                      name="enc4_block1")(e4, train=train)

        # ---- temporal condense: Conv3d kernel (T, 1, 1), valid -> T=1 ----
        Conv3 = conv_classes[c.conv_type][0]

        def condense(feats, name):
            return Conv3(feats, (c.num_flows, 1, 1), strides=1, padding=0,
                         use_bias=c.use_bias, norm=None,
                         kernel_init=kaiming_fan_in(), name=name)

        c_e2_pre = condense(nf * 2, "condense2")(e2, train=train)[:, 0]
        c_e4_pre = condense(nf * 4, "condense4_pre")(e4, train=train)[:, 0]
        for i in range(c.res_blocks):
            e4 = P3DBlock(nf * 4, 3, 1, 1, c.use_bias, c.conv_type, True,
                          name=f"res{i}")(e4, train=train)
        c_e4_post = condense(nf * 4, "condense4_post")(e4, train=train)[:, 0]

        # ---- dilated 2D middle ----
        m = c_e4_post
        for i, d in enumerate((8, 4, 2, 1)):
            m = conv2d(nf * 4, name=f"middle{i}", dilation=d, padding=d)(
                m, train=train)

        # ---- skip-concat decoders ----
        y = jnp.concatenate([m, c_e4_pre], axis=-1)
        y = Deconv2(nf * 2, (3, 3), padding=1, use_bias=c.use_bias, norm=None,
                    kernel_init=kaiming_fan_in(), name="dec2_deconv")(
            y, train=train)
        y = conv2d(nf * 2, name="dec2_conv0")(y, train=train)
        y = conv2d(nf * 2, name="dec2_conv1")(y, train=train)

        y = jnp.concatenate([y, c_e2_pre], axis=-1)
        y = Deconv2(nf, (3, 3), padding=1, use_bias=c.use_bias, norm=None,
                    kernel_init=kaiming_fan_in(), name="dec_deconv")(
            y, train=train)
        y = conv2d(nf // 2, name="dec_conv0")(y, train=train)
        out = conv2d(2, act=None, name="dec_conv1")(y, train=train)

        edge = EdgeDetection(c.conv_type, name="edge_detector")(
            out, train=train)
        return out, edge


class Model(nn.Module):
    """Reference-compatible wrapper: ``Model(config)(flows, masks, edges)``
    with flows/masks as ``[B, T, H, W, C]``; returns (flow [B,H,W,2], edge)."""

    config: dict

    def setup(self):
        self.net = P3DNet(LAFCConfig.from_dict(self.config))

    def __call__(self, flows, masks, edges=None, **kw):
        return self.net(flows, masks, edges, **kw)
