"""FGT generator — flow-guided transformer video inpainter (flax/NHWC).

Capability-parity reimplementation of the reference generator
(FGT/models/model.py:12-283): frame encoder with group-fusion skips, flow
encoder, conv patch embedding, alternating temporal / flow-guided-spatial
window transformer blocks with fusion FFNs, patch fold, conv decoder, tanh.

TPU-first choices:
* channel-last layouts throughout; the (b, t) axes stay folded as one batch
  axis for every convolution so the MXU sees large batched GEMMs;
* one code path for all resolutions — JAX traces per static (t, h, w), which
  subsumes the reference's separate train/inference branches
  (model.py:265-269);
* fold/unfold are torch-exact adjoint pairs (fgt_tpu.ops.fold) so converted
  reference weights reproduce activations.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fgt_tpu.ops.attention import TMHSA, FlowGuidedSWMHSA
from fgt_tpu.ops.conv_blocks import (ConvND, VanillaConv, VanillaDeconv,
                                     conv_classes, leaky_relu_02,
                                     replication_pad)
from fgt_tpu.ops.ffn import FusionFeedForward
from fgt_tpu.ops.fold import fold, output_size as fold_output_size


def normal_init(gain: float = 0.02):
    return nn.initializers.normal(stddev=gain)


@dataclasses.dataclass
class FGTConfig:
    """Model hyperparameters (reference FGT/config/train.yaml:58-90)."""

    in_channel: int = 4            # rgb + mask when PASSMASK
    cnum: int = 64
    flow_in_channel: int = 2
    flow_cnum: int = 64
    frame_hidden: int = 512
    flow_hidden: int = 256
    num_blocks: int = 8
    kernel_size: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (3, 3)
    num_heads: int = 4
    conv_type: str = "vanilla"
    norm: Optional[str] = None
    use_bias: bool = True
    ape: bool = True               # add positional embedding
    mlp_ratio: int = 40
    drop: float = 0.0
    pass_mask: bool = True
    tw: int = 2                    # temporal group size
    sw: int = 8                    # spatial window size
    gd: int = 4                    # global token downsample stride
    input_resolution: Tuple[int, int] = (240, 432)
    use_flash: bool = False        # fused Pallas temporal attention
                                   # (differentiable: Pallas dq/dkv custom
                                   # VJP; off by default so CPU tests use
                                   # the XLA path)
    seq_axis: Optional[str] = None  # Ulysses temporal sequence parallelism:
                                    # mesh axis sharding the folded (b*t)
                                    # frame axis through the conv/FFN trunk,
                                    # with head-scatter all-to-alls inside
                                    # TMHSA (ops/attention.py); needs an
                                    # active mesh (jax.sharding.set_mesh)

    @classmethod
    def from_dict(cls, cfg: dict) -> "FGTConfig":
        get = cfg.get
        ks = cfg.get("kernel_size") or (get("kernel_size_h", 7), get("kernel_size_w", 7))
        st = cfg.get("stride") or (get("stride_h", 3), get("stride_w", 3))
        pd = cfg.get("padding") or (get("pad_h", 3), get("pad_w", 3))
        res = cfg.get("input_resolution") or (get("res_h", 240), get("res_w", 432))
        return cls(
            in_channel=get("in_channel", 4),
            cnum=get("cnum", 64),
            flow_in_channel=get("flow_inChannel", get("flow_in_channel", 2)),
            flow_cnum=get("flow_cnum", 64),
            frame_hidden=get("frame_hidden", 512),
            flow_hidden=get("flow_hidden", 256),
            num_blocks=get("numBlocks", get("num_blocks", 8)),
            kernel_size=tuple(ks), stride=tuple(st), padding=tuple(pd),
            num_heads=get("num_head", get("num_heads", 4)),
            conv_type=get("conv_type", "vanilla"),
            norm=None if str(get("norm", None)) in ("None", "none") else get("norm"),
            use_bias=bool(get("use_bias", 1)),
            ape=bool(get("ape", 1)),
            mlp_ratio=get("mlp_ratio", 40),
            drop=get("drop", 0.0),
            pass_mask=bool(get("PASSMASK", get("pass_mask", 1))),
            tw=get("tw", 2), sw=get("sw", 8), gd=get("gd", 4),
            input_resolution=tuple(res),
            use_flash=bool(get("use_flash", 0)),
            seq_axis=get("seq_axis", None),
        )


class FrameEncoder(nn.Module):
    """9-conv frame encoder with grouped skip fusion
    (reference Encoder, model.py:28-66).

    The reference hardcodes widths for cnum=64 (64, 64, 128, 256, 384, then
    512/384/256/128 on grouped-fused inputs); we express them as multiples
    of ``cnum`` — identical at the reference scale, and consistent for
    smaller test configs. Output width is ``2 * cnum``.
    """

    in_channels: int = 4
    cnum: int = 64
    kernel_init: nn.initializers.Initializer = normal_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cnum

        def conv(feats, k=3, s=1, g=1, name=None):
            return ConvND(feats, (k, k), strides=s, padding=1, groups=g,
                          kernel_init=self.kernel_init, name=name)

        act = leaky_relu_02
        out = act(conv(c, s=2, name="conv0")(x))
        out = act(conv(c, name="conv1")(out))
        out = act(conv(2 * c, s=2, name="conv2")(out))
        out = act(conv(4 * c, name="conv3")(out))
        x0 = out  # 4c-channel feature reused by every fusion stage
        out = act(conv(6 * c, name="conv4")(out))

        def fuse(skip, y, g):
            bt, h, w, cs = skip.shape
            cy = y.shape[-1]
            s = skip.reshape(bt, h, w, g, cs // g)
            o = y.reshape(bt, h, w, g, cy // g)
            return jnp.concatenate([s, o], axis=-1).reshape(bt, h, w, cs + cy)

        out = act(conv(8 * c, g=2, name="conv5")(fuse(x0, out, 2)))
        out = act(conv(6 * c, g=4, name="conv6")(fuse(x0, out, 4)))
        out = act(conv(4 * c, g=8, name="conv7")(fuse(x0, out, 8)))
        out = act(conv(2 * c, g=1, name="conv8")(fuse(x0, out, 1)))
        return out  # [bt, h/4, w/4, 2*cnum]


class FlowEncoder(nn.Module):
    """Replication-pad + 4 conv blocks (reference model.py:206-212)."""

    cfg: FGTConfig
    kernel_init: nn.initializers.Initializer = normal_init()

    @nn.compact
    def __call__(self, f: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.cfg
        Conv = conv_classes[c.conv_type][0]

        def block(feats, k, s, p, name):
            return Conv(feats, (k, k), strides=s, padding=p, use_bias=c.use_bias,
                        norm=c.norm, kernel_init=self.kernel_init, name=name)

        f = replication_pad(f, 2)
        f = block(c.flow_cnum, 5, 1, 0, "block0")(f, train=train)
        f = block(c.flow_cnum * 2, 3, 2, 1, "block1")(f, train=train)
        f = block(c.flow_cnum * 2, 3, 1, 1, "block2")(f, train=train)
        f = block(c.flow_cnum * 2, 3, 2, 1, "block3")(f, train=train)
        return f  # [bt, h/4, w/4, 2*flow_cnum]


class AddPosEmb(nn.Module):
    """Depthwise 3x3 conv positional encoding generator, residual
    (reference model.py:69-88, PEG of CPVT)."""

    channels: int
    kernel_init: nn.initializers.Initializer = normal_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, c = x.shape
        assert n == h * w, "Wrong input size"
        feat = x.reshape(b, h, w, c)
        proj = ConvND(self.channels, (3, 3), strides=1, padding=1,
                      groups=self.channels, use_bias=True,
                      kernel_init=self.kernel_init, name="proj")(feat)
        return (proj + feat).reshape(b, n, c)


class Vec2Patch(nn.Module):
    """Linear token -> patch embedding + fold (reference model.py:91-110)."""

    channels: int
    kernel_size: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    kernel_init: nn.initializers.Initializer = normal_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray, out_spatial: tuple) -> jnp.ndarray:
        k = tuple(self.kernel_size)
        c_out = k[0] * k[1] * self.channels
        feat = nn.Dense(c_out, kernel_init=self.kernel_init,
                        name="embedding")(x)
        return fold(feat, out_spatial, k, tuple(self.stride),
                    tuple(self.padding), channels=self.channels)


class TemporalTransformer(nn.Module):
    """Pre-norm TMHSA + fusion FFN (reference model.py:113-130)."""

    cfg: FGTConfig

    @nn.compact
    def __call__(self, x, t: int, h: int, w: int, output_size: tuple,
                 deterministic: bool = True):
        c = self.cfg
        s = nn.LayerNorm(name="norm1")(x)
        att = TMHSA(d_model=c.frame_hidden, group_size=c.tw,
                    num_heads=c.num_heads, dropout=c.drop,
                    use_flash=c.use_flash, seq_axis=c.seq_axis,
                    name="attention")(s, t, h, w, deterministic=deterministic)
        if c.drop > 0:
            att = nn.Dropout(c.drop)(att, deterministic=deterministic)
        x = x + att
        y = nn.LayerNorm(name="norm2")(x)
        x = x + FusionFeedForward(
            d_model=c.frame_hidden, mlp_ratio=c.mlp_ratio,
            kernel_size=c.kernel_size, stride=c.stride, padding=c.padding,
            name="ffn")(y, output_size, deterministic=deterministic)
        return x


class SpatialTransformer(nn.Module):
    """Flow-guided SWMHSA + fusion FFN. Note the reference applies the
    spatial attention on the RAW (un-normalized) stream and LayerNorms only
    before the FFN (model.py:133-149) — preserved here."""

    cfg: FGTConfig

    @nn.compact
    def __call__(self, x, f, t: int, h: int, w: int, output_size: tuple,
                 deterministic: bool = True):
        c = self.cfg
        att = FlowGuidedSWMHSA(
            d_model=c.frame_hidden, flow_d_model=c.flow_hidden,
            window_size=c.sw, global_stride=c.gd, num_heads=c.num_heads,
            dropout=c.drop, name="attention")(x, f, h, w,
                                              deterministic=deterministic)
        if c.drop > 0:
            att = nn.Dropout(c.drop)(att, deterministic=deterministic)
        x = x + att
        y = nn.LayerNorm(name="norm")(x)
        x = x + FusionFeedForward(
            d_model=c.frame_hidden, mlp_ratio=c.mlp_ratio,
            kernel_size=c.kernel_size, stride=c.stride, padding=c.padding,
            name="ffn")(y, output_size, deterministic=deterministic)
        return x


class Decoder(nn.Module):
    """Deconv x2 / conv decoder back to RGB (reference model.py:176-193)."""

    cfg: FGTConfig
    kernel_init: nn.initializers.Initializer = normal_init()

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        Conv, Deconv = conv_classes[c.conv_type]
        in_c = c.cnum * 2
        x = Deconv(in_c, (3, 3), padding=1, norm=c.norm, use_bias=c.use_bias,
                   kernel_init=self.kernel_init, name="layer1")(x, train=train)
        x = Conv(in_c // 2, (3, 3), strides=1, padding=1, norm=c.norm,
                 use_bias=c.use_bias, kernel_init=self.kernel_init,
                 name="layer2")(x, train=train)
        x = Deconv(in_c // 2, (3, 3), padding=1, norm=c.norm,
                   use_bias=c.use_bias, kernel_init=self.kernel_init,
                   name="layer3")(x, train=train)
        x = Conv(3, (3, 3), strides=1, padding=1, norm=c.norm,
                 use_bias=c.use_bias, activation=None,
                 kernel_init=self.kernel_init, name="final")(x, train=train)
        return x


class FGT(nn.Module):
    """Full generator. Inputs are channel-last video tensors:

    * masked_frames ``[B, T, H, W, 3]`` in [-1, 1]
    * flows         ``[B, T, H, W, 2]`` (completed + max-normalized)
    * masks         ``[B, T, H, W, 1]`` (1 = hole)

    Returns inpainted frames ``[B, T, H, W, 3]`` in [-1, 1] (tanh).
    """

    cfg: FGTConfig

    @nn.compact
    def __call__(self, masked_frames, flows, masks, *, train: bool = False,
                 deterministic: bool = True):
        c = self.cfg
        B, T, H, W, _ = masked_frames.shape
        out_spatial = (H // 4, W // 4)

        inputs = masked_frames
        if c.pass_mask:
            inputs = jnp.concatenate([masked_frames, masks], axis=-1)
        x = inputs.reshape(B * T, H, W, c.in_channel)
        f = flows.reshape(B * T, H, W, c.flow_in_channel)
        if c.seq_axis is not None:
            # temporal sequence parallelism: every per-frame stage (conv
            # encoders, FFN fold/unfold, spatial attention, decoder) runs
            # with the folded frame axis sharded over the mesh; only TMHSA
            # re-scatters (ops/attention.py). Pin the layout at the trunk
            # entry so the partitioner propagates it end to end.
            from fgt_tpu.ops.attention import _constrain

            x = _constrain(x, c.seq_axis, 0)
            f = _constrain(f, c.seq_axis, 0)

        enc_feats = FrameEncoder(in_channels=c.in_channel, cnum=c.cnum,
                                 name="frame_encoder")(x)
        flow_feats = FlowEncoder(c, name="flow_encoder")(f, train=train)

        trans_feat = ConvND(c.frame_hidden, c.kernel_size, strides=c.stride,
                            padding=c.padding, kernel_init=normal_init(),
                            name="patch2vec")(enc_feats)
        flow_patch = ConvND(c.flow_hidden, c.kernel_size, strides=c.stride,
                            padding=c.padding, kernel_init=normal_init(),
                            name="f_patch2vec")(flow_feats)

        th, tw_ = trans_feat.shape[1], trans_feat.shape[2]
        trans_feat = trans_feat.reshape(B * T, th * tw_, c.frame_hidden)
        flow_patch = flow_patch.reshape(B * T, th * tw_, c.flow_hidden)

        trans_feat = TemporalTransformer(c, name="first_t_transformer")(
            trans_feat, T, th, tw_, out_spatial, deterministic=deterministic)
        if c.ape:
            trans_feat = AddPosEmb(c.frame_hidden, name="add_pos_emb")(
                trans_feat, th, tw_)
        trans_feat = SpatialTransformer(c, name="first_s_transformer")(
            trans_feat, flow_patch, T, th, tw_, out_spatial,
            deterministic=deterministic)

        for i in range(c.num_blocks // 2 - 1):
            trans_feat = TemporalTransformer(c, name=f"block{i}_t")(
                trans_feat, T, th, tw_, out_spatial,
                deterministic=deterministic)
            trans_feat = SpatialTransformer(c, name=f"block{i}_s")(
                trans_feat, flow_patch, T, th, tw_, out_spatial,
                deterministic=deterministic)

        patches = Vec2Patch(c.cnum * 2, c.kernel_size, c.stride, c.padding,
                            name="vec2patch")(trans_feat, out_spatial)
        enc_feats = enc_feats + patches

        out = Decoder(c, name="decoder")(enc_feats, train=train)
        out = jnp.tanh(out)
        return out.reshape(B, T, H, W, 3)


class Model(nn.Module):
    """Reference-compatible wrapper: ``Model(config).forward(frames, flows,
    masks)`` (reference model.py:12-25)."""

    config: dict

    def setup(self):
        self.net = FGT(FGTConfig.from_dict(self.config))

    def __call__(self, frames, flows, masks, **kw):
        return self.net(frames, flows, masks, **kw)
