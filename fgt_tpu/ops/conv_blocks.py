"""Conv block family: vanilla / gated / partial, 2D and 3D, with optional
spectral normalization — the TPU-native counterpart of the reference's
network_blocks(_2d).py factories (LAFC/models/utils/network_blocks.py:7-185,
network_blocks_2d.py:7-186).

Layout is channel-last (NHWC / NDHWC) so convolutions tile directly onto the
MXU. A single rank-generic ``ConvND`` owns the kernel parameter and the
optional spectral-norm power-iteration state; the block classes compose it
with the reference's activation->norm ordering and resize-then-conv deconvs.

Reference semantic quirks preserved:
* activation is applied BEFORE the norm layer (VanillaConv.forward order);
* deconv = nearest-neighbor x2 upsample, then conv;
* ``padding=-1`` means "same"-style ((k-1)*dilation)//2;
* partial conv renormalizes by the mask-sum and zeroes fully-masked windows.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _tuple(v, n):
    if isinstance(v, int):
        return (v,) * n
    v = tuple(v)
    assert len(v) == n, f"expected rank-{n} tuple, got {v}"
    return v


def resolve_padding(kernel_size, dilation, padding, rank):
    """Torch-style int/tuple padding (with -1 == 'same') -> lax pairs."""
    k = _tuple(kernel_size, rank)
    d = _tuple(dilation, rank)
    if padding == -1:
        p = tuple(((k[i] - 1) * d[i]) // 2 for i in range(rank))
    else:
        p = _tuple(padding, rank)
    return tuple((pi, pi) for pi in p)


def leaky_relu_02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


_DIM_NUMBERS = {2: ("NHWC", "HWIO", "NHWC"), 3: ("NDHWC", "DHWIO", "NDHWC")}


class ConvND(nn.Module):
    """Bare N-D convolution with torch-compatible options + spectral norm.

    Spectral norm follows torch.nn.utils.spectral_norm: one power-iteration
    step per training call on the (out, rest) kernel matrix, with the ``u``
    vector kept in the mutable ``"spectral"`` variable collection.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    spectral_norm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, sn_update: bool = False):
        rank = len(tuple(self.kernel_size) if not isinstance(self.kernel_size, int)
                   else (self.kernel_size,) * (x.ndim - 2))
        if isinstance(self.kernel_size, int):
            rank = x.ndim - 2
        ksize = _tuple(self.kernel_size, rank)
        in_c = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, ksize + (in_c // self.groups, self.features))
        if self.spectral_norm:
            kernel = self._spectral_normalize(kernel, sn_update)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, _DIM_NUMBERS[rank])
        cdt = jnp.dtype(self.dtype or x.dtype)
        # f32 accumulation: request it explicitly only for f32 operands —
        # jax's conv transpose rule cannot differentiate through a
        # preferred_element_type that differs from the operand dtype
        # (bf16 training would fail), and the TPU MXU accumulates
        # low-precision convs in f32 internally anyway.
        ptype = jnp.float32 if cdt == jnp.float32 else None
        y = jax.lax.conv_general_dilated(
            x.astype(cdt),
            kernel.astype(cdt),
            window_strides=_tuple(self.strides, rank),
            padding=resolve_padding(ksize, self.dilation, self.padding, rank),
            rhs_dilation=_tuple(self.dilation, rank),
            dimension_numbers=dn,
            feature_group_count=self.groups,
            preferred_element_type=ptype,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y.astype(x.dtype)

    def _spectral_normalize(self, kernel, sn_update):
        # torch.nn.utils.spectral_norm semantics: u, v persistent buffers;
        # one power-iteration step per training call, frozen at eval.
        out = kernel.shape[-1]
        rest = kernel.size // out
        mat = kernel.reshape(-1, out).T  # (out, rest)

        def normalize(v):
            return v / (jnp.linalg.norm(v) + 1e-12)

        key = jax.random.PRNGKey(0)
        u_var = self.variable(
            "spectral", "u",
            lambda: normalize(jax.random.normal(key, (out,))))
        v_var = self.variable(
            "spectral", "v",
            lambda: normalize(jax.random.normal(
                jax.random.fold_in(key, 1), (rest,))))
        u, v = u_var.value, v_var.value
        if sn_update and not self.is_initializing():
            v = normalize(jax.lax.stop_gradient(mat).T @ u)
            u = normalize(jax.lax.stop_gradient(mat) @ v)
            u_var.value = u
            v_var.value = v
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = jnp.einsum("i,ij,j->", u, mat, v)
        return kernel / sigma


class _NormAct(nn.Module):
    """Shared activation->norm tail (reference applies act before norm)."""

    norm: Optional[str] = None
    activation: Optional[Callable] = leaky_relu_02

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.activation is not None:
            x = self.activation(x)
        if self.norm == "BN":
            x = nn.BatchNorm(use_running_average=not train, axis=-1)(x)
        elif self.norm == "IN":
            x = nn.GroupNorm(num_groups=None, group_size=1)(x)
        return x


class VanillaConv(nn.Module):
    """Conv -> activation -> norm (reference VanillaConv/VanillaConv2d)."""

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    norm: Optional[str] = None
    activation: Optional[Callable] = leaky_relu_02
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, train: bool = False, sn_update: bool = False):
        y = ConvND(self.features, self.kernel_size, self.strides, self.padding,
                   self.dilation, self.groups, self.use_bias,
                   spectral_norm=(self.norm == "SN"),
                   kernel_init=self.kernel_init, name="conv")(x, sn_update=sn_update)
        return _NormAct(None if self.norm == "SN" else self.norm,
                        self.activation, name="norm_act")(y, train=train)


class VanillaDeconv(nn.Module):
    """Nearest x2 upsample then VanillaConv (reference VanillaDeconv)."""

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    norm: Optional[str] = None
    activation: Optional[Callable] = leaky_relu_02
    scale_factor: int = 2
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, train: bool = False, sn_update: bool = False):
        x = upsample_nearest(x, self.scale_factor)
        return VanillaConv(self.features, self.kernel_size, self.strides,
                           self.padding, self.dilation, self.groups,
                           self.use_bias, self.norm, self.activation,
                           self.kernel_init, name="conv")(
            x, train=train, sn_update=sn_update)


class GatedConv(nn.Module):
    """out = sigmoid(gate_conv(x)) * act(feature_conv(x)) then norm."""

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    norm: Optional[str] = None
    activation: Optional[Callable] = leaky_relu_02
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, train: bool = False, sn_update: bool = False):
        sn = self.norm == "SN"
        feat = ConvND(self.features, self.kernel_size, self.strides,
                      self.padding, self.dilation, self.groups, self.use_bias,
                      spectral_norm=sn, kernel_init=self.kernel_init,
                      name="feature")(x, sn_update=sn_update)
        gate = ConvND(self.features, self.kernel_size, self.strides,
                      self.padding, self.dilation, self.groups, self.use_bias,
                      spectral_norm=sn, kernel_init=self.kernel_init,
                      name="gating")(x, sn_update=sn_update)
        if self.activation is not None:
            feat = self.activation(feat)
        y = nn.sigmoid(gate) * feat
        if self.norm in ("BN", "IN"):
            y = _NormAct(self.norm, None, name="norm_act")(y, train=train)
        return y


class GatedDeconv(nn.Module):
    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    norm: Optional[str] = None
    activation: Optional[Callable] = leaky_relu_02
    scale_factor: int = 2
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, train: bool = False, sn_update: bool = False):
        x = upsample_nearest(x, self.scale_factor)
        return GatedConv(self.features, self.kernel_size, self.strides,
                         self.padding, self.dilation, self.groups,
                         self.use_bias, self.norm, self.activation,
                         self.kernel_init, name="conv")(
            x, train=train, sn_update=sn_update)


class PartialConv(nn.Module):
    """Mask-renormalized convolution; call with (x, mask), returns (y, mask').

    Contract (reference network_blocks_2d.py:113-168):
    ``y = (W (m*x) - b) / sum(m) + b`` where windows with ``sum(m)==0`` emit 0,
    and the propagated mask marks windows that saw any valid pixel.
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    norm: Optional[str] = None
    activation: Optional[Callable] = leaky_relu_02
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, inputs, train: bool = False, sn_update: bool = False):
        x, mask = inputs
        rank = x.ndim - 2
        conv = ConvND(self.features, self.kernel_size, self.strides,
                      self.padding, self.dilation, self.groups,
                      use_bias=False, kernel_init=self.kernel_init,
                      name="feature")
        y = conv(mask * x, sn_update=sn_update)
        # mask-sum via an all-ones fixed conv over the 1-channel mask
        ksize = _tuple(self.kernel_size, rank)
        ones_kernel = jnp.ones(ksize + (1, 1), dtype=mask.dtype)
        dn = jax.lax.conv_dimension_numbers(
            mask.shape, ones_kernel.shape, _DIM_NUMBERS[rank])
        mask_sum = jax.lax.conv_general_dilated(
            mask, ones_kernel, _tuple(self.strides, rank),
            resolve_padding(ksize, self.dilation, self.padding, rank),
            rhs_dilation=_tuple(self.dilation, rank), dimension_numbers=dn)
        mask_sum = jax.lax.stop_gradient(mask_sum)
        holes = mask_sum == 0
        denom = jnp.where(holes, 1.0, mask_sum)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y / denom + bias
        else:
            y = y / denom
        y = jnp.where(holes, 0.0, y)
        new_mask = jnp.where(holes, 0.0, 1.0).astype(mask.dtype)
        if self.activation is not None:
            y = self.activation(y)
        if self.norm in ("BN", "IN"):
            y = _NormAct(self.norm, None, name="norm_act")(y, train=train)
        return y, new_mask


class PartialDeconv(nn.Module):
    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    norm: Optional[str] = None
    activation: Optional[Callable] = leaky_relu_02
    scale_factor: int = 2
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, inputs, train: bool = False, sn_update: bool = False):
        x, mask = inputs
        x = upsample_nearest(x, self.scale_factor)
        mask = jax.lax.stop_gradient(upsample_nearest(mask, self.scale_factor))
        return PartialConv(self.features, self.kernel_size, self.strides,
                           self.padding, self.dilation, self.groups,
                           self.use_bias, self.norm, self.activation,
                           self.kernel_init, name="conv")(
            (x, mask), train=train, sn_update=sn_update)


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor spatial upsampling; for 5-D (video) inputs only the
    two trailing spatial dims scale (reference interpolate semantics)."""
    if factor == 1:
        return x
    if x.ndim == 4:  # NHWC
        B, H, W, C = x.shape
        return jax.image.resize(x, (B, H * factor, W * factor, C), "nearest")
    if x.ndim == 5:  # NDHWC — keep temporal size
        B, D, H, W, C = x.shape
        return jax.image.resize(x, (B, D, H * factor, W * factor, C), "nearest")
    raise ValueError(f"unsupported rank {x.ndim}")


def replication_pad(x: jnp.ndarray, pad: int, spatial_only: bool = True) -> jnp.ndarray:
    """Edge-replication padding of the two trailing spatial dims
    (reference nn.ReplicationPad2d / 3d((p,p,p,p,0,0)))."""
    cfg = [(0, 0)] * x.ndim
    cfg[-3] = (pad, pad)
    cfg[-2] = (pad, pad)
    return jnp.pad(x, cfg, mode="edge")


conv_classes = {
    "vanilla": (VanillaConv, VanillaDeconv),
    "gated": (GatedConv, GatedDeconv),
    "partial": (PartialConv, PartialDeconv),
}
