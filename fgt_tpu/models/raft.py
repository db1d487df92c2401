"""RAFT optical flow in JAX/flax (frozen pretrained estimator).

Capability parity with the reference (RAFT/raft.py:24-145, corr.py:12-61,
update.py:33-138, extractor.py:118-266). TPU-first restructuring:

* the all-pairs correlation volume is one einsum feeding a 4-level
  average-pooled pyramid; the per-iteration 9x9 neighborhood lookup is a
  batched take-along-axis bilinear gather (XLA lowers it to TPU dynamic
  gathers; a Pallas kernel can swap in behind the same function);
* the 20-iteration ConvGRU refinement is a ``lax.scan`` — one trace, no
  Python loop unrolling;
* convex upsampling uses the torch-exact unfold from fgt_tpu.ops.fold.

Both variants are wired: the "big" one (the reference CLI default) and
``--small`` (hidden 96 / context 64 / radius 3, bottleneck encoders, plain
ConvGRU, bilinear x8 upsampling — reference raft.py:29-58). The
memory-efficient correlation path (``alternate_corr``, the reference's
optional alt_cuda_corr extension, corr.py:62-84) is implemented TPU-first:
per-iteration on-the-fly neighborhood correlation in pixel chunks that
never materializes the [B*H*W, H, W] all-pairs volume.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgt_tpu.ops.fold import unfold


@dataclasses.dataclass
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 20
    small: bool = False           # reference raft.py:29-33
    alternate_corr: bool = False  # reference corr.py:62-84
    corr_chunk: int = 2048        # pixels per alternate-corr chunk
    # VMEM-blocked Pallas kernel for the pyramid lookup (bit-identical
    # to lookup_corr_pyramid; cuts the lookup's HBM traffic to the
    # volume itself). Opt-in: Mosaic compiles hang over this image's
    # remote-compile tunnel, so it cannot be the default here.
    pallas_lookup: bool = False
    # fused on-the-fly correlation (ops/corr_fused_pallas): never builds
    # the all-pairs pyramid — each GRU iteration recomputes its taps from
    # the VMEM-resident fmap2 on the MXU. Removes the pyramid's ~10 GB
    # HBM footprint AND the per-iteration volume streaming that dominates
    # the refine scan's device time (docs/raft_trace_r05.md). Same
    # opt-in/guard story as pallas_lookup. Takes precedence over
    # pallas_lookup; alternate_corr (the reference-contract chunked XLA
    # path) wins over both.
    fused_corr: bool = False
    # storage dtype of the correlation pyramid. The all-pairs volume is
    # the dominant HBM term of the flow stage (~224 MB/pair f32 at
    # 864x480 flows); "bfloat16" halves it, doubling the pair batch that
    # fits per scan step — the main lever on the latency-bound GRU loop
    # (docs/raft_trace_r04.md). The einsum still accumulates in f32;
    # only storage + lookup taps carry bf16 (~2^-8 relative, same
    # regime as bf16 activations). f32 default keeps parity paths exact.
    corr_dtype: str = "float32"
    # pair batches wider than this build the all-pairs pyramid chunk-wise
    # (bounds the f32 construction transient — 2 * chunk * (HW)^2 * 4
    # bytes — independent of the refine batch; see build_corr_pyramid)
    corr_build_chunk: int = 8

    def __post_init__(self):
        if self.small:
            self.hidden_dim = 96
            self.context_dim = 64
            self.corr_radius = 3


def kaiming_fan_out():
    # torch kaiming_normal_(mode='fan_out', nonlinearity='relu'), the
    # reference encoder init (extractor.py:150-157)
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _Norm(nn.Module):
    kind: str  # 'instance' | 'batch' | 'group' | 'none'
    channels: int

    @nn.compact
    def __call__(self, x):
        if self.kind == "instance":
            # torch InstanceNorm2d(affine=False, eps=1e-5)
            return nn.GroupNorm(num_groups=None, group_size=1,
                                use_bias=False, use_scale=False,
                                epsilon=1e-5)(x)
        if self.kind == "batch":
            # frozen model: always running averages
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5)(x)
        if self.kind == "group":
            return nn.GroupNorm(num_groups=self.channels // 8,
                                epsilon=1e-5)(x)
        return x


class ResidualBlock(nn.Module):
    planes: int
    norm: str
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    kernel_init=kaiming_fan_out(), name="conv1")(x)
        y = nn.relu(_Norm(self.norm, self.planes, name="norm1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1,
                    kernel_init=kaiming_fan_out(), name="conv2")(y)
        y = nn.relu(_Norm(self.norm, self.planes, name="norm2")(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        kernel_init=kaiming_fan_out(), name="downsample")(x)
            x = _Norm(self.norm, self.planes, name="norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """1/8-resolution feature extractor (reference extractor.py:118-192)."""

    output_dim: int = 256
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(64, (7, 7), strides=2, padding=3,
                    kernel_init=kaiming_fan_out(), name="conv1")(x)
        y = nn.relu(_Norm(self.norm, 64, name="norm1")(y))
        for i, (dim, stride) in enumerate(((64, 1), (96, 2), (128, 2))):
            y = ResidualBlock(dim, self.norm, stride, name=f"layer{i}_0")(y)
            y = ResidualBlock(dim, self.norm, 1, name=f"layer{i}_1")(y)
        return nn.Conv(self.output_dim, (1, 1),
                       kernel_init=kaiming_fan_out(), name="conv2")(y)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual bottleneck (reference extractor.py:60-116)."""

    planes: int
    norm: str
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        q = self.planes // 4
        y = nn.Conv(q, (1, 1), kernel_init=kaiming_fan_out(),
                    name="conv1")(x)
        y = nn.relu(_Norm(self.norm, q, name="norm1")(y))
        y = nn.Conv(q, (3, 3), strides=self.stride, padding=1,
                    kernel_init=kaiming_fan_out(), name="conv2")(y)
        y = nn.relu(_Norm(self.norm, q, name="norm2")(y))
        y = nn.Conv(self.planes, (1, 1), kernel_init=kaiming_fan_out(),
                    name="conv3")(y)
        y = nn.relu(_Norm(self.norm, self.planes, name="norm3")(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        kernel_init=kaiming_fan_out(), name="downsample")(x)
            x = _Norm(self.norm, self.planes, name="norm4")(x)
        return nn.relu(x + y)


class SmallEncoder(nn.Module):
    """1/8-resolution bottleneck extractor (reference extractor.py:195-266)."""

    output_dim: int = 128
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(32, (7, 7), strides=2, padding=3,
                    kernel_init=kaiming_fan_out(), name="conv1")(x)
        y = nn.relu(_Norm(self.norm, 32, name="norm1")(y))
        for i, (dim, stride) in enumerate(((32, 1), (64, 2), (96, 2))):
            y = BottleneckBlock(dim, self.norm, stride,
                                name=f"layer{i}_0")(y)
            y = BottleneckBlock(dim, self.norm, 1, name=f"layer{i}_1")(y)
        return nn.Conv(self.output_dim, (1, 1),
                       kernel_init=kaiming_fan_out(), name="conv2")(y)


# ---------------- correlation pyramid ----------------

def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4, dtype=None,
                       build_chunk: int = 0) -> list[jnp.ndarray]:
    """All-pairs correlation + average pooling (reference corr.py:12-27).

    fmaps: [B, H, W, C] -> list of [B*H*W, H_i, W_i] volumes.

    ``dtype`` is the STORAGE dtype (pooling always runs in the f32
    einsum output; RAFTConfig.corr_dtype="bfloat16" halves the resident
    pyramid). ``build_chunk`` bounds the construction transient: the f32
    all-pairs einsum output (plus the layout copy XLA inserts before the
    scale) is 2 * B * (HW)^2 * 4 bytes when built in one shot — 17.9 GB
    at the 46-pair bench batch, the round-5 warm-probe OOM — so batches
    wider than ``build_chunk`` build the pyramid per pair-chunk under
    ``lax.map`` (bit-identical per pair; the einsum is sequenced, which
    costs microseconds against the 20-iteration GRU loop it feeds)."""
    B, H, W, C = fmap1.shape

    def build(f1, f2):
        b = f1.shape[0]
        corr = jnp.einsum("bxyc,buvc->bxyuv", f1, f2,
                          preferred_element_type=jnp.float32)
        corr = corr / jnp.sqrt(jnp.asarray(C, corr.dtype))
        corr = corr.reshape(b * H * W, H, W)
        pyr = [corr if dtype is None else corr.astype(dtype)]
        for _ in range(num_levels - 1):
            corr = nn.avg_pool(corr[..., None], (2, 2),
                               strides=(2, 2))[..., 0]
            pyr.append(corr if dtype is None else corr.astype(dtype))
        return tuple(pyr)

    if not build_chunk or B <= build_chunk:
        return list(build(fmap1, fmap2))
    k = -(-B // build_chunk)
    pad = k * build_chunk - B

    def padded(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:],
                                              a.dtype)], axis=0)
        return a.reshape(k, build_chunk, H, W, C)

    levels = jax.lax.map(lambda ab: build(ab[0], ab[1]),
                         (padded(fmap1), padded(fmap2)))
    out = []
    for lv in levels:                     # [k, chunk*H*W, H_i, W_i]
        hi, wi = lv.shape[2:]
        out.append(lv.reshape(k * build_chunk * H * W, hi, wi)[:B * H * W])
    return out


def lookup_corr_pyramid(pyramid: list[jnp.ndarray], coords: jnp.ndarray,
                        radius: int) -> jnp.ndarray:
    """Sample each level at a (2r+1)^2 neighborhood of coords/2^i
    (reference corr.py:29-50).

    coords: [B, H, W, 2] (x, y) at level-0 resolution.
    Returns [B, H, W, levels*(2r+1)^2].

    TPU-first implementation: all taps of one pixel live in a contiguous
    (2r+2)^2 patch around floor(coords), so we extract ONE sliced gather
    per pixel and synthesize the bilinear taps with two small separable
    einsums. This replaces 4*(2r+1)^2 scalar gathers per pixel per level
    (murderous on TPU: every scalar costs a full HBM read granule) and is
    ~50x faster at RAFT scale.

    Tap channel order preserves the reference quirk (RAFT/corr.py:37-43):
    the X offset varies with the SLOW index, Y with the fast index — the
    trained motion encoder expects exactly this order.
    """
    B, H, W, _ = coords.shape
    N = B * H * W
    k = 2 * radius + 1
    flat = coords.reshape(N, 2)
    outs = []
    for i, corr in enumerate(pyramid):
        cx = flat[:, 0] / (2 ** i)
        cy = flat[:, 1] / (2 ** i)
        taps = _patch_bilinear_taps(corr, cx, cy, radius)  # [N, k(dx), k(dy)]
        outs.append(taps.reshape(N, k * k))
    return jnp.concatenate(outs, axis=-1).reshape(B, H, W, len(pyramid) * k * k)


def _patch_bilinear_taps(vol: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
                         radius: int) -> jnp.ndarray:
    """All integer-offset bilinear taps of ``vol[n]`` at ``(cy+dy, cx+dx)``
    for dx, dy in [-radius, radius].

    vol: [N, H, W]; cx, cy: [N]. Returns [N, k, k] with dx on the slow
    axis (reference tap order). Zero outside the volume (grid_sample
    zero-padding semantics, like the reference bilinear_sampler).

    Layout notes (why this shape of kernel): a y-only dynamic slice keeps
    the minor (lane) dimension intact, so XLA lowers it to efficient
    contiguous row-band DMAs; per-pixel x selection then rides the MXU as
    a one-hot matmul over the full row. Dynamic slicing in x (the lane
    dim) or per-tap scalar gathers are ~20-50x slower on TPU.
    """
    N, H, W = vol.shape
    P_y = min(2 * radius + 2, H)

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0                                     # bilinear fractions,
    fy = cy - y0                                     # same for every tap
    sy = jnp.clip(y0 - radius, 0, H - P_y).astype(jnp.int32)

    band = jax.vmap(
        lambda v, a: jax.lax.dynamic_slice(v, (a, 0), (P_y, W))
    )(vol, sy)                                       # [N, P_y, W]

    zero = jnp.zeros_like(sy)
    wy = _axis_weights(y0, fy, sy, H, P_y, radius, vol.dtype)  # [N, k, P_y]
    wx = _axis_weights(x0, fx, zero, W, W, radius, vol.dtype)  # [N, k, W]
    tmp = jnp.einsum("nbp,npq->nbq", wy, band)       # reduce y: [N, k, W]
    return jnp.einsum("naq,nbq->nab", wx, tmp)       # [N, dx, dy]


def _axis_weights(c0, frac, start, size, P, radius, dtype):
    """[N, k, P] separable bilinear one-hot weight rows (shared by the
    pyramid and alternate lookups)."""
    d = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    t = c0[:, None].astype(jnp.int32) + d[None, :]            # corner-0 idx
    valid0 = (t >= 0) & (t <= size - 1)
    valid1 = (t + 1 >= 0) & (t + 1 <= size - 1)
    l0 = jnp.clip(t - start[:, None], 0, P - 1)
    l1 = jnp.clip(t + 1 - start[:, None], 0, P - 1)
    ar = jnp.arange(P, dtype=jnp.int32)
    w0 = (1 - frac)[:, None] * valid0.astype(dtype)           # [N, k]
    w1 = frac[:, None] * valid1.astype(dtype)
    oh0 = (ar[None, None, :] == l0[..., None]).astype(dtype)
    oh1 = (ar[None, None, :] == l1[..., None]).astype(dtype)
    return w0[..., None] * oh0 + w1[..., None] * oh1


# ---------------- memory-efficient (alternate) correlation ----------------

def build_fmap_pyramid(fmap2: jnp.ndarray, num_levels: int = 4):
    """Average-pooled FEATURE pyramid — [B, H_i, W_i, C] per level. The
    alternate path pools features instead of the correlation volume
    (reference corr.py:62-70 pools fmap2 the same way)."""
    pyr = [fmap2]
    for _ in range(num_levels - 1):
        pyr.append(nn.avg_pool(pyr[-1], (2, 2), strides=(2, 2)))
    return pyr


def lookup_corr_alternate(fmap1: jnp.ndarray, fmap2_pyramid,
                          coords: jnp.ndarray, radius: int,
                          chunk: int = 2048) -> jnp.ndarray:
    """On-the-fly neighborhood correlation (the reference's alt_cuda_corr
    contract, corr.py:62-84) — never materializes the [B*H*W, H, W]
    all-pairs volume.

    Per pixel chunk and pyramid level: gather a (2r+2)-row y-band of
    fmap2, contract with the pixel's fmap1 vector over channels (one MXU
    matmul -> full-row correlations), then apply the same separable
    bilinear tap weights as the pyramid path. Peak memory is
    chunk * (2r+2) * W_i * C * 4 bytes instead of (B*H*W) * H_i * W_i * 4
    — resolution-independent in the number of pixels.

    Returns [B, H, W, levels*(2r+1)^2], bit-matching lookup_corr_pyramid
    up to f32 reassociation (pooling commutes with the channel
    contraction because avg_pool is linear).
    """
    B, H, W, C = fmap1.shape
    N = B * H * W
    k = 2 * radius + 1
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    f1 = fmap1.reshape(N, C)
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), H * W)
    flat = coords.reshape(N, 2)
    pad = (-N) % chunk

    def padded(a):
        if not pad:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)

    outs = []
    for i, f2 in enumerate(fmap2_pyramid):
        Hi, Wi = f2.shape[1:3]
        P_y = min(2 * radius + 2, Hi)
        cx = flat[:, 0] / (2 ** i)
        cy = flat[:, 1] / (2 ** i)
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = (cx - x0).astype(f2.dtype)
        fy = (cy - y0).astype(f2.dtype)
        sy = jnp.clip(y0 - radius, 0, Hi - P_y).astype(jnp.int32)

        args = jax.tree_util.tree_map(
            lambda a: padded(a).reshape(-1, chunk, *a.shape[1:]),
            (f1, bidx, sy, x0, y0, fx, fy))

        def chunk_fn(a, f2=f2, Hi=Hi, Wi=Wi, P_y=P_y):
            f1c, bc, syc, x0c, y0c, fxc, fyc = a
            band = jax.vmap(lambda b, s: jax.lax.dynamic_slice(
                f2, (b, s, 0, 0), (1, P_y, Wi, C))[0])(bc, syc)
            rowcorr = jnp.einsum(
                "npqc,nc->npq", band, f1c,
                preferred_element_type=jnp.float32) * scale
            zero = jnp.zeros_like(syc)
            wy = _axis_weights(y0c, fyc, syc, Hi, P_y, radius,
                               rowcorr.dtype)
            wx = _axis_weights(x0c, fxc, zero, Wi, Wi, radius,
                               rowcorr.dtype)
            tmp = jnp.einsum("nbp,npq->nbq", wy, rowcorr)
            return jnp.einsum("naq,nbq->nab", wx, tmp).reshape(-1, k * k)

        taps = jax.lax.map(chunk_fn, args).reshape(-1, k * k)[:N]
        outs.append(taps)
    return jnp.concatenate(outs, axis=-1).reshape(
        B, H, W, len(fmap2_pyramid) * k * k)


def _bilinear_volume_sample(vol: jnp.ndarray, x: jnp.ndarray,
                            y: jnp.ndarray) -> jnp.ndarray:
    """vol: [N, H, W]; x, y: [N, K] -> [N, K]; zero outside (grid_sample
    zeros-padding semantics, matching the reference bilinear_sampler)."""
    N, H, W = vol.shape
    vf = vol.reshape(N, H * W)
    x0, y0 = jnp.floor(x), jnp.floor(y)

    def tap(xi, yi, w):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        w = w * valid.astype(vol.dtype)
        idx = (jnp.clip(yi, 0, H - 1).astype(jnp.int32) * W
               + jnp.clip(xi, 0, W - 1).astype(jnp.int32))
        return jnp.take_along_axis(vf, idx, axis=1) * w

    wx1, wy1 = x - x0, y - y0
    wx0, wy0 = 1 - wx1, 1 - wy1
    return (tap(x0, y0, wx0 * wy0) + tap(x0 + 1, y0, wx1 * wy0)
            + tap(x0, y0 + 1, wx0 * wy1) + tap(x0 + 1, y0 + 1, wx1 * wy1))


# ---------------- update block ----------------

class BasicMotionEncoder(nn.Module):
    """(corr, flow) -> motion features (reference update.py:79-97)."""

    cfg: RAFTConfig

    @nn.compact
    def __call__(self, flow, corr):
        co = nn.relu(nn.Conv(256, (1, 1), name="convc1")(corr))
        co = nn.relu(nn.Conv(192, (3, 3), padding=1, name="convc2")(co))
        fl = nn.relu(nn.Conv(128, (7, 7), padding=3, name="convf1")(flow))
        fl = nn.relu(nn.Conv(64, (3, 3), padding=1, name="convf2")(fl))
        out = nn.relu(nn.Conv(126, (3, 3), padding=1, name="conv")(
            jnp.concatenate([co, fl], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 128 channels


class SepConvGRU(nn.Module):
    """Separable (1x5 then 5x1) ConvGRU (reference update.py:33-60)."""

    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        for axis, name in ((1, "h"), (0, "v")):
            ksize = (1, 5) if name == "h" else (5, 1)
            pad = (0, 2) if name == "h" else (2, 0)
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden, ksize, padding=(pad[0], pad[1]),
                                   name=f"convz_{name}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden, ksize, padding=(pad[0], pad[1]),
                                   name=f"convr_{name}")(hx))
            q = jnp.tanh(nn.Conv(self.hidden, ksize, padding=(pad[0], pad[1]),
                                 name=f"convq_{name}")(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class SmallMotionEncoder(nn.Module):
    """(corr, flow) -> 82-channel motion features
    (reference update.py:62-77)."""

    cfg: RAFTConfig

    @nn.compact
    def __call__(self, flow, corr):
        co = nn.relu(nn.Conv(96, (1, 1), name="convc1")(corr))
        fl = nn.relu(nn.Conv(64, (7, 7), padding=3, name="convf1")(flow))
        fl = nn.relu(nn.Conv(32, (3, 3), padding=1, name="convf2")(fl))
        out = nn.relu(nn.Conv(80, (3, 3), padding=1, name="conv")(
            jnp.concatenate([co, fl], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 82 channels


class ConvGRU(nn.Module):
    """Plain 3x3 ConvGRU (reference update.py:16-31)."""

    hidden: int = 96

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=1,
                               name="convz")(hx))
        r = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=1,
                               name="convr")(hx))
        q = jnp.tanh(nn.Conv(self.hidden, (3, 3), padding=1,
                             name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SmallUpdateBlock(nn.Module):
    """Small-variant update: motion encoder + plain GRU + flow head, no
    upsample-mask head (reference update.py:99-112 returns mask None ->
    bilinear x8 upsampling)."""

    cfg: RAFTConfig

    @nn.compact
    def __call__(self, net, inp, corr, flow, with_mask: bool = True):
        motion = SmallMotionEncoder(self.cfg, name="encoder")(flow, corr)
        gru_in = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.cfg.hidden_dim, name="gru")(net, gru_in)
        d = nn.relu(nn.Conv(128, (3, 3), padding=1, name="flow_conv1")(net))
        delta = nn.Conv(2, (3, 3), padding=1, name="flow_conv2")(d)
        return net, None, delta


class BasicUpdateBlock(nn.Module):
    """Motion encoder + GRU + flow head + upsample-mask head
    (reference update.py:114-136)."""

    cfg: RAFTConfig

    @nn.compact
    def __call__(self, net, inp, corr, flow, with_mask: bool = True):
        motion = BasicMotionEncoder(self.cfg, name="encoder")(flow, corr)
        gru_in = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.cfg.hidden_dim, name="gru")(net, gru_in)
        d = nn.relu(nn.Conv(256, (3, 3), padding=1, name="flow_conv1")(net))
        delta = nn.Conv(2, (3, 3), padding=1, name="flow_conv2")(d)
        if not with_mask:
            # inference skips the 576-channel upsample-mask head on all
            # but the final iteration — only the last flow is upsampled
            # (reference raft.py:123-140 upsamples per iteration because
            # torch eagerly materializes either way; under XLA the dead
            # head costs real HBM writes inside the scan). Param creation
            # is unaffected: the final iteration always passes True.
            return net, None, delta
        m = nn.relu(nn.Conv(256, (3, 3), padding=1, name="mask_conv1")(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), name="mask_conv2")(m)
        return net, mask, delta


def coords_grid(b: int, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype),
                          jnp.arange(w, dtype=dtype), indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1)  # (x, y)
    return jnp.broadcast_to(grid[None], (b, h, w, 2))


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x8 upsampling for the small variant
    (reference utils/utils.py upflow8: 8 * interpolate(mode='bilinear',
    align_corners=True))."""
    B, H, W, _ = flow.shape
    # align_corners=True bilinear == resize with 'linear' on the corner grid
    ys = jnp.linspace(0.0, H - 1.0, 8 * H)
    xs = jnp.linspace(0.0, W - 1.0, 8 * W)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 2).astype(jnp.int32)
    wy = (ys - y0)[None, :, None, None].astype(flow.dtype)
    wx = (xs - x0)[None, None, :, None].astype(flow.dtype)
    rows0 = jnp.take(flow, y0, axis=1)
    rows1 = jnp.take(flow, y0 + 1, axis=1)
    rows = rows0 * (1 - wy) + rows1 * wy
    cols0 = jnp.take(rows, x0, axis=2)
    cols1 = jnp.take(rows, x0 + 1, axis=2)
    return 8.0 * (cols0 * (1 - wx) + cols1 * wx)


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination x8 upsampling (reference raft.py:73-84).

    flow: [B, H, W, 2]; mask: [B, H, W, 576] -> [B, 8H, 8W, 2].
    """
    B, H, W, _ = flow.shape
    m = mask.reshape(B, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    up = unfold(8 * flow, 3, 1, 1)              # [B, H*W, 2*9]
    up = up.reshape(B, H, W, 2, 9)
    out = jnp.einsum("bhwck,bhwkuv->bhwuvc", up, m)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * H, 8 * W, 2)
    return out


class RAFT(nn.Module):
    """forward(image1, image2) with images [B, H, W, 3] in [0, 255].

    ``test_mode`` returns (low-res flow, upsampled flow) like the reference;
    otherwise all per-iteration upsampled predictions stacked on axis 0.

    TPU-native split: ``encode`` (fnet + cnet over a frame batch, once) and
    ``refine`` (corr pyramid + iterative GRU over precomputed features) are
    exposed as separate methods so a video pipeline can encode every frame
    ONCE and reuse the features across all (pair, direction) combinations.
    The reference re-encodes per pair per direction (RAFT/raft.py:102-121,
    tool/video_inpainting.py:245-288) — ~4x redundant encoder FLOPs, which
    on TPU dominate the latency-bound GRU loop (docs/raft_trace_r04.md).
    Parameter tree is identical to the fused ``__call__`` path (setup
    attribute names match the previous explicit ``name=`` strings).
    """

    cfg: RAFTConfig = dataclasses.field(default_factory=RAFTConfig)

    def setup(self):
        cfg = self.cfg
        if cfg.small:
            self.fnet = SmallEncoder(128, "instance")
            self.cnet = SmallEncoder(cfg.hidden_dim + cfg.context_dim,
                                     "none")
            self.update_block = SmallUpdateBlock(cfg)
        else:
            self.fnet = BasicEncoder(256, "instance")
            self.cnet = BasicEncoder(cfg.hidden_dim + cfg.context_dim,
                                     "batch")
            self.update_block = BasicUpdateBlock(cfg)

    def encode(self, images):
        """Frame batch [B, H, W, 3] in [0, 255] -> (fmap, net, inp) at 1/8
        resolution. ``fmap`` feeds correlation (as either endpoint); ``net``
        / ``inp`` are the GRU init / context of the frame as a SOURCE."""
        x = 2 * (images / 255.0) - 1.0
        fmap = self.fnet(x)
        cnet = self.cnet(x)
        net = jnp.tanh(cnet[..., :self.cfg.hidden_dim])
        inp = nn.relu(cnet[..., self.cfg.hidden_dim:])
        return fmap, net, inp

    def refine(self, fmap1, fmap2, net, inp, iters: int | None = None,
               test_mode: bool = True):
        """Iterative flow refinement over precomputed features
        (reference raft.py:123-140). fmap*: [B, H8, W8, C]."""
        cfg = self.cfg
        iters = iters or cfg.iters
        update = self.update_block
        if cfg.alternate_corr:
            fmap1 = fmap1.astype(jnp.float32)
            pyramid = build_fmap_pyramid(fmap2.astype(jnp.float32),
                                         cfg.corr_levels)
        elif cfg.fused_corr:
            from fgt_tpu.ops.corr_fused_pallas import pad_fmap_pyramid

            # padded + cast ONCE per refine call, outside the GRU loop;
            # the kernel recomputes correlations from these features.
            # fmap1 stays in the storage dtype (the kernel accumulates
            # the feature dot in f32 on the MXU either way) — up-casting
            # it to f32 here would double the per-iteration f1 stream
            kdt = (jnp.float32 if cfg.corr_dtype == "float32"
                   else jnp.dtype(cfg.corr_dtype))
            fmap1 = fmap1.astype(kdt)
            pyramid = pad_fmap_pyramid(
                build_fmap_pyramid(fmap2.astype(jnp.float32),
                                   cfg.corr_levels),
                dtype=(None if cfg.corr_dtype == "float32"
                       else cfg.corr_dtype))
        else:
            fmap1 = fmap1.astype(jnp.float32)
            fmap2 = fmap2.astype(jnp.float32)
            # pooling runs in f32; storage follows corr_dtype (narrow
            # taps feed the bf16 update block anyway); construction is
            # chunked so the f32 all-pairs transient stays bounded at
            # wide refine batches
            pyramid = build_corr_pyramid(
                fmap1, fmap2, cfg.corr_levels,
                dtype=(None if cfg.corr_dtype == "float32"
                       else cfg.corr_dtype),
                build_chunk=getattr(cfg, "corr_build_chunk", 8))

        B, H8, W8, _ = fmap1.shape
        coords0 = coords_grid(B, H8, W8)

        def step(carry, need_up: bool):
            net, coords1 = carry
            coords1 = jax.lax.stop_gradient(coords1)
            if cfg.alternate_corr:
                corr = lookup_corr_alternate(fmap1, pyramid, coords1,
                                             cfg.corr_radius,
                                             chunk=cfg.corr_chunk)
            elif cfg.fused_corr:
                from fgt_tpu.ops.corr_fused_pallas import lookup_corr_fused

                corr = lookup_corr_fused(fmap1, pyramid, coords1,
                                         cfg.corr_radius)
            elif cfg.pallas_lookup:
                from fgt_tpu.ops.corr_lookup_pallas import \
                    lookup_corr_pyramid_pallas
                corr = lookup_corr_pyramid_pallas(pyramid, coords1,
                                                  cfg.corr_radius)
            else:
                corr = lookup_corr_pyramid(pyramid, coords1,
                                           cfg.corr_radius)
            flow = coords1 - coords0
            net, mask, delta = update(net, inp, corr, flow,
                                      with_mask=need_up)
            coords1 = coords1 + delta
            if not need_up:
                return (net, coords1), None
            if mask is None:  # small variant: bilinear x8
                flow_up = upflow8(coords1 - coords0)
            else:
                flow_up = upsample_flow_convex(coords1 - coords0, mask)
            return (net, coords1), flow_up

        # The update block is applied `iters` times with SHARED weights; a
        # python loop keeps sharing and traces once per distinct `iters`
        # (nn.scan would rename params; jax.lax.scan can't close over an
        # unbound module). In test_mode only the FINAL prediction is
        # consumed (reference raft.py:139-140), so the 576-channel
        # upsample-mask head and the [B, 8H, 8W, 2] convex upsample are
        # computed once, not per iteration — torch pays them eagerly every
        # iteration; under XLA they were ~1.5 GB/iter of dead HBM writes.
        carry = (net, coords0)
        flow_up = None
        flows = []
        for i in range(iters):
            need_up = (not test_mode) or i == iters - 1
            carry, flow_up = step(carry, need_up)
            if not test_mode:
                flows.append(flow_up)
        if test_mode:
            _, coords1 = carry
            return coords1 - coords0, flow_up
        return jnp.stack(flows, axis=0)

    def __call__(self, image1, image2, iters: int | None = None,
                 test_mode: bool = True):
        cfg = self.cfg
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0

        both = jnp.concatenate([image1, image2], axis=0)
        fmaps = self.fnet(both)
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)

        cnet = self.cnet(image1)
        net = jnp.tanh(cnet[..., :cfg.hidden_dim])
        inp = nn.relu(cnet[..., cfg.hidden_dim:])
        return self.refine(fmap1, fmap2, net, inp, iters=iters,
                           test_mode=test_mode)
