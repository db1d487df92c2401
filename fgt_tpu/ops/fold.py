"""Torch-compatible unfold / fold (patch extraction and its adjoint) in JAX.

The FGT transformer relies on fold/unfold in three places (reference
FGT/models/model.py Vec2Patch :91-110, FusionFeedForward ffn_base.py:33-77,
RAFT convex upsampling raft.py:73-84). Channel ordering of the flattened
patch axis follows torch: index = c * (kh*kw) + i * kw + j (channel slowest).

``fold`` is implemented as the exact linear adjoint of ``unfold`` via
``jax.linear_transpose`` — this guarantees torch-``nn.Fold`` summation
semantics (overlaps accumulate) and lets XLA pick an efficient
scatter/conv-transpose lowering on TPU.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp


def _resolve(v, n=2):
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def output_size(spatial: tuple, kernel_size, stride, padding) -> tuple:
    k, s, p = _resolve(kernel_size), _resolve(stride), _resolve(padding)
    return tuple((spatial[i] + 2 * p[i] - k[i]) // s[i] + 1 for i in range(2))


def unfold(x: jnp.ndarray, kernel_size, stride=1, padding=0) -> jnp.ndarray:
    """``[B, H, W, C] -> [B, L, C*kh*kw]`` sliding-window patch extraction.

    L = number of window positions (row-major), flattened patch features in
    torch order (c slowest, then i, then j).
    """
    k, s, p = _resolve(kernel_size), _resolve(stride), _resolve(padding)
    B, H, W, C = x.shape
    oh, ow = output_size((H, W), k, s, p)
    xp = jnp.pad(x, ((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)))
    taps = []
    for i in range(k[0]):
        for j in range(k[1]):
            taps.append(jax.lax.slice(
                xp, (0, i, j, 0),
                (B, i + (oh - 1) * s[0] + 1, j + (ow - 1) * s[1] + 1, C),
                (1, s[0], s[1], 1)))
    # [B, oh, ow, C, kh*kw] with (i, j) fastest -> flatten c-major
    patches = jnp.stack(taps, axis=-1)
    return patches.reshape(B, oh * ow, C * k[0] * k[1])


def _fold_transpose_fn(img_shape, kernel_size, stride, padding, dtype_name):
    # NOTE: deliberately NOT cached — jax.linear_transpose may close over
    # trace-local constants, and caching across jit traces leaks tracers.
    dtype = jnp.dtype(dtype_name)

    def u(img):
        return unfold(img, kernel_size, stride, padding)

    return jax.linear_transpose(
        u, jax.ShapeDtypeStruct(img_shape, dtype))


def fold(patches: jnp.ndarray, out_spatial: tuple, kernel_size,
         stride=1, padding=0, channels: int | None = None) -> jnp.ndarray:
    """``[B, L, C*kh*kw] -> [B, H, W, C]`` with overlapping patches summed
    (torch nn.Fold contract)."""
    k = _resolve(kernel_size)
    B, L, CK = patches.shape
    if channels is None:
        channels = CK // (k[0] * k[1])
    img_shape = (B, out_spatial[0], out_spatial[1], channels)
    t = _fold_transpose_fn(img_shape, _resolve(kernel_size),
                           _resolve(stride), _resolve(padding),
                           jnp.result_type(patches).name)
    (img,) = t(patches)
    return img


def fold_average(patches: jnp.ndarray, out_spatial: tuple, kernel_size,
                 stride=1, padding=0) -> jnp.ndarray:
    """Overlap-averaged fold: fold(x) / fold(ones), the normalization the
    reference's FusionFeedForward applies (ffn_base.py:53-77)."""
    summed = fold(patches, out_spatial, kernel_size, stride, padding)
    ones = jnp.ones_like(patches)
    counts = fold(ones, out_spatial, kernel_size, stride, padding)
    return summed / jnp.maximum(counts, 1e-8)
