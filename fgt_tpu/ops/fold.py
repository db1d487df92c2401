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
    # Stack on the MAJOR axis (contiguous concat) then transpose, instead of
    # stacking on a minor axis — the minor-axis stack made XLA materialize
    # one full-size buffer per tap downstream of matmul fusions (4.7G temp
    # per FGT FFN; this form is bit-identical and ~5x leaner).
    patches = jnp.stack(taps, axis=0)            # [kh*kw, B, oh, ow, C]
    patches = patches.transpose(1, 2, 3, 4, 0)   # [B, oh, ow, C, kh*kw]
    return patches.reshape(B, oh * ow, C * k[0] * k[1])


def fold(patches: jnp.ndarray, out_spatial: tuple, kernel_size,
         stride=1, padding=0, channels: int | None = None) -> jnp.ndarray:
    """``[B, L, C*kh*kw] -> [B, H, W, C]`` with overlapping patches summed
    (torch nn.Fold contract).

    Implemented as kh*kw statically-unrolled dilated pads accumulated into
    one buffer — each tap's contribution is a `lax.pad` with interior
    padding ``stride-1`` at offset (i, j). This keeps live memory at two
    image buffers; the previous ``jax.linear_transpose(unfold)`` formulation
    made XLA materialize gigabytes of scatter temporaries at FGT scale.
    """
    k, s, p = _resolve(kernel_size), _resolve(stride), _resolve(padding)
    B, L, CK = patches.shape
    if channels is None:
        channels = CK // (k[0] * k[1])
    oh, ow = output_size(out_spatial, k, s, p)
    assert L == oh * ow, f"fold: {L} patches != {oh}x{ow} positions"
    hp = out_spatial[0] + 2 * p[0]
    wp = out_spatial[1] + 2 * p[1]
    # torch patch-feature order: c slowest, then i, then j
    pt = patches.reshape(B, oh, ow, channels, k[0], k[1])
    zero = jnp.zeros((), patches.dtype)
    img = None
    for i in range(k[0]):
        for j in range(k[1]):
            tap = pt[:, :, :, :, i, j]
            padded = jax.lax.pad(tap, zero, (
                (0, 0, 0),
                (i, hp - i - ((oh - 1) * s[0] + 1), s[0] - 1),
                (j, wp - j - ((ow - 1) * s[1] + 1), s[1] - 1),
                (0, 0, 0)))
            img = padded if img is None else img + padded
    return img[:, p[0]:hp - p[0], p[1]:wp - p[1], :]


def fold_counts(out_spatial: tuple, kernel_size, stride=1,
                padding=0) -> "np.ndarray":
    """Static overlap-count map [H, W, 1]: fold(ones) as a numpy constant
    (the normalizer is data-independent, so it never costs device work)."""
    import numpy as np

    k, s, p = _resolve(kernel_size), _resolve(stride), _resolve(padding)
    oh, ow = output_size(out_spatial, k, s, p)
    hp = out_spatial[0] + 2 * p[0]
    wp = out_spatial[1] + 2 * p[1]
    img = np.zeros((hp, wp), np.float32)
    for y in range(oh):
        for x in range(ow):
            img[y * s[0]:y * s[0] + k[0], x * s[1]:x * s[1] + k[1]] += 1.0
    return img[p[0]:hp - p[0], p[1]:wp - p[1], None]


def fold_average(patches: jnp.ndarray, out_spatial: tuple, kernel_size,
                 stride=1, padding=0) -> jnp.ndarray:
    """Overlap-averaged fold: fold(x) / fold(ones), the normalization the
    reference's FusionFeedForward applies (ffn_base.py:53-77)."""
    summed = fold(patches, out_spatial, kernel_size, stride, padding)
    counts = jnp.asarray(fold_counts(out_spatial, kernel_size, stride,
                                     padding), summed.dtype)
    return summed / jnp.maximum(counts, 1e-8)
