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


def _cells_eligible(k, s, p) -> bool:
    """Cell decomposition applies when every window starts on a stride-
    aligned boundary (p % s == 0) and the stride is a real downsample."""
    return all(p[i] % s[i] == 0 and s[i] > 1 for i in range(2))


def unfold(x: jnp.ndarray, kernel_size, stride=1, padding=0) -> jnp.ndarray:
    """``[B, H, W, C] -> [B, L, C*kh*kw]`` sliding-window patch extraction.

    L = number of window positions (row-major), flattened patch features in
    torch order (c slowest, then i, then j).

    Two lowerings:
    * cell path (stride-aligned windows, the FGT 7/3/3 geometry): space-
      to-depth by the stride, then ``ceil(k/s)^2`` CONTIGUOUS slices of
      the cell grid. The profile of the GAN train step showed the naive
      form below spending 68% of device time in strided `slice`/copy ops
      (docs/fgt_train_trace_r04.md) — stride-3 slices defeat efficient
      DMA; the cell path moves the same bytes contiguously.
    * generic path: kh*kw strided slices (any geometry).
    """
    k, s, p = _resolve(kernel_size), _resolve(stride), _resolve(padding)
    B, H, W, C = x.shape
    oh, ow = output_size((H, W), k, s, p)
    if _cells_eligible(k, s, p):
        return _unfold_cells(x, k, s, p, oh, ow)
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


def _unfold_cells(x: jnp.ndarray, k, s, p, oh: int, ow: int) -> jnp.ndarray:
    """Cell-decomposed unfold: with p % s == 0 every window starts at a
    multiple of the stride, so a window covers exactly nc = ceil(k/s)
    stride-sized cells per axis. One space-to-depth reshape turns the
    kh*kw strided gathers into nc^2 contiguous cell-grid slices."""
    B, H, W, C = x.shape
    nc_h = -(-k[0] // s[0])
    nc_w = -(-k[1] // s[1])
    gh, gw = oh - 1 + nc_h, ow - 1 + nc_w        # cell-grid extent
    xp = jnp.pad(x, ((0, 0),
                     (p[0], gh * s[0] - H - p[0]),
                     (p[1], gw * s[1] - W - p[1]),
                     (0, 0)))
    cells = xp.reshape(B, gh, s[0], gw, s[1], C)
    rows = jnp.stack([cells[:, dy:dy + oh] for dy in range(nc_h)],
                     axis=2)                      # [B, oh, nc_h, s0, gw, s1, C]
    win = jnp.stack([rows[:, :, :, :, dx:dx + ow]
                     for dx in range(nc_w)], axis=5)
    # [B, oh, nc_h, s0, ow, nc_w, s1, C] -> pixel-major windows
    win = win.reshape(B, oh, nc_h * s[0], ow, nc_w * s[1], C)
    win = win[:, :, :k[0], :, :k[1], :]           # drop cell overhang
    # torch feature order: c slowest, then i (kh), then j (kw)
    win = win.transpose(0, 1, 3, 5, 2, 4)         # [B, oh, ow, C, kh, kw]
    return win.reshape(B, oh * ow, C * k[0] * k[1])


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
    if _cells_eligible(k, s, p):
        return _fold_cells(patches, out_spatial, k, s, p, channels, oh, ow)
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


def _fold_cells(patches: jnp.ndarray, out_spatial: tuple, k, s, p,
                channels: int, oh: int, ow: int) -> jnp.ndarray:
    """Cell-decomposed fold (adjoint of :func:`_unfold_cells`): scatter
    each window into the stride-cell grid with nc = ceil(k/s) shifted
    CONTIGUOUS adds per axis instead of kh*kw interior-padded scatters,
    then depth-to-space back to pixels."""
    B = patches.shape[0]
    nc_h = -(-k[0] // s[0])
    nc_w = -(-k[1] // s[1])
    gh, gw = oh - 1 + nc_h, ow - 1 + nc_w
    pt = patches.reshape(B, oh, ow, channels, k[0], k[1])
    pt = jnp.pad(pt, ((0, 0), (0, 0), (0, 0), (0, 0),
                      (0, nc_h * s[0] - k[0]), (0, nc_w * s[1] - k[1])))
    pt = pt.reshape(B, oh, ow, channels, nc_h, s[0], nc_w, s[1])
    pt = pt.transpose(0, 1, 4, 5, 2, 6, 7, 3)
    # [B, oh, nc_h, s0, ow, nc_w, s1, C]
    acc = None
    for dy in range(nc_h):
        row = jnp.pad(pt[:, :, dy], ((0, 0), (dy, nc_h - 1 - dy),
                                     (0, 0), (0, 0), (0, 0), (0, 0),
                                     (0, 0)))
        acc = row if acc is None else acc + row
    out = None
    for dx in range(nc_w):                       # acc: [B,gh,s0,ow,nc_w,s1,C]
        col = jnp.pad(acc[:, :, :, :, dx], ((0, 0), (0, 0), (0, 0),
                                            (dx, nc_w - 1 - dx), (0, 0),
                                            (0, 0)))
        out = col if out is None else out + col  # [B, gh, s0, gw, s1, C]
    img = out.reshape(B, gh * s[0], gw * s[1], channels)
    return img[:, p[0]:p[0] + out_spatial[0], p[1]:p[1] + out_spatial[1], :]


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
