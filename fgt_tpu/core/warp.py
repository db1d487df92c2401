"""Backward/forward warping in JAX (NHWC, TPU-friendly gathers).

* :func:`image_warp` — bilinear backward warp with zero padding; the JAX
  equivalent of the reference's ``grid_sample``-based warp
  (LAFC/models/utils/fbConsistencyCheck.py:8-26, align_corners=True).
* :func:`bilinear_sampler` — pixel-coordinate bilinear sampling used by the
  RAFT correlation lookup (reference RAFT/utils/utils.py:57-72).
* :func:`forward_warp_splat` — gaussian-splat forward warping used for flow
  reversal (reference FGT/data/util/flow_utils/flow_reversal.py:4-100).

All functions take channel-last arrays and are jit/vmap friendly (static
shapes, gathers expressed as take-along-axis so XLA lowers them to efficient
TPU dynamic-gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                     zero_pad: bool = True) -> jnp.ndarray:
    """Sample ``img [H, W, C]`` at float pixel coords ``x, y [N]`` -> [N, C].

    With ``zero_pad`` out-of-bounds taps contribute zero (grid_sample
    'zeros'); otherwise coordinates are clamped to the border.
    """
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi, w):
        if zero_pad:
            valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            w = w * valid.astype(img.dtype)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = img.reshape(H * W, -1)
        vals = jnp.take(flat, yc * W + xc, axis=0)
        return vals * w[:, None]

    out = (tap(x0, y0, wx0 * wy0) + tap(x1, y0, wx1 * wy0)
           + tap(x0, y1, wx0 * wy1) + tap(x1, y1, wx1 * wy1))
    return out


def image_warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``image [B, H, W, C]`` by ``flow [B, H, W, 2]`` (u, v).

    ``out[b, y, x] = image[b, y + v, x + u]`` sampled bilinearly with zero
    padding — identical semantics to the reference's normalized-grid
    ``grid_sample`` call (align_corners=True + 'zeros').
    """
    B, H, W, C = image.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=image.dtype),
                          jnp.arange(W, dtype=image.dtype), indexing="ij")

    def one(img, flo):
        x = (xs + flo[..., 0]).reshape(-1)
        y = (ys + flo[..., 1]).reshape(-1)
        return _gather_bilinear(img, x, y, zero_pad=True).reshape(H, W, C)

    return jax.vmap(one)(image, flow)


def bilinear_sampler(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img [B, H, W, C]`` at pixel ``coords [B, N, 2]`` (x, y).

    Out-of-bounds taps contribute zero, matching the reference RAFT sampler
    (grid_sample align_corners=True, zeros padding).
    """
    def one(im, xy):
        return _gather_bilinear(im, xy[:, 0], xy[:, 1], zero_pad=True)

    return jax.vmap(one)(img, coords)


def forward_warp_splat(flow: jnp.ndarray, data: jnp.ndarray,
                       sigma: float = 0.5) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-warp ``data [B, H, W, C]`` along ``flow [B, H, W, 2]`` with
    gaussian splatting onto the 4 surrounding integer pixels.

    Returns ``(accumulated, weight_sum)``; callers divide (guarding zeros) to
    obtain e.g. the reversed flow (Quadratic Video Interpolation eq. 4;
    reference flow_reversal.py:4-100 uses the same scheme).
    """
    B, H, W, C = data.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=flow.dtype),
                          jnp.arange(W, dtype=flow.dtype), indexing="ij")

    def one(flo, dat):
        tx = (xs + flo[..., 0]).reshape(-1)
        ty = (ys + flo[..., 1]).reshape(-1)
        vals = dat.reshape(-1, C)
        acc = jnp.zeros((H * W, C), dtype=data.dtype)
        wacc = jnp.zeros((H * W, 1), dtype=data.dtype)
        x0, y0 = jnp.floor(tx), jnp.floor(ty)
        for dx in (0.0, 1.0):
            for dy in (0.0, 1.0):
                xi, yi = x0 + dx, y0 + dy
                d2 = (tx - xi) ** 2 + (ty - yi) ** 2
                w = jnp.exp(-d2 / (sigma ** 2))
                valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
                w = w * valid.astype(data.dtype)
                idx = (jnp.clip(yi, 0, H - 1).astype(jnp.int32) * W
                       + jnp.clip(xi, 0, W - 1).astype(jnp.int32))
                acc = acc.at[idx].add(vals * w[:, None])
                wacc = wacc.at[idx].add(w[:, None])
        return acc.reshape(H, W, C), wacc.reshape(H, W, 1)

    return jax.vmap(one)(flow, data)


def reverse_flow(flow: jnp.ndarray, sigma: float = 0.5) -> jnp.ndarray:
    """Invert a flow field by forward-splatting its negation
    (reference flow_reversal contract)."""
    acc, w = forward_warp_splat(flow, -flow, sigma=sigma)
    return jnp.where(w > 1e-6, acc / jnp.maximum(w, 1e-6), 0.0)
