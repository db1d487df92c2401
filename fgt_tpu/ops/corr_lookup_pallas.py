"""Pallas TPU kernel for RAFT's correlation-pyramid lookup.

The XLA path (`fgt_tpu.models.raft.lookup_corr_pyramid`) synthesizes
bilinear taps with separable one-hot einsums; it is ~27-50x faster than
scalar gathers but materializes its per-pixel row band plus [N, k, W]
weight and partial tensors in HBM every GRU iteration — the band gather
alone moves the data twice (read + write) in small per-pixel DMAs
(reference semantics: RAFT/corr.py:29-50 + bilinear_sampler
RAFT/utils/utils.py:57-72).

This kernel executes the same one-hot contraction *block-wise in VMEM*:
each program streams a [BN, H, W] slab of per-pixel correlation maps
(one contiguous DMA — the pixel's whole map), builds the bilinear
one-hot weights on the fly with iota comparisons, and contracts both
axes without any intermediate leaving VMEM. HBM traffic per call drops
to (volume + coords + taps) — the information-theoretic floor for a
contiguous-streaming access pattern.

Round-5 finding (op trace, docs/raft_trace_r05.md): a "band pre-slice"
variant that fed the kernel per-pixel row bands LOST to this full-map
kernel end-to-end — the HLO-level dynamic-slice gather + re-pad of the
band tensor cost more than the full-map streaming it saved. Equally
important, ``jnp.pad`` of the volume to a block multiple fires INSIDE
the GRU iteration loop (the volume is loop-invariant but XLA does not
hoist the copy), duplicating the entire pyramid level per iteration —
so the block size is now chosen as a divisor of N whenever one exists
and the pad path is kept only as a fallback for indivisible N.

Numerics match `_patch_bilinear_taps` exactly (zero outside the volume,
reference tap order: dx on the slow axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_kernel(cxy_ref, vol_ref, out_ref, *, radius: int):
    """One [BN, H, W] slab -> [BN, k, k] taps (dx slow, dy fast; the
    caller flattens — Mosaic's vector layout can't shape-cast
    [BN, k, k] -> [BN, k*k] in-kernel).

    cxy_ref: [BN, 2] (col 0 = cx, col 1 = cy) at this level's scale.
    """
    k = 2 * radius + 1
    bn, H, W = vol_ref.shape
    vol = vol_ref[:].astype(jnp.float32)            # [BN, H, W]
    cx = cxy_ref[:, 0].astype(jnp.float32)          # [BN]
    cy = cxy_ref[:, 1].astype(jnp.float32)

    def axis_weights(c, size):
        """[BN, k, size] bilinear one-hot rows (matches _axis_weights
        with start=0, P=size: invalid corners contribute zero).

        Only ONE full-[BN, k, size] integer temp (the position iota) is
        materialized — the tap corner indices stay [BN, k, 1] and the two
        one-hot terms collapse into a nested select (t and t+1 are
        distinct integers, so the sum and the nested where are the same
        values bit-for-bit). The previous 3-full-iota form overflowed
        Mosaic's 16 MB scoped VMEM at wide blocks."""
        c0 = jnp.floor(c)
        frac = (c - c0)[:, None, None]              # [BN, 1, 1]
        d = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1) - radius
        t = c0.astype(jnp.int32)[:, None, None] + d  # [BN, k, 1] corner-0
        ar = jax.lax.broadcasted_iota(jnp.int32, (bn, k, size), 2)
        return jnp.where(ar == t, 1.0 - frac,
                         jnp.where(ar == t + 1, frac, 0.0)
                         ).astype(jnp.float32)      # [BN, k, size]

    wy = axis_weights(cy, H)                        # [BN, k, H]
    wx = axis_weights(cx, W)                        # [BN, k, W]

    # contract y then x, everything VMEM-resident
    tmp = jax.lax.dot_general(
        wy, vol, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # [BN, k(dy), W]
    taps = jax.lax.dot_general(
        wx, tmp, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # [BN, k(dx), k(dy)]
    out_ref[:] = taps.astype(out_ref.dtype)


def _scoped_bytes_per_px(H: int, W: int, k: int, itemsize: int) -> int:
    """Tiling-aware per-pixel scoped-VMEM estimate for one kernel block.

    Mosaic lays every [bn, a, b] array out with b padded to 128 lanes and
    a padded to the dtype sublane (8 f32 / 16 bf16) — so the k=9 and
    W=54 minor dims of the weight/tap tensors really cost 128 lanes each.
    Calibrated against compiler reports: the L1 bench block (H=30, W=54,
    bf16) measured 17.13 MB at bn=240 -> ~71 KB/px; this model gives
    ~107 KB/px for it (deliberately ~1.5x conservative)."""
    lane = 128

    def pad(x, m):
        return -(-x // m) * m

    wp = pad(W, lane)
    kp = pad(k, 8)
    vol_in = 2 * pad(H, 16 if itemsize == 2 else 8) * wp * itemsize
    vol_f32 = pad(H, 8) * wp * 4
    wy = 3 * kp * pad(H, lane) * 4        # weights + select temps
    wx = 3 * kp * wp * 4
    tmp = kp * wp * 4
    out = 2 * kp * pad(k, lane) * 4
    return vol_in + vol_f32 + wy + wx + tmp + out


def _pick_block_n(N: int, H: int, W: int, k: int, itemsize: int,
                  vmem_budget: int = 12 << 20, cap: int = 1024) -> int:
    """Largest multiple-of-8 divisor of N whose per-block scoped VMEM
    fits Mosaic's 16 MB stack (12 MB target for margin).
    Returns 0 when no multiple-of-8 divisor exists (caller pads)."""
    per_px = _scoped_bytes_per_px(H, W, k, itemsize)
    limit = min(cap, max(8, vmem_budget // max(per_px, 1)))
    bn = (limit // 8) * 8
    while bn >= 8:
        if N % bn == 0:
            return bn
        bn -= 8
    return 0


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def lookup_level_pallas(vol: jnp.ndarray, cxy: jnp.ndarray, radius: int,
                        block_n: int = 0, interpret: bool = False):
    """All-pixels bilinear patch taps of one pyramid level.

    vol: [N, H, W] per-pixel correlation maps; cxy: [N, 2] (cx, cy) at
    this level's coordinates. Returns [N, (2r+1)^2] float32.

    ``block_n=0`` picks the largest divisor of N that fits VMEM so the
    volume is never copied: a pad to a non-divisor block multiple
    duplicates the ENTIRE level in HBM, and inside the RAFT GRU loop
    that copy re-fires every iteration (docs/raft_trace_r05.md).
    """
    N, H, W = vol.shape
    k = 2 * radius + 1
    if not block_n:
        block_n = _pick_block_n(N, H, W, k, vol.dtype.itemsize)
        if not block_n:       # indivisible N: pad (copies vol — rare)
            block_n = 64
    pad = (-N) % block_n
    if pad:
        vol = jnp.pad(vol, ((0, pad), (0, 0), (0, 0)))
        cxy = jnp.pad(cxy, ((0, pad), (0, 0)))
    n_pad = N + pad
    grid = (n_pad // block_n,)
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, radius=radius),
        out_shape=jax.ShapeDtypeStruct((n_pad, k, k), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 2), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, H, W), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, k, k), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cxy, vol)
    return out.reshape(n_pad, k * k)[:N]


def lookup_corr_pyramid_pallas(pyramid, coords: jnp.ndarray, radius: int,
                               interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in twin of `lookup_corr_pyramid` backed by the VMEM kernel.

    pyramid: list of [N, H_i, W_i] volumes; coords: [B, H, W, 2] level-0
    (x, y). Returns [B, H, W, levels*(2r+1)^2]. On non-TPU backends the
    kernel runs in interpreter mode (tests / CPU meshes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, _ = coords.shape
    N = B * H * W
    k = 2 * radius + 1
    flat = coords.reshape(N, 2)                     # [N, 2] (cx, cy)
    outs = []
    for i, vol in enumerate(pyramid):
        cxy = flat / (2 ** i)
        outs.append(lookup_level_pallas(vol, cxy, radius,
                                        interpret=interpret))
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(B, H, W, len(pyramid) * k * k)
