"""Fused on-the-fly correlation lookup for RAFT — no pyramid in HBM.

The pyramid paths (XLA `lookup_corr_pyramid`, Pallas
`lookup_corr_pyramid_pallas`) precompute the all-pairs correlation
volume — [B*H*W, H_i, W_i] per level, ~10 GB at the 46-pair bench batch
— and re-stream the whole thing from HBM every GRU iteration. The op
trace (docs/raft_trace_r05.md) shows the refine scan is copy-dominated:
the lookup's HBM streaming, not its math, is the cost.

This kernel inverts the dataflow (reference semantics: RAFT/corr.py's
optional AlternateCorrBlock, corr.py:62-84, fused with the bilinear
sampling of utils/utils.py:57-72):

* the level-i FEATURE map of the target frame (`fmap2` average-pooled,
  x-padded to a 128-lane multiple) is DMA'd into a single-buffered VMEM
  scratch ONCE per pair — 4 MB, not 4 GB;
* each pixel block computes its correlation rows on the MXU on the fly
  (`f1_block @ fmap2.T`, f32 accumulation) and immediately contracts
  them with the same bilinear one-hot weights as the pyramid kernels —
  the [bn, H_i, W_p] correlation slab lives only in VMEM;
* per-iteration HBM traffic drops from (volume + taps) to
  (fmap1 + fmap2-once-per-pair + taps): ~20x less at bench shape, and
  the resident pyramid disappears from HBM entirely, which removes the
  reason `auto_raft_chunk` ever had to split the pair batch.

Numerics: identical contraction to `lookup_corr_pyramid` up to f32
reassociation (avg-pooling fmap2 commutes with the channel dot because
pooling is linear — same argument as `lookup_corr_alternate`). Taps
outside the image are exactly zero: out-of-range y never matches the
one-hot iota, and x taps landing in the zero-padded columns dot against
zero feature vectors. With bfloat16 features the correlation is
computed FROM bf16 operands in f32 — strictly closer to the f32
reference than the production bf16-storage pyramid, which rounds the
f32 correlation values themselves to bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fused_kernel(cxy_ref, f1_ref, f2_ref, out_ref, f2_vmem, sem, *,
                  radius: int, Hi: int, Wi: int, Wp: int,
                  blocks_per_pair: int, scale: float):
    """One [bn] pixel block -> [bn, k, k] taps (dx slow, dy fast).

    cxy_ref: [bn, 2] level coords; f1_ref: [bn, C]; f2_ref: [B, Hi*Wp, C]
    in ANY/HBM (manually DMA'd: Mosaic would double-buffer a pipelined
    input, and at level 0 two copies of fmap2 don't fit VMEM next to the
    correlation slab); f2_vmem: [Hi*Wp, C] scratch, persistent across the
    sequential grid, refreshed when the block crosses a pair boundary.
    """
    k = 2 * radius + 1
    bn = cxy_ref.shape[0]

    blk = pl.program_id(0)
    pair = blk // blocks_per_pair

    @pl.when(jax.lax.rem(blk, blocks_per_pair) == 0)
    def _load_f2():
        cp = pltpu.make_async_copy(f2_ref.at[pair], f2_vmem, sem)
        cp.start()
        cp.wait()

    f1 = f1_ref[:]                                   # [bn, C]
    vol = jax.lax.dot_general(
        f1, f2_vmem[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [bn, Hi*Wp]
    vol = (vol * scale).reshape(bn, Hi, Wp)

    cx = cxy_ref[:, 0].astype(jnp.float32)
    cy = cxy_ref[:, 1].astype(jnp.float32)

    def axis_weights(c, size):
        # same slim nested-select one-hot as corr_lookup_pallas
        c0 = jnp.floor(c)
        frac = (c - c0)[:, None, None]
        d = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1) - radius
        t = c0.astype(jnp.int32)[:, None, None] + d
        ar = jax.lax.broadcasted_iota(jnp.int32, (bn, k, size), 2)
        return jnp.where(ar == t, 1.0 - frac,
                         jnp.where(ar == t + 1, frac, 0.0)
                         ).astype(jnp.float32)

    wy = axis_weights(cy, Hi)                        # [bn, k, Hi]
    wx = axis_weights(cx, Wp)                        # [bn, k, Wp]
    tmp = jax.lax.dot_general(
        wy, vol, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [bn, k(dy), Wp]
    taps = jax.lax.dot_general(
        wx, tmp, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [bn, k(dx), k(dy)]
    out_ref[:] = taps


def _fused_block_n(HW0: int, Hi: int, Wp: int, C: int, k: int,
                   itemsize: int, vmem_budget: int = 12 << 20,
                   cap: int = 512) -> int:
    """Largest divisor of HW0 (pixels per pair; blocks must not cross a
    pair boundary) whose VMEM footprint fits. Tiling-aware like
    corr_lookup_pallas._scoped_bytes_per_px: minor dims pad to 128
    lanes, second-minor to the sublane count."""
    lane = 128
    kp = _round_up(k, 8)
    f2_scratch = _round_up(Hi * Wp, 16 if itemsize == 2 else 8) \
        * C * itemsize
    per_px = (
        2 * C * itemsize                      # f1 in (double-buffered)
        + Hi * Wp * 4                         # correlation slab (f32)
        + 2 * kp * _round_up(Hi, lane) * 4    # wy iota + result
        + 2 * kp * Wp * 4                     # wx iota + result
        + kp * Wp * 4                         # tmp
        + 2 * kp * _round_up(k, lane) * 4     # out (double-buffered)
        + 2 * 2 * lane * 4                    # cxy in
    )
    budget = vmem_budget - f2_scratch
    if budget <= 0:
        return 0
    limit = min(cap, max(1, budget // max(per_px, 1)))
    # prefer multiples of 8 (sublane-aligned blocks), fall back to any
    for mult in (8, 1):
        bn = (limit // mult) * mult
        while bn >= mult:
            if HW0 % bn == 0:
                return bn
            bn -= mult
    return 0


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _lookup_level_fused(f1: jnp.ndarray, f2: jnp.ndarray, cxy: jnp.ndarray,
                        dims: tuple, radius: int, block_n: int = 0,
                        interpret: bool = False):
    """f1: [N, C] (N = B*HW0); f2: [B, Hi*Wp, C] x-zero-padded;
    cxy: [N, 2] at this level's scale. Returns [N, (2r+1)^2] f32."""
    Hi, Wi, Wp = dims
    N, C = f1.shape
    B = f2.shape[0]
    HW0 = N // B
    k = 2 * radius + 1
    if not block_n:
        block_n = _fused_block_n(HW0, Hi, Wp, C, k, f2.dtype.itemsize)
        assert block_n, (
            f"no divisor of {HW0} pixels fits VMEM at level dims {dims}")
    grid = (N // block_n,)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, radius=radius, Hi=Hi, Wi=Wi,
                          Wp=Wp, blocks_per_pair=HW0 // block_n,
                          scale=1.0 / float(C) ** 0.5),
        out_shape=jax.ShapeDtypeStruct((N, k, k), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 2), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, C), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block_n, k, k), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hi * Wp, C), f2.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(cxy, f1, f2)
    return out.reshape(N, k * k)


def pad_fmap_pyramid(fmap2_pyramid, dtype=None):
    """[B, Hi, Wi, C] levels -> [B, Hi*Wp, C] with the x axis zero-padded
    to a 128-lane multiple (so the kernel's [bn, Hi*Wp] -> [bn, Hi, Wp]
    reshape is layout-free). Zero columns are exact: padded taps dot
    against zero feature vectors. Done ONCE per refine call, outside the
    GRU loop."""
    out = []
    for f2 in fmap2_pyramid:
        B, Hi, Wi, C = f2.shape
        Wp = _round_up(Wi, 128)
        if dtype is not None:
            f2 = f2.astype(dtype)
        if Wp != Wi:
            f2 = jnp.pad(f2, ((0, 0), (0, 0), (0, Wp - Wi), (0, 0)))
        out.append(((Hi, Wi, Wp), f2.reshape(B, Hi * Wp, C)))
    return out


def lookup_corr_fused(fmap1: jnp.ndarray, f2_padded, coords: jnp.ndarray,
                      radius: int, interpret: bool | None = None):
    """Drop-in lookup with `lookup_corr_pyramid`'s output contract.

    fmap1: [B, H, W, C]; f2_padded: output of `pad_fmap_pyramid`;
    coords: [B, H, W, 2] level-0 (x, y).
    Returns [B, H, W, levels*(2r+1)^2] f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = fmap1.shape
    N = B * H * W
    k = 2 * radius + 1
    f1 = fmap1.reshape(N, C).astype(f2_padded[0][1].dtype)
    flat = coords.reshape(N, 2)
    outs = []
    for i, (dims, f2) in enumerate(f2_padded):
        cxy = flat / (2 ** i)
        outs.append(_lookup_level_fused(f1, f2, cxy, dims, radius,
                                        interpret=interpret))
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(B, H, W, len(f2_padded) * k * k)
