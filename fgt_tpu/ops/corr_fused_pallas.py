"""Fused on-the-fly correlation lookup for RAFT — no pyramid in HBM.

The pyramid paths (XLA `lookup_corr_pyramid`, Pallas
`lookup_corr_pyramid_pallas`) precompute the all-pairs correlation
volume — [B*H*W, H_i, W_i] per level, ~10 GB at the 46-pair bench batch
— and re-stream the whole thing from HBM every GRU iteration. The op
trace (docs/raft_trace_r05.md) shows the refine scan is copy-dominated:
the lookup's HBM streaming, not its math, is the cost.

This kernel inverts the dataflow (reference semantics: RAFT/corr.py's
optional AlternateCorrBlock, corr.py:62-84, fused with the bilinear
sampling of utils/utils.py:57-72) and serves ALL pyramid levels from a
single level-0 correlation slab:

* the level-0 FEATURE map of the target frame (x-padded to a 128-lane
  multiple) is DMA'd into a single-buffered VMEM scratch ONCE per pair
  — 4 MB, not 4 GB;
* each pixel block computes its level-0 correlation rows on the MXU on
  the fly (`f1_block @ fmap2.T`, f32 accumulation) — the [bn, H0, Wp]
  slab lives only in VMEM;
* every pyramid level's bilinear taps are contracted FROM THAT SLAB.
  Average-pooling the correlation commutes with the channel dot
  (pooling is linear — reference corr.py:12-27 pools the corr volume;
  pooling fmap2 first gives the same values, and pooling the slab is
  the same contraction again), so a level-l tap index t is just the
  mean of level-0 cells [t*2^l, (t+1)*2^l) — the one-hot axis weights
  are EXPANDED to the level-0 grid with weight 1/2^l per axis instead
  of pooling the slab l times. Reference floor-pooling on odd dims
  (e.g. 15 -> 7 drops the last row) falls out of the `t < size_l`
  validity mask.

Per GRU iteration this costs ONE kernel launch and ONE [N, C] x
[C, H0*Wp] MXU dot (the round-5a version launched 4 kernels and paid
the L1-L3 dots against x-padded levels — 2x the FLOPs at bench shape),
and per-iteration HBM traffic is (fmap1 + fmap2-once-per-pair + taps):
~30x less than the pyramid paths. Taps are written lane-packed
[N, levels*(2r+1)^2] in the FEATURE dtype — the [N, 9, 9]-per-level
f32 layout of the first version padded each tap row to 128 lanes and
the XLA reshape back repacked 2.4 GB per level per iteration
(docs/raft_trace_r05.md, round-5b re-trace).

Numerics: identical contraction to `lookup_corr_pyramid` up to f32
reassociation. Taps outside a level's image are exactly zero
(grid_sample zeros-padding semantics) via the explicit bounds masks.
With bfloat16 features the correlation is computed FROM bf16 operands
in f32 — strictly closer to the f32 reference than the production
bf16-storage pyramid, which rounds the f32 correlation values
themselves to bf16.
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
                  radius: int, H0: int, W0: int, Wp: int,
                  sizes: tuple, blocks_per_pair: int, scale: float):
    """One [bn] pixel block -> [bn, levels*k*k] taps (level-major; dx
    slow, dy fast within a level).

    cxy_ref: [bn, 2] LEVEL-0 coords; f1_ref: [bn, C];
    f2_ref: [B, H0*Wp, C] in ANY/HBM (manually DMA'd: Mosaic would
    double-buffer a pipelined input, and two copies of level-0 fmap2
    don't fit VMEM next to the correlation slab); f2_vmem: [H0*Wp, C]
    scratch, persistent across the sequential grid, refreshed when the
    block crosses a pair boundary. sizes: ((H_l, W_l), ...) per level.
    """
    k = 2 * radius + 1
    kk = k * k
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
        preferred_element_type=jnp.float32)          # [bn, H0*Wp]
    vol = (vol * scale).reshape(bn, H0, Wp)

    cx = cxy_ref[:, 0].astype(jnp.float32)
    cy = cxy_ref[:, 1].astype(jnp.float32)

    def axis_weights(c0, lvl, size_l, size0):
        # Expanded level-l bilinear one-hot over the LEVEL-0 axis: tap
        # cell t at level l covers level-0 cells [t*2^l, (t+1)*2^l) at
        # weight 1/2^l (avg-pool linearity). Cells outside [0, size_l)
        # contribute exactly zero (bilinear_sampler zeros padding +
        # reference floor-pooling drops trailing odd rows/cols).
        step = 2 ** lvl
        c = c0 * (1.0 / step)
        cf = jnp.floor(c)
        frac = (c - cf)[:, None, None]
        d = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1) - radius
        t = cf.astype(jnp.int32)[:, None, None] + d          # [bn, k, 1]
        g = jax.lax.broadcasted_iota(
            jnp.int32, (bn, k, size0), 2) // step
        inv = 1.0 / step
        w = jnp.where((g == t) & (t < size_l), (1.0 - frac) * inv, 0.0)
        w = w + jnp.where((g == t + 1) & (t + 1 < size_l), frac * inv,
                          0.0)
        return w.astype(jnp.float32)

    # ALL levels' tap weights ride ONE pair of batched contractions:
    # separate per-level dots have M = k = 9 rows — the MXU pads each
    # batched matmul to a full pass, so 8 tiny dots per pixel cost ~4x
    # what one M = levels*k dot does (measured: 64.6 -> dominated by
    # tap dots, round-5b kernel micro-bench). The cross product
    # computes off-diagonal level pairs too (+4x tap FLOPs, still
    # <25% of the corr dot); the diagonal blocks are the taps.
    wy_all = jnp.concatenate(
        [axis_weights(cy, lvl, hl, H0)
         for lvl, (hl, _) in enumerate(sizes)], axis=1)  # [bn, L*k, H0]
    wx_all = jnp.concatenate(
        [axis_weights(cx, lvl, wl, Wp)
         for lvl, (_, wl) in enumerate(sizes)], axis=1)  # [bn, L*k, Wp]
    tmp = jax.lax.dot_general(
        wy_all, vol, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [bn, L*k(dy), Wp]
    cross = jax.lax.dot_general(
        wx_all, tmp, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)    # [bn, L*k(dx), L*k(dy)]
    cross = cross.astype(out_ref.dtype)
    for lvl in range(len(sizes)):
        # lane-packed flat store: k strided column writes per level
        # instead of a [bn, k, k] output (whose T(8,128) tiling pads
        # each 9-lane tap row to 128 and forces a 2.4 GB XLA repack)
        for i in range(k):
            out_ref[:, lvl * kk + i * k: lvl * kk + (i + 1) * k] = \
                cross[:, lvl * k + i, lvl * k: (lvl + 1) * k]


def _fused_block_n(HW0: int, Hi: int, Wp: int, C: int, k: int,
                   itemsize: int, vmem_budget: int = 12 << 20,
                   cap: int = 512, levels: int = 4) -> int:
    """Largest divisor of HW0 (pixels per pair; blocks must not cross a
    pair boundary) whose VMEM footprint fits. Tiling-aware: minor dims
    pad to 128 lanes, second-minor to the sublane count."""
    lane = 128
    lkp = _round_up(levels * k, 8)
    f2_scratch = _round_up(Hi * Wp, 16 if itemsize == 2 else 8) \
        * C * itemsize
    per_px = (
        2 * C * itemsize                      # f1 in (double-buffered)
        + Hi * Wp * 4                         # level-0 corr slab (f32)
        + 2 * lkp * _round_up(Hi, lane) * 4   # wy_all + build iota
        + 2 * lkp * Wp * 4                    # wx_all + build iota
        + lkp * Wp * 4                        # tmp
        + lkp * _round_up(levels * k, lane) * 4   # cross product
        + 2 * _round_up(levels * k * k, lane) * itemsize  # out (dbl)
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


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _lookup_pyramid_fused(f1: jnp.ndarray, f2: jnp.ndarray,
                          cxy: jnp.ndarray, dims: tuple, sizes: tuple,
                          radius: int, block_n: int = 0,
                          interpret: bool = False):
    """f1: [N, C] (N = B*HW0); f2: [B, H0*Wp, C] x-zero-padded level-0
    features; cxy: [N, 2] level-0 coords. Returns
    [N, levels*(2r+1)^2] in f2's dtype."""
    H0, W0, Wp = dims
    N, C = f1.shape
    B = f2.shape[0]
    HW0 = N // B
    k = 2 * radius + 1
    if not block_n:
        block_n = _fused_block_n(HW0, H0, Wp, C, k, f2.dtype.itemsize,
                                 levels=len(sizes))
        assert block_n, (
            f"no divisor of {HW0} pixels fits VMEM at level-0 dims "
            f"{dims}")
    grid = (N // block_n,)
    nk = len(sizes) * k * k
    out = pl.pallas_call(
        functools.partial(_fused_kernel, radius=radius, H0=H0, W0=W0,
                          Wp=Wp, sizes=sizes,
                          blocks_per_pair=HW0 // block_n,
                          scale=1.0 / float(C) ** 0.5),
        out_shape=jax.ShapeDtypeStruct((N, nk), f2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 2), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, C), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block_n, nk), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H0 * Wp, C), f2.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(cxy, f1, f2)
    return out


def pad_fmap_pyramid(fmap2_pyramid, dtype=None):
    """Pack the feature pyramid for the fused lookup: ONLY level 0 is
    materialized ([B, H0*Wp, C], x zero-padded to a 128-lane multiple so
    the kernel's [bn, H0*Wp] -> [bn, H0, Wp] reshape is layout-free);
    levels > 0 contribute just their (H_l, W_l) bounds — the kernel
    folds their pooling into the tap weights. Zero columns are exact:
    padded taps are masked AND dot against zero feature vectors. Done
    ONCE per refine call, outside the GRU loop (XLA dead-code-eliminates
    the pooled feature levels this no longer consumes)."""
    f2 = fmap2_pyramid[0]
    B, H0, W0, C = f2.shape
    Wp = _round_up(W0, 128)
    if dtype is not None:
        f2 = f2.astype(dtype)
    if Wp != W0:
        f2 = jnp.pad(f2, ((0, 0), (0, 0), (0, Wp - W0), (0, 0)))
    sizes = tuple((int(f.shape[1]), int(f.shape[2]))
                  for f in fmap2_pyramid)
    return ((H0, W0, Wp), sizes), f2.reshape(B, H0 * Wp, C)


def lookup_corr_fused(fmap1: jnp.ndarray, f2_packed, coords: jnp.ndarray,
                      radius: int, interpret: bool | None = None):
    """Drop-in lookup with `lookup_corr_pyramid`'s output contract.

    fmap1: [B, H, W, C]; f2_packed: output of `pad_fmap_pyramid`;
    coords: [B, H, W, 2] level-0 (x, y).
    Returns [B, H, W, levels*(2r+1)^2] in the feature dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    (dims, sizes), f2 = f2_packed
    B, H, W, C = fmap1.shape
    N = B * H * W
    k = 2 * radius + 1
    f1 = fmap1.reshape(N, C).astype(f2.dtype)
    cxy = coords.reshape(N, 2)
    out = _lookup_pyramid_fused(f1, f2, cxy, dims, sizes, radius,
                                interpret=interpret)
    return out.reshape(B, H, W, len(sizes) * k * k)
