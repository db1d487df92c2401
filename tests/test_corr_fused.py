"""Fused on-the-fly correlation lookup (ops/corr_fused_pallas) vs the
pyramid reference path.

The fused kernel must reproduce `lookup_corr_pyramid` (the XLA path that
torch-parity tests pin against RAFT/corr.py:29-50) up to f32 matmul
reassociation — pooling fmap2 commutes with the channel contraction
because avg_pool is linear. Interpret mode on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgt_tpu.models.raft import (RAFT, RAFTConfig, build_corr_pyramid,
                                 build_fmap_pyramid, lookup_corr_pyramid)
from fgt_tpu.ops.corr_fused_pallas import (_fused_block_n,
                                           lookup_corr_fused,
                                           pad_fmap_pyramid)


def _case(B, H, W, C, seed=0, spread=6.0):
    r = np.random.RandomState(seed)
    f1 = jnp.asarray(r.randn(B, H, W, C), jnp.float32)
    f2 = jnp.asarray(r.randn(B, H, W, C), jnp.float32)
    coords = jnp.asarray(
        r.rand(B, H, W, 2) * [W, H] + r.randn(B, H, W, 2) * spread,
        jnp.float32)
    return f1, f2, coords


@pytest.mark.parametrize("radius,levels", [(4, 4), (3, 4), (4, 1)])
def test_fused_matches_pyramid_f32(radius, levels):
    f1, f2, coords = _case(3, 16, 24, 64)
    ref = lookup_corr_pyramid(build_corr_pyramid(f1, f2, levels), coords,
                              radius)
    fp = pad_fmap_pyramid(build_fmap_pyramid(f2, levels))
    got = lookup_corr_fused(f1, fp, coords, radius, interpret=True)
    assert got.shape == ref.shape
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5 * scale)


def test_fused_bf16_features_close():
    """bf16 features round the INPUTS (2^-8 relative); the production
    bf16 pyramid rounds the correlation VALUES — same error regime."""
    f1, f2, coords = _case(2, 16, 24, 64, seed=1)
    ref = lookup_corr_pyramid(build_corr_pyramid(f1, f2, 4), coords, 4)
    fp = pad_fmap_pyramid(build_fmap_pyramid(f2, 4), dtype=jnp.bfloat16)
    got = lookup_corr_fused(f1, fp, coords, 4, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2 * scale)


def test_fused_far_out_of_range_coords_zero():
    """grid_sample zeros semantics: taps fully outside every level must
    be exactly zero (reference bilinear_sampler zero-padding)."""
    f1, f2, _ = _case(1, 16, 24, 32)
    coords = jnp.full((1, 16, 24, 2), 1e4, jnp.float32)
    fp = pad_fmap_pyramid(build_fmap_pyramid(f2, 4))
    got = lookup_corr_fused(f1, fp, coords, 4, interpret=True)
    assert float(jnp.abs(got).max()) == 0.0
    coords = jnp.full((1, 16, 24, 2), -1e4, jnp.float32)
    got = lookup_corr_fused(f1, fp, coords, 4, interpret=True)
    assert float(jnp.abs(got).max()) == 0.0


def test_fused_padded_column_boundary_exact():
    """Taps straddling the W boundary read zero-padded f2 columns — must
    match the pyramid path bit-for-bit in masking behavior."""
    B, H, W, C = 1, 8, 24, 32
    f1, f2, _ = _case(B, H, W, C, seed=2)
    # coords pinned to the right edge so half of each patch is outside
    coords = jnp.stack(
        [jnp.full((B, H, W), W - 1.25), jnp.full((B, H, W), 3.5)],
        axis=-1).astype(jnp.float32)
    ref = lookup_corr_pyramid(build_corr_pyramid(f1, f2, 4), coords, 4)
    fp = pad_fmap_pyramid(build_fmap_pyramid(f2, 4))
    got = lookup_corr_fused(f1, fp, coords, 4, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5 * scale)


def test_fused_indivisible_hw_uses_any_divisor():
    """HW0 with no multiple-of-8 divisor (e.g. 15*9=135) must still pick
    a pair-aligned block and stay correct."""
    f1, f2, coords = _case(2, 15, 9, 16, seed=3)
    ref = lookup_corr_pyramid(build_corr_pyramid(f1, f2, 2), coords, 2)
    fp = pad_fmap_pyramid(build_fmap_pyramid(f2, 2))
    got = lookup_corr_fused(f1, fp, coords, 2, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5 * scale)


def test_fused_block_picker_bench_shape():
    """At the bench shape (60x108 tokens, C=256, bf16) the picker must
    find a pair-aligned block that fits Mosaic's 16 MB scoped VMEM."""
    bn = _fused_block_n(6480, 60, 128, 256, 9, 2)
    assert bn > 0 and 6480 % bn == 0
    # and level 3 (8x128) allows a wider block than level 0
    bn3 = _fused_block_n(6480, 8, 128, 256, 9, 2)
    assert bn3 >= bn


def test_raft_refine_fused_matches_default():
    """Full RAFT refine with fused_corr vs the default pyramid path:
    same weights, same inputs, near-identical flows."""
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (1, 64, 96, 3)) * 255.0
    img2 = jnp.roll(img, 3, axis=2)
    base = RAFT(RAFTConfig(iters=4))
    vars_ = jax.jit(lambda r, a, b: base.init(r, a, b, iters=1))(
        rng, img, img2)
    ref_lo, ref_up = base.apply(vars_, img, img2, iters=4, test_mode=True)
    fused = RAFT(RAFTConfig(iters=4, fused_corr=True))
    got_lo, got_up = fused.apply(vars_, img, img2, iters=4,
                                 test_mode=True)
    np.testing.assert_allclose(np.asarray(got_up), np.asarray(ref_up),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_lo), np.asarray(ref_lo),
                               rtol=0, atol=5e-4)
