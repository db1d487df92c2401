"""Native CPU kernels vs their scipy/numpy reference implementations."""

import numpy as np
import pytest

from fgt_tpu import native
from fgt_tpu.core.region_fill import regionfill
from fgt_tpu.pipeline.propagation import interp

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_laplace_fill_matches_sparse_solve():
    rng = np.random.RandomState(0)
    img = rng.rand(40, 56)
    mask = np.zeros((40, 56), bool)
    mask[10:25, 15:35] = True
    want = regionfill(img * (1 - mask), mask)
    got = native.laplace_fill((img * (1 - mask)).astype(np.float64),
                              mask)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_diffuse_flows_matches_python_loop():
    rng = np.random.RandomState(1)
    flows = rng.randn(3, 32, 48, 2).astype(np.float32)
    masks = np.zeros((3, 32, 48, 1), np.float32)
    masks[:, 8:20, 10:30] = 1
    from fgt_tpu.pipeline.video_inpainting import diffusion

    got = native.diffuse_flows(flows * (1 - masks), masks[..., 0] > 0)
    want = np.zeros_like(flows)
    for i in range(3):
        for c in range(2):
            want[i, :, :, c] = regionfill(flows[i, :, :, c]
                                          * (1 - masks[i, :, :, 0]),
                                          masks[i, :, :, 0])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_diffuse_flows_multigrid_large_border_hole():
    """Outpainting-style border holes (~70% of the canvas) go through the
    V-cycle multigrid path; it must agree with the exact sparse solve.
    (Zero-init SOR needed ~19 s per flow at 864x480; multigrid ~0.6 s.)"""
    rng = np.random.RandomState(3)
    h, w = 120, 216  # same hole geometry as 2x outpainting, 1/4 scale
    mask = np.ones((1, h, w), bool)
    mask[0, h // 4:3 * h // 4, w // 4:3 * w // 4] = False
    flow = rng.randn(1, h, w, 2).astype(np.float32) * (~mask[..., None])
    got = native.diffuse_flows(flow, mask)
    want = np.stack([regionfill(flow[0, :, :, c], mask[0])
                     for c in range(2)], -1)
    np.testing.assert_allclose(got[0], want, atol=1e-4)


def test_diffuse_flows_multigrid_multiframe_identical_masks():
    """N>=2 frames with the SAME large hole: the per-thread FMGPlan is
    retained across frames (matches() short-circuits the rebuild); every
    frame must still agree with the exact per-frame sparse solve (a stale
    residual/work buffer in the reused plan would show up here)."""
    rng = np.random.RandomState(7)
    h, w = 96, 144
    mask = np.zeros((h, w), bool)
    mask[20:80, 30:110] = True          # 4800 px >= 2048 -> multigrid
    masks = np.stack([mask] * 3)
    flows = rng.randn(3, h, w, 2).astype(np.float32) * 4.0
    flows *= ~masks[..., None]
    got = native.diffuse_flows(flows, masks)
    for i in range(3):
        for c in range(2):
            want = regionfill(flows[i, :, :, c], masks[i])
            np.testing.assert_allclose(got[i, :, :, c], want, atol=1e-4,
                                       err_msg=f"frame {i} ch {c}")


def test_diffuse_flows_multigrid_multiframe_different_masks():
    """N>=2 frames with DIFFERENT large holes: matches() must reject the
    previous frame's plan and build() must fully reinitialize the level
    hierarchy for the new mask."""
    rng = np.random.RandomState(8)
    h, w = 96, 144
    masks = np.zeros((3, h, w), bool)
    masks[0, 10:70, 20:100] = True      # 4800 px
    masks[1, 30:90, 40:130] = True      # shifted hole, same size class
    masks[2, 5:55, 10:120] = True       # 5500 px, different shape
    flows = rng.randn(3, h, w, 2).astype(np.float32) * 4.0
    flows *= ~masks[..., None]
    got = native.diffuse_flows(flows, masks)
    for i in range(3):
        for c in range(2):
            want = regionfill(flows[i, :, :, c], masks[i])
            np.testing.assert_allclose(got[i, :, :, c], want, atol=1e-4,
                                       err_msg=f"frame {i} ch {c}")


def test_bilinear_interp_matches_cv2():
    rng = np.random.RandomState(2)
    img = rng.rand(30, 40, 3).astype(np.float32)
    xs = rng.rand(500).astype(np.float32) * 50 - 5  # incl. out of range
    ys = rng.rand(500).astype(np.float32) * 40 - 5
    want = interp(img, xs, ys)
    got = native.bilinear_interp(img, xs, ys)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilinear_interp_single_channel():
    rng = np.random.RandomState(3)
    img = rng.rand(20, 20).astype(np.float32)
    xs = rng.rand(100).astype(np.float32) * 19
    ys = rng.rand(100).astype(np.float32) * 19
    want = interp(img, xs, ys)
    got = native.bilinear_interp(img, xs, ys)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unfilled_mask_matches_numpy_fixpoint(monkeypatch):
    """Single-raster-pass kernel == the vectorized fixpoint iterations
    (exactness of the acyclic-DP argument), incl. border-touching holes
    (outpainting) and gradient-mask patterns."""
    from fgt_tpu.pipeline import poisson as P

    rng = np.random.RandomState(7)
    for trial in range(25):
        H, W = rng.randint(6, 40), rng.randint(6, 40)
        hole = rng.rand(H, W) < rng.choice([0.15, 0.4, 0.7])
        if trial % 5 == 0:   # border frame hole
            hole[:] = False
            t = rng.randint(1, 4)
            hole[:t] = hole[-t:] = True
            hole[:, :t] = hole[:, -t:] = True
        gm = rng.rand(H, W) < rng.choice([0.0, 0.1, 0.5])
        got = native.unfilled_mask(hole, gm)
        with monkeypatch.context() as m:
            m.setattr(native, "available", lambda: False)
            want = P._unfilled_mask(hole, gm.astype(np.float32))
        assert np.array_equal(got, want), (trial, H, W)
