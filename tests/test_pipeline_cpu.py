"""Tests for the classical CPU stages: flowNN propagation + Poisson blend."""

import numpy as np

from fgt_tpu.pipeline.poisson import poisson_blend, _unfilled_mask
from fgt_tpu.pipeline.propagation import (PropagationConfig, consist_check,
                                          get_flownn_gradient, interp)


def test_interp_identity_points():
    img = np.random.rand(16, 20).astype(np.float32)
    ys, xs = np.mgrid[0:16, 0:20]
    out = interp(img, xs.reshape(-1).astype(float), ys.reshape(-1).astype(float))
    np.testing.assert_allclose(out.reshape(16, 20), img, atol=1e-6)


def test_consist_check_zero_flow():
    f = np.zeros((8, 8, 2), np.float32)
    err, uv = consist_check(f, f)
    np.testing.assert_allclose(err, 0, atol=1e-6)


def _make_translating_scene(N=5, H=40, W=48, shift=2):
    """A texture translating right by `shift` px/frame with exact flows."""
    rng = np.random.RandomState(0)
    base = rng.rand(H, W + N * shift, 3).astype(np.float32)
    frames = np.stack([base[:, i * shift: i * shift + W] for i in range(N)],
                      axis=-1)  # [H, W, 3, N]
    # the crop window moves right, so scene content moves LEFT in image
    # coordinates: forward flow u = -shift, backward flow u = +shift
    flow_f = np.zeros((H, W, 2, N - 1), np.float32)
    flow_f[:, :, 0] = -shift
    flow_b = np.zeros((H, W, 2, N - 1), np.float32)
    flow_b[:, :, 0] = shift
    return frames, flow_f, flow_b


def test_flownn_propagation_fills_translating_hole():
    N, H, W, shift = 5, 40, 48, 2
    frames, flow_f, flow_b = _make_translating_scene(N, H, W, shift)

    gx = np.concatenate([np.diff(frames, axis=1),
                         np.zeros((H, 1, 3, N), np.float32)], axis=1)
    gy = np.concatenate([np.diff(frames, axis=0),
                         np.zeros((1, W, 3, N), np.float32)], axis=0)

    # hole only in the middle frame -> neighbors can fill everything
    mask = np.zeros((H, W, N), bool)
    mask[10:20, 20:30, 2] = True
    gx_m, gy_m = gx.copy(), gy.copy()
    gx_m[mask.transpose(0, 1, 2)[:, :, None].repeat(3, 2) if False else mask[:, :, None, :].repeat(3, 2)] = 0
    gy_m[mask[:, :, None, :].repeat(3, 2)] = 0

    cfg = PropagationConfig(consistency_thres=5.0, alpha=0.1)
    out_gx, out_gy, tofill = get_flownn_gradient(
        cfg, gx_m, gy_m, mask, mask.copy(), flow_f, flow_b)

    assert tofill.sum() == 0, "all hole pixels reachable by chaining"
    # recovered gradients should match the ground truth inside the hole
    hole_region = out_gx[10:20, 20:29, :, 2]
    true_region = gx[10:20, 20:29, :, 2]
    err = np.abs(hole_region - true_region).mean()
    assert err < 2e-2, f"gradient recovery error too high: {err}"


def test_flownn_unreachable_pixels_reported():
    N, H, W = 3, 24, 24
    frames = np.random.rand(H, W, 3, N).astype(np.float32)
    gx = np.zeros((H, W, 3, N), np.float32)
    gy = np.zeros((H, W, 3, N), np.float32)
    # hole everywhere in all frames at a fixed region -> unreachable
    mask = np.zeros((H, W, N), bool)
    mask[8:16, 8:16, :] = True
    flow_f = np.zeros((H, W, 2, N - 1), np.float32)
    flow_b = np.zeros((H, W, 2, N - 1), np.float32)
    cfg = PropagationConfig()
    _, _, tofill = get_flownn_gradient(cfg, gx, gy, mask, mask.copy(),
                                       flow_f, flow_b)
    assert tofill[10, 10, 1]


def test_poisson_blend_reconstructs_smooth_patch():
    H, W = 32, 32
    ys = np.linspace(0, 1, H)[:, None, None]
    xs = np.linspace(0, 2, W)[None, :, None]
    img = np.tile(ys + xs, (1, 1, 3)).astype(np.float64)  # linear ramp
    gx = np.diff(img, axis=1)
    gy = np.diff(img, axis=0)
    hole = np.zeros((H, W), bool)
    hole[10:20, 12:22] = True
    target = img.copy()
    target[hole] = 0
    out, unfilled = poisson_blend(target, gx, gy, hole)
    assert unfilled.sum() == 0
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_poisson_blend_empty_hole():
    img = np.random.rand(8, 8, 3)
    out, unfilled = poisson_blend(img, np.diff(img, 1, 1), np.diff(img, 1, 0),
                                  np.zeros((8, 8)))
    np.testing.assert_allclose(out, img)
    assert unfilled.sum() == 0


def test_unfilled_mask_blocked_region():
    hole = np.zeros((10, 10), bool)
    hole[3:7, 3:7] = True
    # all gradients masked inside the hole -> nothing can connect
    gm = hole.copy()
    # expand gm so the perimeter's gradients are also invalid
    gm[2:8, 2:8] = True
    unfilled = _unfilled_mask(hole, gm)
    assert unfilled[4:6, 4:6].all()
    # with no gradient mask, everything connects
    assert _unfilled_mask(hole, np.zeros((10, 10), bool)).sum() == 0


def test_flownn_native_matches_numpy(monkeypatch):
    """The OpenMP kernels (native/fgt_native.cpp flownn_pass/flownn_sample)
    must reproduce the vectorized numpy pass bit-closely."""
    from fgt_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library not built")

    rng = np.random.RandomState(3)
    H, W, N = 48, 64, 7
    mask = np.zeros((H, W, N), bool)
    mask[12:30, 20:44, :] = True
    flow_f = (rng.randn(H, W, 2, N - 1) * 2.5).astype(np.float32)
    flow_b = (-flow_f + rng.randn(H, W, 2, N - 1).astype(np.float32) * 0.4)
    gx = rng.randn(H, W, 3, N).astype(np.float32)
    gy = rng.randn(H, W, 3, N).astype(np.float32)
    cfg = PropagationConfig()

    out_nat = get_flownn_gradient(cfg, gx, gy, mask, mask.copy(),
                                  flow_f, flow_b)
    monkeypatch.setenv("FGT_PROP_NUMPY", "1")
    out_np = get_flownn_gradient(cfg, gx, gy, mask, mask.copy(),
                                 flow_f, flow_b)

    np.testing.assert_array_equal(out_nat[2], out_np[2])
    np.testing.assert_allclose(out_nat[0], out_np[0], atol=1e-3)
    np.testing.assert_allclose(out_nat[1], out_np[1], atol=1e-3)


def test_flownn_frames_layout_matches_reference_layout():
    """get_flownn_gradient_frames (pipeline-natural [N, ...] layouts, no
    transpose copies) must equal the reference-layout entry point."""
    from fgt_tpu.pipeline.propagation import get_flownn_gradient_frames

    rng = np.random.RandomState(5)
    H, W, N = 40, 56, 6
    mask = np.zeros((H, W, N), bool)
    mask[10:28, 18:40, :] = True
    flow_f = (rng.randn(H, W, 2, N - 1) * 2.0).astype(np.float32)
    flow_b = (-flow_f + rng.randn(H, W, 2, N - 1).astype(np.float32) * 0.3)
    gx = rng.randn(H, W, 3, N).astype(np.float32)
    gy = rng.randn(H, W, 3, N).astype(np.float32)
    cfg = PropagationConfig()

    ref = get_flownn_gradient(cfg, gx, gy, mask, mask.copy(),
                              flow_f, flow_b)
    got = get_flownn_gradient_frames(
        cfg, np.ascontiguousarray(gx.transpose(3, 0, 1, 2)),
        np.ascontiguousarray(gy.transpose(3, 0, 1, 2)),
        np.ascontiguousarray(mask.transpose(2, 0, 1)),
        np.ascontiguousarray(flow_f.transpose(3, 0, 1, 2)),
        np.ascontiguousarray(flow_b.transpose(3, 0, 1, 2)))

    np.testing.assert_array_equal(got[2].transpose(1, 2, 0), ref[2])
    np.testing.assert_allclose(got[0].transpose(1, 2, 3, 0), ref[0],
                               atol=1e-5)
    np.testing.assert_allclose(got[1].transpose(1, 2, 3, 0), ref[1],
                               atol=1e-5)


def test_flownn_sparse_fusion_matches_dense_oracle():
    """The hole-pixel-vectorized candidate fusion must equal the dense
    per-frame formulation it replaced (weights, fallback and masking
    included)."""
    import fgt_tpu.pipeline.propagation as P

    rng = np.random.RandomState(7)
    H, W, N = 36, 52, 6
    mask = np.zeros((H, W, N), bool)
    mask[8:26, 14:40, 1:5] = True
    flow_f = (rng.randn(H, W, 2, N - 1) * 3).astype(np.float32)
    flow_b = (-flow_f + rng.randn(H, W, 2, N - 1).astype(np.float32) * 0.5)
    gx = rng.randn(H, W, 3, N).astype(np.float32)
    gy = rng.randn(H, W, 3, N).astype(np.float32)
    cfg = PropagationConfig()

    out_gx, out_gy, tofill = get_flownn_gradient(
        cfg, gx, gy, mask, mask.copy(), flow_f, flow_b)

    # dense oracle, recomputed from the same pass/sample primitives
    (h_bn, bx, by, bt, c_bn), (h_fn, fx, fy, ft, c_fn) = \
        P._run_passes(mask, flow_f, flow_b, cfg)
    gx_bn = P._sample(gx, h_bn, bx, by, bt, mask, True)
    gy_bn = P._sample(gy, h_bn, bx, by, bt, mask, True)
    gx_fn = P._sample(gx, h_fn, fx, fy, ft, mask, False)
    gy_fn = P._sample(gy, h_fn, fx, fy, ft, mask, False)
    ref_gx, ref_gy = gx.copy(), gy.copy()
    ref_tofill = np.zeros((H, W, N), bool)
    for t in range(N):
        have = np.stack([h_bn[:, :, t], h_fn[:, :, t]], axis=2)
        any_nn = have.any(axis=2)
        w = np.exp(-np.stack([c_bn[:, :, t], c_fn[:, :, t]], axis=2)
                   / cfg.alpha) * have
        wsum = w.sum(axis=2, keepdims=True)
        fallback = have / np.maximum(have.sum(axis=2, keepdims=True), 1)
        weights = np.where(wsum > 0, w / np.maximum(wsum, 1e-30), fallback)
        for grad, cands in ((ref_gx, (gx_bn, gx_fn)),
                            (ref_gy, (gy_bn, gy_fn))):
            fused = sum(c[:, :, :, t] * weights[:, :, i:i + 1]
                        for i, c in enumerate(cands))
            grad[:, :, :, t] = np.where(any_nn[:, :, None], fused,
                                        grad[:, :, :, t])
        ref_tofill[:, :, t] = (~any_nn) & mask[:, :, t]

    np.testing.assert_array_equal(tofill, ref_tofill)
    np.testing.assert_allclose(out_gx, ref_gx, atol=1e-6)
    np.testing.assert_allclose(out_gy, ref_gy, atol=1e-6)


def test_flownn_nonlocal_candidates_fill_unreachable_holes():
    """--Nonlocal contract: when temporal chaining fails (inconsistent
    local flows) the key-source candidates [0, N//2, N-1] fill pixels whose
    key-frame target is known (reference common_utils.py:332-417; the
    reference CLI never wires this path - we implement it)."""
    rng = np.random.RandomState(5)
    H, W, N = 32, 40, 6
    mask = np.zeros((H, W, N), bool)
    mask[8:20, 10:26, 1:] = True  # key frame 0 fully known

    # local flows: point far out of the image -> every chain lands out of
    # bounds and is rejected
    flow_f = np.full((H, W, 2, N - 1), 1000.0, np.float32)
    flow_b = np.full((H, W, 2, N - 1), 1000.0, np.float32)

    gx = rng.randn(H, W, 3, N).astype(np.float32)
    gy = rng.randn(H, W, 3, N).astype(np.float32)
    # static scene: gradients identical across frames
    gx[...] = gx[:, :, :, :1]
    gy[...] = gy[:, :, :, :1]

    # nonlocal flows: exact zeros (static scene), perfectly consistent
    nl_f = np.zeros((H, W, 2, 3, N), np.float32)
    nl_b = np.zeros((H, W, 2, 3, N), np.float32)

    cfg = PropagationConfig()
    gx_m = gx.copy()
    gx_m[mask[:, :, None, :].repeat(3, 2)] = 0

    _, _, tofill_local = get_flownn_gradient(
        cfg, gx_m, gx_m, mask, mask.copy(), flow_f, flow_b)
    assert tofill_local.sum() == mask.sum(), "local chains must all fail"

    out_gx, _, tofill_nl = get_flownn_gradient(
        cfg, gx_m, gx_m, mask, mask.copy(), flow_f, flow_b,
        nonlocal_flow_f=nl_f, nonlocal_flow_b=nl_b)
    assert tofill_nl.sum() == 0, "key frame 0 reaches every hole pixel"
    # interior recovered from key frame 0 (sampling at integer coords)
    np.testing.assert_allclose(out_gx[9:19, 11:25, :, 3],
                               gx[9:19, 11:25, :, 3], atol=1e-4)


def test_norm_flows_zero_channel_guard():
    """An all-zero flow channel must not produce NaN/inf (reference
    :402-407 would 0/0; guarded here)."""
    from fgt_tpu.pipeline.video_inpainting import norm_flows

    flows = np.zeros((2, 8, 8, 2), np.float32)
    flows[0, ..., 0] = np.random.rand(8, 8)
    out = norm_flows(flows)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0, ..., 0].max(), 1.0, atol=1e-6)
    # signed-max quirk preserved: all-negative channel flips sign
    flows[1, ..., 1] = -np.random.rand(8, 8) - 0.5
    out = norm_flows(flows)
    assert np.isfinite(out).all()
    assert out[1, ..., 1].min() >= 0  # divided by the (negative) max
