"""End-to-end smoke tests of the video-inpainting pipeline (random weights,
tiny models, synthetic data). Verifies the whole stage machine — RAFT flows,
LAFC completion, gradient propagation, Poisson blending, FGT synthesis, mp4
output — wires together and produces a playable result for all three modes.
"""

import os

import imageio
import numpy as np
from fgt_tpu.core.video_io import read_video
import pytest
import yaml

from fgt_tpu.pipeline import video_inpainting as vi

TINY_LAFC = {
    "model": "lafc", "num_flows": 3, "flow_interval": 3, "cnum": 8,
    "in_channel": 3, "PASSMASK": 1, "use_residual": 1, "resBlocks": 1,
    "use_bias": 1, "conv_type": "vanilla", "use_edges": 0,
}
TINY_FGT = {
    "model": "model", "in_channel": 4, "cnum": 8, "flow_inChannel": 2,
    "flow_cnum": 8, "frame_hidden": 32, "flow_hidden": 16, "PASSMASK": 1,
    "numBlocks": 2, "num_head": 4, "conv_type": "vanilla", "norm": None,
    "use_bias": 1, "ape": 1, "mlp_ratio": 2, "drop": 0, "tw": 2, "sw": 4,
    "gd": 2, "kernel_size_w": 7, "kernel_size_h": 7, "stride_h": 3,
    "stride_w": 3, "pad_h": 3, "pad_w": 3, "res_h": 64, "res_w": 64,
}


def _make_data(tmp_path, n=8, h=64, w=64):
    frames_dir = tmp_path / "frames"
    masks_dir = tmp_path / "masks"
    frames_dir.mkdir()
    masks_dir.mkdir()
    rng = np.random.RandomState(0)
    base = (rng.rand(h, w + 2 * n, 3) * 255).astype(np.uint8)
    for i in range(n):
        frame = base[:, 2 * i: 2 * i + w]
        imageio.imwrite(frames_dir / f"{i:05d}.png", frame)
        mask = np.zeros((h, w), np.uint8)
        mask[24:40, 24 + i:40 + i] = 255
        imageio.imwrite(masks_dir / f"{i:05d}.png", mask)
    return str(frames_dir), str(masks_dir)


def _make_ckpts(tmp_path):
    lafc_dir = tmp_path / "ckpt_lafc"
    fgt_dir = tmp_path / "ckpt_fgt"
    lafc_dir.mkdir()
    fgt_dir.mkdir()
    with open(lafc_dir / "config.yaml", "w") as f:
        yaml.safe_dump(TINY_LAFC, f)
    with open(fgt_dir / "config.yaml", "w") as f:
        yaml.safe_dump(TINY_FGT, f)
    return str(lafc_dir), str(fgt_dir)


def _args(tmp_path, mode, frames, masks, lafc, fgt):
    argv = [
        "--mode", mode, "--path", frames, "--path_mask", masks,
        "--outroot", str(tmp_path / "out"), "--lafc_ckpts", lafc,
        "--fgt_ckpts", fgt, "--raft_model", "/nonexistent",
        "--imgH", "64", "--imgW", "64", "--raft_iters", "2",
        "--flow_mask_dilates", "2", "--frame_dilates", "0",
        "--neighbor_stride", "3", "--step", "4",
        "--raft_chunk", "4", "--lafc_chunk", "4",
    ]
    if mode == "video_extrapolation":
        argv += ["--H_scale", "1.25", "--W_scale", "1.25"]
    args = vi.build_parser().parse_args(argv)
    return args


@pytest.mark.slow
def test_object_removal_end_to_end(tmp_path):
    frames, masks = _make_data(tmp_path)
    lafc, fgt = _make_ckpts(tmp_path)
    args = _args(tmp_path, "object_removal", frames, masks, lafc, fgt)
    # all four reference debug dumps ride along on this run
    args.vis_flows = args.vis_completed_flows = True
    args.vis_prop = args.vis_frame = True
    out = vi.video_inpainting(args)
    assert os.path.exists(out)
    vid = read_video(out)
    assert len(vid) == 8
    assert vid[0].shape[:2] == (64, 64)
    # timings were recorded per stage
    assert os.path.exists(os.path.join(args.outroot, "timings.jsonl"))
    # debug dump layouts match the reference (tool/video_inpainting.py:
    # 120-177 save_flows/save_fgcp, :241-288 vis_flows)
    for sub in ("flow/forward_flo/00000.flo", "flow/backward_png/00000.png",
                "completed_flow/forward_flo/00000.flo",
                "prop_frames/00000.png", "masks_left/00000.png",
                "prop_frames_npy/00000.npy", "masks_left_npy/00000.npy",
                "frames/00000.png"):
        assert os.path.exists(os.path.join(args.outroot, sub)), sub


@pytest.mark.slow
def test_watermark_removal_end_to_end(tmp_path):
    frames, masks = _make_data(tmp_path)
    lafc, fgt = _make_ckpts(tmp_path)
    args = _args(tmp_path, "watermark_removal", frames, masks, lafc, fgt)
    out = vi.video_inpainting(args)
    assert os.path.exists(out)


@pytest.mark.slow
def test_video_extrapolation_end_to_end(tmp_path):
    frames, masks = _make_data(tmp_path)
    lafc, fgt = _make_ckpts(tmp_path)
    args = _args(tmp_path, "video_extrapolation", frames, masks, lafc, fgt)
    out = vi.video_inpainting(args)
    assert os.path.exists(out)
    vid = read_video(out)
    assert vid[0].shape[0] == 80 and vid[0].shape[1] == 80  # 64*1.25


@pytest.mark.slow
def test_fgt_scan_packed_wire_bit_exact(tmp_path, monkeypatch):
    """The packed-hole s6 wire path (scatter changed pixels up, gather
    hole pixels back over a device-resident base) must reproduce the
    dense upload/fetch bit-exactly — outside the hole the device fold
    returns the input u8 unchanged."""
    # shrink the bucket so the pack-worthwhile heuristic engages at test
    # shapes (2 * bucket * 8 must undercut the dense video+mask bytes)
    monkeypatch.setattr(vi, "_PACK_BUCKET", 256)
    frames_dir, masks_dir = _make_data(tmp_path)
    lafc, fgt = _make_ckpts(tmp_path)
    args = _args(tmp_path, "object_removal", frames_dir, masks_dir, lafc,
                 fgt)
    models = vi.Models(args)

    rng = np.random.RandomState(1)
    n, h, w = 8, 64, 64
    base = (rng.rand(n, h, w, 3) * 255).round().astype(np.uint8)
    mask = np.zeros((n, h, w), bool)
    mask[:, 20:36, 24:44] = True
    # post-Poisson frames: base with the hole region altered
    frames = base.astype(np.float32) / 255.0
    frames[mask] = rng.rand(int(mask.sum()), 3)
    masks_np = mask[..., None].astype(np.float32)
    flows = rng.randn(n - 1, h, w, 2).astype(np.float32)

    dense = vi.fgt_synthesis_scan(models, frames, masks_np, flows, None,
                                  neighbor_stride=3, step=4,
                                  window_batch=2)
    base_dev = vi._put(base)
    packed = vi.fgt_synthesis_scan(models, frames, masks_np, flows, None,
                                   neighbor_stride=3, step=4,
                                   window_batch=2, base_u8=base,
                                   base_u8_dev=base_dev)
    np.testing.assert_array_equal(np.stack(dense), np.stack(packed))


def test_sp_inference_matches_single_device(tmp_path):
    """--sp 2 (Ulysses sequence-parallel FGT) must reproduce the
    single-device pipeline output to LSB level on the virtual CPU mesh."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    frames, masks = _make_data(tmp_path)
    lafc, fgt = _make_ckpts(tmp_path)
    a1 = _args(tmp_path, "object_removal", frames, masks, lafc, fgt)
    a1.outroot = str(tmp_path / "out_base")
    a1.bf16 = False
    out1 = vi.video_inpainting(a1)
    a2 = _args(tmp_path, "object_removal", frames, masks, lafc, fgt)
    a2.outroot = str(tmp_path / "out_sp")
    a2.bf16 = False
    a2.sp = 2
    out2 = vi.video_inpainting(a2)
    v1 = np.stack(read_video(out1)).astype(int)
    v2 = np.stack(read_video(out2)).astype(int)
    assert np.abs(v1 - v2).mean() < 1.3


def test_scan_vs_chunked_dispatch_match(tmp_path):
    """The default single-dispatch device-scan stages must produce the
    same video as the round-2 per-chunk pipelined dispatch path (same
    models, same data). Compared in f32 to isolate the dispatch
    restructuring itself — the bf16+f16-wire numerics delta is gated
    separately by test_bf16_end_to_end_bounded_delta. Residual diffs:
    the scan path's round-cast u8 FGT input / composite-valid buffer vs
    the chunked path's trunc cast (≤1 LSB)."""
    frames, masks = _make_data(tmp_path)
    lafc, fgt = _make_ckpts(tmp_path)
    a1 = _args(tmp_path, "object_removal", frames, masks, lafc, fgt)
    a1.outroot = str(tmp_path / "out_scan")
    a1.bf16 = False
    out1 = vi.video_inpainting(a1)
    a2 = _args(tmp_path, "object_removal", frames, masks, lafc, fgt)
    a2.outroot = str(tmp_path / "out_chunked")
    a2.chunked_dispatch = True
    a2.bf16 = False
    out2 = vi.video_inpainting(a2)
    v1 = np.stack(read_video(out1)).astype(int)
    v2 = np.stack(read_video(out2)).astype(int)
    # LSB-level agreement: the bound is mp4 quantization noise plus the
    # chunked path's trunc cast; the exact mean shifts with upstream
    # numerics (e.g. the s5 solver), observed 0.9-1.1 LSB
    assert np.abs(v1 - v2).mean() < 1.3


@pytest.mark.heavy
def test_dp_inference_matches_single_device(tmp_path):
    """--dp shards batched stage calls over the 8-device CPU mesh and must
    produce the same composited frames as the single-device path."""
    import jax

    frames, masks_dir = _make_data(tmp_path, n=8)
    lafc_dir, fgt_dir = _make_ckpts(tmp_path)
    argv = ["--mode", "object_removal", "--path", frames,
            "--path_mask", masks_dir, "--imgH", "64", "--imgW", "64",
            "--lafc_ckpts", lafc_dir, "--fgt_ckpts", fgt_dir,
            "--window_batch", "8"]
    a1 = vi.build_parser().parse_args(argv + ["--outroot",
                                              str(tmp_path / "o1")])
    out1 = vi.video_inpainting(a1)
    a2 = vi.build_parser().parse_args(argv + ["--outroot",
                                              str(tmp_path / "o2"), "--dp"])
    out2 = vi.video_inpainting(a2)
    v1 = np.stack(read_video(out1))
    v2 = np.stack(read_video(out2))
    # codec-level equality: identical inputs -> near-identical mp4s
    assert np.abs(v1.astype(int) - v2.astype(int)).mean() < 1.0


@pytest.mark.heavy
def test_tp_inference_matches_single_device(tmp_path):
    """--dp --tp 2 Megatron-shards the FGT weights over a (dp=4, tp=2)
    CPU mesh; composited output must match the single-device path."""
    frames, masks_dir = _make_data(tmp_path, n=8)
    lafc_dir, fgt_dir = _make_ckpts(tmp_path)
    argv = ["--mode", "object_removal", "--path", frames,
            "--path_mask", masks_dir, "--imgH", "64", "--imgW", "64",
            "--lafc_ckpts", lafc_dir, "--fgt_ckpts", fgt_dir,
            "--window_batch", "8"]
    a1 = vi.build_parser().parse_args(argv + ["--outroot",
                                              str(tmp_path / "o1")])
    out1 = vi.video_inpainting(a1)
    a2 = vi.build_parser().parse_args(
        argv + ["--outroot", str(tmp_path / "o2"), "--dp", "--tp", "2"])
    out2 = vi.video_inpainting(a2)
    v1 = np.stack(read_video(out1))
    v2 = np.stack(read_video(out2))
    assert np.abs(v1.astype(int) - v2.astype(int)).mean() < 1.0


@pytest.mark.slow
def test_bf16_end_to_end_bounded_delta(tmp_path):
    """--bf16 runs the whole pipeline and its output stays within a small
    PSNR delta of the f32 run (same random weights, same data). Bounds the
    'flow drift ~0.3%' code comment with a measured gate."""
    frames, masks = _make_data(tmp_path)
    lafc, fgt = _make_ckpts(tmp_path)

    args = _args(tmp_path, "object_removal", frames, masks, lafc, fgt)
    args.outroot = str(tmp_path / "out_f32")
    args.bf16 = False   # --bf16 defaults True: force the true f32+f32-wire
    out32 = vi.video_inpainting(args)

    args = _args(tmp_path, "object_removal", frames, masks, lafc, fgt)
    args.outroot = str(tmp_path / "out_bf16")
    args.bf16 = True
    out16 = vi.video_inpainting(args)

    v32 = np.stack(read_video(out32)).astype(np.float64)
    v16 = np.stack(read_video(out16)).astype(np.float64)
    rmse = np.sqrt(((v32 - v16) ** 2).mean())
    psnr = 20 * np.log10(255.0 / max(rmse, 1e-9))
    # mp4 encoding adds its own noise floor; require the bf16 pass to stay
    # within a tight envelope of the f32 pass
    assert psnr > 35.0, f"bf16 deviates from f32: PSNR {psnr:.1f} dB"


def test_device_diffusion_matches_host(tmp_path):
    """The default on-device CG diffusion (ops/diffusion_tpu via
    Models.diffuse_fn) must complete flows like --host_diffusion (the
    scipy/native exact solve). Asserted on the completed-flow dumps —
    the e2e mp4 comparison is uninformative here because random-init
    weights + per-frame flow max-normalization amplify any LSB change."""
    from fgt_tpu.core import flow_io

    frames, masks = _make_data(tmp_path)
    lafc, fgt = _make_ckpts(tmp_path)
    outs = {}
    for name, host in (("dev", False), ("host", True)):
        a = _args(tmp_path, "object_removal", frames, masks, lafc, fgt)
        a.outroot = str(tmp_path / f"out_{name}")
        a.host_diffusion = host
        a.vis_completed_flows = True
        vi.video_inpainting(a)
        outs[name] = a.outroot
    # the two diffusion backends agree to 1 f16-wire ulp on the DIFFUSED
    # field (tests/test_diffusion_tpu.py pins that directly); through the
    # random-init LAFC net that ulp is Lipschitz-amplified ~1e3x inside
    # the hole, so the completed-flow bound is loose there — but outside
    # the hole the composite keeps the raw flows and must be bit-exact.
    for d in ("forward_flo", "backward_flo"):
        dd = os.path.join(outs["dev"], "completed_flow", d)
        hd = os.path.join(outs["host"], "completed_flow", d)
        names = sorted(os.listdir(dd))
        assert names == sorted(os.listdir(hd))
        for n in names:
            a = flow_io.read_flow(os.path.join(dd, n))
            b = flow_io.read_flow(os.path.join(hd, n))
            epe = np.sqrt(((a - b) ** 2).sum(-1))
            hole = epe > 0
            assert epe.max() < 0.5, (d, n, epe.max())
            # any differing pixel must lie inside the dilated flow mask
            if hole.any():
                frac = hole.mean()
                assert frac < 0.15, (d, n, frac)
