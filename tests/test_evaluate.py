"""End-to-end exercise of the dataset evaluation harness
(tools/evaluate.py): full pipeline over a DAVIS-style tree + VFID with
random-init I3D weights, so the day pretrained checkpoints appear the
quality-parity run is a one-liner (VERDICT r4 #9; reference protocol
FGT/metrics/__init__.py:9-31)."""

import json
import os
import sys

import imageio
import numpy as np
import pytest

from tests.test_pipeline_e2e import _make_ckpts

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _make_tree(tmp_path, videos=2, n=8, h=64, w=64):
    frames_root = tmp_path / "davis_frames"
    masks_root = tmp_path / "davis_masks"
    rng = np.random.RandomState(0)
    for v in range(videos):
        fdir = frames_root / f"video{v}"
        mdir = masks_root / f"video{v}"
        fdir.mkdir(parents=True)
        mdir.mkdir(parents=True)
        base = (rng.rand(h, w + 2 * n, 3) * 255).astype(np.uint8)
        for i in range(n):
            imageio.imwrite(fdir / f"{i:05d}.png",
                            base[:, 2 * i: 2 * i + w])
            m = np.zeros((h, w), np.uint8)
            m[24:40, 24 + i:40 + i] = 255
            imageio.imwrite(mdir / f"{i:05d}.png", m)
    return str(frames_root), str(masks_root)


@pytest.mark.heavy
def test_evaluate_end_to_end_with_vfid(tmp_path):
    sys.path.insert(0, TOOLS)
    import evaluate

    from fgt_tpu.core.vfid import VFIDScorer
    from fgt_tpu.utils.checkpoint import save_pytree

    frames, masks = _make_tree(tmp_path)
    lafc, fgt = _make_ckpts(tmp_path)
    i3d = str(tmp_path / "i3d_random.msgpack")
    save_pytree(VFIDScorer().variables, i3d)

    summary = evaluate.main([
        "--frames", frames, "--masks", masks,
        "--outroot", str(tmp_path / "out_eval"),
        "--imgH", "64", "--imgW", "64",
        "--lafc_ckpts", lafc, "--fgt_ckpts", fgt,
        "--raft_model", "/nonexistent",
        "--raft_iters", "2",
        "--vfid_ckpt", i3d,
    ])
    for key in ("psnr", "ssim", "l1", "l2", "vfid"):
        assert key in summary, key
        assert np.isfinite(summary[key]), (key, summary[key])
    assert len(summary["per_video"]) == 2
    assert summary["psnr"] > 10.0      # composited output resembles GT
    # the artifact the tool promises
    with open(tmp_path / "out_eval" / "eval.json") as f:
        assert json.load(f)["psnr"] == summary["psnr"]
