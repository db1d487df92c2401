"""Batch driver: many videos through one resident model set."""

import os

import numpy as np
import pytest

from fgt_tpu.pipeline import batch as batch_mod
from fgt_tpu.pipeline import video_inpainting as vi
from tests.test_pipeline_e2e import _make_ckpts, _make_data


@pytest.mark.slow
def test_batch_two_videos_resident_models(tmp_path):
    videos_root = tmp_path / "videos"
    masks_root = tmp_path / "masks"
    videos_root.mkdir()
    masks_root.mkdir()
    for name in ("vid_a", "vid_b"):
        sub = tmp_path / ("src_" + name)
        sub.mkdir()
        frames, masks = _make_data(sub, n=6)
        os.rename(frames, videos_root / name)
        os.rename(masks, masks_root / name)
    lafc, fgt = _make_ckpts(tmp_path)

    p = vi.build_parser()
    p.add_argument("--videos_root")
    p.add_argument("--masks_root")
    args = p.parse_args([
        "--mode", "object_removal", "--imgH", "64", "--imgW", "64",
        "--lafc_ckpts", lafc, "--fgt_ckpts", fgt,
        "--raft_model", "/nonexistent", "--raft_iters", "2",
        "--outroot", str(tmp_path / "out"),
        "--videos_root", str(videos_root),
        "--masks_root", str(masks_root)])
    results = batch_mod.run_batch(args)
    assert [r["video"] for r in results] == ["vid_a", "vid_b"]
    assert all(r["ok"] for r in results), results
    for name in ("vid_a", "vid_b"):
        assert os.path.exists(tmp_path / "out" / name / "result.mp4")
    # summary JSONL has one row per video
    with open(tmp_path / "out" / "batch_summary.jsonl") as f:
        assert len(f.readlines()) == 2


def test_iter_videos_skips_missing_masks(tmp_path):
    (tmp_path / "videos" / "a").mkdir(parents=True)
    (tmp_path / "videos" / "b").mkdir()
    (tmp_path / "masks" / "a").mkdir(parents=True)
    got = list(batch_mod.iter_videos(str(tmp_path / "videos"),
                                     str(tmp_path / "masks")))
    assert [g[0] for g in got] == ["a"]
