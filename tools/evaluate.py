"""Dataset evaluation harness: PSNR / SSIM / L1 / L2 / VFID over a
DAVIS-style tree (BASELINE.md config: "DAVIS 2017 object-removal benchmark,
50 sequences, 432x240, full PSNR/SSIM/VFID eval").

Layout expected:
    <frames>/<video>/00000.jpg ...
    <masks>/<video>/00000.png  ...   (object masks; holes = nonzero)

For every sequence the full inpainting pipeline runs (models stay resident
across sequences), the composited result is compared against the original
frames on the whole image (standard protocol: the GT is the unmasked
frame), and per-stage timings are accumulated.

Usage:
    python tools/evaluate.py --frames <dir> --masks <dir> \
        --lafc_ckpts ... --fgt_ckpts ... --raft_model ... \
        [--num_videos 10] [--vfid_ckpt i3d.msgpack] [--outroot out_eval]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):

    from fgt_tpu.utils.relay import cli_relay_guard

    cli_relay_guard()   # honor cpu requests; fail fast on a dead tunnel
    from fgt_tpu.core import metrics as M
    from fgt_tpu.core.video_io import read_video
    from fgt_tpu.pipeline.video_inpainting import (Models, build_parser,
                                                   video_inpainting)

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", required=True)
    ap.add_argument("--masks", required=True)
    ap.add_argument("--outroot", default="out_eval")
    ap.add_argument("--num_videos", type=int, default=-1)
    ap.add_argument("--imgH", type=int, default=240)
    ap.add_argument("--imgW", type=int, default=432)
    ap.add_argument("--lafc_ckpts", default="checkpoints/lafc")
    ap.add_argument("--fgt_ckpts", default="checkpoints/fgt")
    ap.add_argument("--raft_model", default="checkpoints/raft-things.pth")
    ap.add_argument("--vfid_ckpt", default="",
                    help="converted I3D weights (msgpack); VFID is skipped "
                         "without it (random-init features are meaningless)")
    ap.add_argument("--raft_iters", type=int, default=20)
    args = ap.parse_args(argv)

    videos = sorted(os.listdir(args.frames))
    if args.num_videos > 0:
        videos = videos[:args.num_videos]

    pipe_args = build_parser().parse_args([
        "--mode", "object_removal", "--imgH", str(args.imgH),
        "--imgW", str(args.imgW), "--lafc_ckpts", args.lafc_ckpts,
        "--fgt_ckpts", args.fgt_ckpts, "--raft_model", args.raft_model,
        "--raft_iters", str(args.raft_iters),
    ])
    models = Models(pipe_args)

    scorer = None
    if args.vfid_ckpt:
        import jax

        from fgt_tpu.core.vfid import VFIDScorer
        from fgt_tpu.utils.checkpoint import load_pytree

        scorer = VFIDScorer()
        scorer.variables = load_pytree(scorer.variables, args.vfid_ckpt)

    import cv2
    import imageio.v2 as imageio

    per_video = {}
    t_start = time.time()
    total_frames = 0
    for video in videos:
        pipe_args.path = os.path.join(args.frames, video)
        pipe_args.path_mask = os.path.join(args.masks, video)
        pipe_args.outroot = os.path.join(args.outroot, video)
        out_path = video_inpainting(pipe_args, models=models)

        result = np.stack(read_video(out_path))
        files = sorted(os.listdir(pipe_args.path))
        gt = []
        for f in files[:len(result)]:
            img = imageio.imread(os.path.join(pipe_args.path, f))[..., :3]
            gt.append(cv2.resize(img, (args.imgW, args.imgH)))
        gt = np.stack(gt)
        total_frames += len(gt)

        psnr = float(np.mean([M.psnr(result[i], gt[i])
                              for i in range(len(gt))]))
        ssim = float(np.mean([M.ssim(result[i], gt[i])
                              for i in range(len(gt))]))
        l1 = float(np.abs(result.astype(np.float64)
                          - gt.astype(np.float64)).mean())
        l2 = float(((result.astype(np.float64)
                     - gt.astype(np.float64)) ** 2).mean())
        per_video[video] = {"psnr": psnr, "ssim": ssim, "l1": l1, "l2": l2}
        print(f"{video}: psnr={psnr:.2f} ssim={ssim:.4f}", flush=True)
        if scorer is not None:
            scorer.update(gt, result)

    wall = time.time() - t_start
    summary = {
        "num_videos": len(per_video),
        "frames": total_frames,
        "fps": total_frames / wall,
        "psnr": float(np.mean([v["psnr"] for v in per_video.values()])),
        "ssim": float(np.mean([v["ssim"] for v in per_video.values()])),
        "l1": float(np.mean([v["l1"] for v in per_video.values()])),
        "l2": float(np.mean([v["l2"] for v in per_video.values()])),
        "per_video": per_video,
    }
    if scorer is not None:
        summary["vfid"] = scorer.score()
    os.makedirs(args.outroot, exist_ok=True)
    with open(os.path.join(args.outroot, "eval.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "per_video"}))
    return summary


if __name__ == "__main__":
    main()
