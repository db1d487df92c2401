"""Outpainting (video extrapolation) probe: the pipeline's heaviest
published workload — N synthetic frames extrapolated 2x to a 2H x 2W
canvas (reference mode at tool/video_inpainting.py:291-339,752-759).

Reproduces the BASELINE.md round-3 protocol (208 frames 432x240 ->
864x480) and prints ONE JSON line with s/frame, stage split, and peak
RSS, so re-runs after pipeline changes are one command:

  python tools/outpaint_probe.py                  # full 208-frame probe
  python tools/outpaint_probe.py --frames 24      # quicker probe
  JAX_PLATFORMS=cpu python tools/outpaint_probe.py --frames 6 --imgH 64 \
      --imgW 64 --h_scale 1.25 --w_scale 1.25     # CPU smoke
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_pan(root: str, n: int, h: int, w: int) -> str:
    import cv2
    import imageio.v2 as imageio

    frames_dir = os.path.join(root, "frames")
    os.makedirs(frames_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    pan = 2
    base = (rng.rand(h + 8, w + pan * n + 8, 3) * 255).astype(np.float32)
    base = cv2.filter2D(base, -1,
                        np.ones((9, 9), np.float32) / 81.0).astype(np.uint8)
    for i in range(n):
        imageio.imwrite(os.path.join(frames_dir, f"{i:05d}.png"),
                        base[4:4 + h, 4 + pan * i:4 + pan * i + w])
    return frames_dir


def main():

    from fgt_tpu.utils.relay import honor_cpu_request

    honor_cpu_request()   # JAX_PLATFORMS=cpu beats the axon sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=208)
    ap.add_argument("--imgH", type=int, default=240)
    ap.add_argument("--imgW", type=int, default=432)
    ap.add_argument("--h_scale", type=float, default=2.0)
    ap.add_argument("--w_scale", type=float, default=2.0)
    ap.add_argument("--keep", action="store_true")
    args, passthrough = ap.parse_known_args()

    from fgt_tpu.utils.relay import on_axon, wait_for_relay

    if on_axon() and not wait_for_relay(
            float(os.environ.get("FGT_RELAY_WAIT", "1800"))):
        print(json.dumps({"metric": "outpaint_s_per_frame", "value": 0.0,
                          "unit": "s/frame",
                          "error": "axon relay down; probe not run"}))
        sys.exit(1)

    root = tempfile.mkdtemp(prefix="fgt_outpaint_")
    try:
        frames_dir = make_pan(root, args.frames, args.imgH, args.imgW)
        outroot = os.path.join(root, "out")

        from fgt_tpu.pipeline.video_inpainting import (build_parser,
                                                       video_inpainting)

        argv = ["--mode", "video_extrapolation", "--path", frames_dir,
                "--path_mask", frames_dir,   # unused in this mode
                "--outroot", outroot,
                "--imgH", str(args.imgH), "--imgW", str(args.imgW),
                "--H_scale", str(args.h_scale),
                "--W_scale", str(args.w_scale)] + passthrough
        t0 = time.perf_counter()
        out_path = video_inpainting(build_parser().parse_args(argv))
        wall = time.perf_counter() - t0
        assert os.path.exists(out_path)
        with open(os.path.join(outroot, "timings.jsonl")) as f:
            rec = json.loads(f.readlines()[-1])
        peak_gb = resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1e6
        print(json.dumps({
            "metric": "outpaint_s_per_frame",
            "value": round(wall / args.frames, 3),
            "unit": "s/frame",
            "frames": args.frames,
            "canvas": [int(args.imgH * args.h_scale),
                       int(args.imgW * args.w_scale)],
            "total_s": round(wall, 1),
            "stages_s": {k: round(v, 1) for k, v in rec["stages"].items()},
            "peak_host_rss_gb": round(peak_gb, 1),
        }))
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
