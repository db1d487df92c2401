"""Quick-start demo (the reference's FGT_colab.ipynb as a script).

Runs object removal end-to-end on a frames+masks directory — or, with no
arguments, on a generated synthetic scene — converting any torch
checkpoints it finds on the way. Success criterion, like the reference
README "Quick start": a playable ``result.mp4``.

    python tools/demo.py                              # synthetic demo
    python tools/demo.py --path frames/ --path_mask masks/ \
        --lafc_ckpts ckpts/lafc --fgt_ckpts ckpts/fgt \
        --raft_model ckpts/raft-things.pth
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_scene(root: str, n: int = 12, h: int = 240, w: int = 432):
    import cv2
    import numpy as np

    frames = os.path.join(root, "frames")
    masks = os.path.join(root, "masks")
    os.makedirs(frames, exist_ok=True)
    os.makedirs(masks, exist_ok=True)
    rng = np.random.RandomState(0)
    base = (rng.rand(h + 8, w + 2 * n + 8, 3) * 255).astype(np.float32)
    base = cv2.filter2D(base, -1, np.ones((9, 9), np.float32) / 81)
    base = base.astype(np.uint8)
    for i in range(n):
        fr = base[4:4 + h, 4 + 2 * i:4 + 2 * i + w]
        # a moving "object" to remove
        fr = fr.copy()
        x = 160 + 2 * i
        fr[90:146, x:x + 56] = (40, 200, 60)
        cv2.imwrite(os.path.join(frames, f"{i:05d}.png"), fr[:, :, ::-1])
        m = np.zeros((h, w), np.uint8)
        m[86:150, x - 4:x + 60] = 255
        cv2.imwrite(os.path.join(masks, f"{i:05d}.png"), m)
    return frames, masks


def main(argv=None):

    from fgt_tpu.utils.relay import cli_relay_guard

    cli_relay_guard()   # honor cpu requests; fail fast on a dead tunnel
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default=None, help="frames dir (omit for a "
                    "generated synthetic demo scene)")
    ap.add_argument("--path_mask", default=None)
    ap.add_argument("--outroot", default="demo_out")
    ap.add_argument("--imgH", type=int, default=240)
    ap.add_argument("--imgW", type=int, default=432)
    ap.add_argument("--lafc_ckpts", default="checkpoints/lafc")
    ap.add_argument("--fgt_ckpts", default="checkpoints/fgt")
    ap.add_argument("--raft_model", default="checkpoints/raft-things.pth")
    args = ap.parse_args(argv)

    if args.path is None:
        root = tempfile.mkdtemp(prefix="fgt_demo_")
        print(f"no --path given: generating a synthetic demo scene in {root}")
        args.path, args.path_mask = synth_scene(root)

    from fgt_tpu.pipeline.video_inpainting import (build_parser,
                                                   video_inpainting)

    pipe_args = build_parser().parse_args([
        "--mode", "object_removal", "--path", args.path,
        "--path_mask", args.path_mask, "--outroot", args.outroot,
        "--imgH", str(args.imgH), "--imgW", str(args.imgW),
        "--lafc_ckpts", args.lafc_ckpts, "--fgt_ckpts", args.fgt_ckpts,
        "--raft_model", args.raft_model])
    out = video_inpainting(pipe_args)
    print(f"\nDemo complete: {out}")
    print("(Torch .pth/.tar checkpoints are auto-converted; msgpack "
          "checkpoints load directly. Without weights the models run "
          "random-init — the pipeline still exercises every stage.)")
    return out


if __name__ == "__main__":
    main()
