"""Batch / serving driver: inpaint many videos with one resident model set.

The reference CLI (tool/video_inpainting.py:752-859) pays model load +
framework warmup per video. For dataset-scale or serving workloads this
driver builds :class:`Models` ONCE — weights stay device-resident and
every jitted stage executable is reused — and streams videos through it,
so per-video cost approaches pure pipeline time (model init + first
compiles cost 45-70 s on this host and amortize to zero).

Layout: ``--videos_root`` contains one subdirectory of frames per video;
``--masks_root`` (object/watermark modes) mirrors those names. Results
land in ``--outroot/<video>/``, with a ``batch_summary.jsonl`` row per
video (wall seconds, stage split, output path).

    python -m fgt_tpu.pipeline.batch \
        --videos_root data/DAVIS/frames --masks_root data/DAVIS/masks \
        --outroot out --imgH 240 --imgW 432
"""

from __future__ import annotations

import json
import os
import time

import logging

from fgt_tpu.pipeline.video_inpainting import (Models, build_parser,
                                               video_inpainting)

logger = logging.getLogger("fgt_tpu")


def iter_videos(videos_root: str, masks_root: str | None):
    for name in sorted(os.listdir(videos_root)):
        vdir = os.path.join(videos_root, name)
        if not os.path.isdir(vdir):
            continue
        mdir = os.path.join(masks_root, name) if masks_root else None
        if mdir is not None and not os.path.isdir(mdir):
            logger.warning("skipping %s: no mask dir %s", name, mdir)
            continue
        yield name, vdir, mdir


def run_batch(args) -> list[dict]:
    models = Models(args)   # resident: one init + one compile set
    results = []
    summary_path = os.path.join(args.outroot, "batch_summary.jsonl")
    os.makedirs(args.outroot, exist_ok=True)
    videos = list(iter_videos(args.videos_root, args.masks_root))
    logger.info("batch: %d videos, mode=%s", len(videos), args.mode)
    for i, (name, vdir, mdir) in enumerate(videos):
        vargs = build_parser().parse_args([])
        vargs.__dict__.update(args.__dict__)
        vargs.path = vdir
        vargs.path_mask = mdir
        vargs.outroot = os.path.join(args.outroot, name)
        t0 = time.perf_counter()
        try:
            out = video_inpainting(vargs, models=models)
            rec = {"video": name, "ok": True, "out": out,
                   "wall_s": round(time.perf_counter() - t0, 2)}
        except Exception as e:  # keep the batch going (reference-style
            # fault tolerance, cf. dataset item-0 fallback SURVEY §5)
            logger.exception("video %s failed", name)
            rec = {"video": name, "ok": False, "error": str(e),
                   "wall_s": round(time.perf_counter() - t0, 2)}
        results.append(rec)
        with open(summary_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        logger.info("[%d/%d] %s: %s (%.1fs)", i + 1, len(videos), name,
                    "ok" if rec["ok"] else "FAILED", rec["wall_s"])
    return results


def main(argv=None):

    from fgt_tpu.utils.relay import cli_relay_guard

    cli_relay_guard()   # honor cpu requests; fail fast on a dead tunnel
    p = build_parser()
    p.add_argument("--videos_root", required=True,
                   help="directory of per-video frame subdirectories")
    p.add_argument("--masks_root", default=None,
                   help="directory of per-video mask subdirectories "
                        "(object/watermark removal)")
    args = p.parse_args(argv)
    results = run_batch(args)
    ok = sum(r["ok"] for r in results)
    logger.info("batch done: %d/%d ok", ok, len(results))
    return results


if __name__ == "__main__":
    main()
