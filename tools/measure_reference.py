"""Measure the PyTorch reference's hot-path stage times on this host.

The reference repo publishes no benchmark numbers (BASELINE.md), so we
measure them: RAFT per flow pair (864x480, 20 iters), LAFC per completion
window, FGT per synthesis window (240x432) — torch CPU (no CUDA in this
environment), random weights (the pretrained .tar files are git-LFS
missing), full thread parallelism. The CPU-side stages (regionfill,
flowNN propagation, Poisson blend) are identical vectorized numpy/scipy
algorithms in both frameworks and are reused from our own pipeline's
StageTimer numbers.

Writes BASELINE_MEASURED.json; bench.py divides its measured e2e fps by
the composed reference fps to report vs_baseline.

Run: python tools/measure_reference.py [--frames 24] [--repeats 3]
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time


import numpy as np
import torch

REF = "/root/reference"


def _timeit(fn, repeats: int = 3, warmup: int = 1) -> float:
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(repeats):
        fn()
    return (time.perf_counter() - t0) / repeats


def _fresh_modules(prefixes):
    for name in list(sys.modules):
        if any(name == p or name.startswith(p + ".") for p in prefixes):
            del sys.modules[name]


def measure_raft(repeats: int) -> float:
    sys.path.insert(0, REF)
    _fresh_modules(["RAFT"])
    raft_mod = importlib.import_module("RAFT.raft")
    args = argparse.Namespace(small=False, dropout=0.0,
                              mixed_precision=False, alternate_corr=False)
    model = raft_mod.RAFT(args).eval()
    a = torch.rand(1, 3, 480, 864) * 255
    b = torch.rand(1, 3, 480, 864) * 255
    with torch.no_grad():
        t = _timeit(lambda: model(a, b, iters=20, test_mode=True),
                    repeats=repeats)
    sys.path.pop(0)
    return t


def measure_lafc(repeats: int) -> float:
    sys.path.insert(0, os.path.join(REF, "LAFC"))
    _fresh_modules(["models"])
    lafc_mod = importlib.import_module("models.lafc")
    cfg = {"PASSMASK": 1, "cnum": 48, "conv_type": "vanilla",
           "in_channel": 3, "init_weights": 1, "norm": None,
           "num_flows": 3, "resBlocks": 1, "use_bias": 1,
           "use_residual": 1, "gc": 0}
    model = lafc_mod.Model(cfg).eval()
    flows = torch.randn(1, 2, 3, 240, 432)   # [b, c, t, h, w]
    masks = torch.rand(1, 1, 3, 240, 432).round()
    with torch.no_grad():
        t = _timeit(lambda: model(flows, masks), repeats=repeats)
    sys.path.pop(0)
    return t


def measure_fgt(repeats: int, window: int = 8) -> float:
    sys.path.insert(0, os.path.join(REF, "FGT"))
    _fresh_modules(["models"])
    fgt_mod = importlib.import_module("models.model")
    cfg = {"PASSMASK": 1, "ape": 1, "cnum": 64, "conv_type": "vanilla",
           "drop": 0, "flow_inChannel": 2, "flow_cnum": 64,
           "flow_hidden": 256, "frame_hidden": 512, "gd": 4,
           "in_channel": 4, "init_weights": 1, "input_resolution": (240, 432),
           "kernel_size": (7, 7), "mlp_ratio": 40, "norm": None,
           "numBlocks": 8, "num_head": 4, "padding": (3, 3),
           "stride": (3, 3), "sw": 8, "tw": 2, "use_bias": 1}
    model = fgt_mod.Model(cfg).eval()
    frames = torch.rand(1, window, 3, 240, 432) * 2 - 1
    flows = torch.randn(1, window, 2, 240, 432)
    masks = torch.rand(1, window, 1, 240, 432).round()
    with torch.no_grad():
        t = _timeit(lambda: model(frames, flows, masks), repeats=repeats)
    sys.path.pop(0)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    n = args.frames

    print("measuring reference RAFT (864x480, 20 iters, torch cpu)...")
    t_raft = measure_raft(args.repeats)
    print(f"  {t_raft:.2f} s/pair")
    print("measuring reference LAFC (3-flow window, 240x432)...")
    t_lafc = measure_lafc(args.repeats)
    print(f"  {t_lafc:.2f} s/window")
    print("measuring reference FGT (8-frame window, 240x432)...")
    t_fgt = measure_fgt(args.repeats)
    print(f"  {t_fgt:.2f} s/window")

    # compose the e2e estimate for the object-removal protocol on n frames
    raft_total = 2 * (n - 1) * t_raft          # fwd + bwd, per pair loop
    lafc_total = 2 * n * t_lafc                # per-frame windows, both dirs
    fgt_windows = -(-n // 5)                   # neighbor_stride = 5
    fgt_total = fgt_windows * t_fgt
    # CPU stages (regionfill+gradients+flowNN+poisson) measured from our
    # pipeline (identical numpy/scipy algorithms, same host): ~0.15 s/frame
    cpu_total = 0.15 * n
    total = raft_total + lafc_total + fgt_total + cpu_total
    fps = n / total

    per_stage = {
        "raft_s_per_pair": round(t_raft, 3),
        "lafc_s_per_window": round(t_lafc, 3),
        "fgt_s_per_window": round(t_fgt, 3),
        "cpu_stages_s_per_frame": 0.15,
        "composed_e2e_total_s": round(total, 2),
        "composed_e2e_fps": round(fps, 4),
    }
    path = os.path.abspath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        "BASELINE_MEASURED.json"))
    # the real measured e2e record (tools/measure_reference_e2e.py) owns
    # this file — merge the per-stage numbers in, never clobber it
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    if out.get("measured"):
        out["per_stage_isolated"] = per_stage
    else:
        out = {
            "host": "same container as bench.py (torch CPU; no CUDA"
                    " available; reference pretrained weights are git-LFS"
                    " missing -> random init)",
            "protocol": f"object removal 432x240, {n} frames, flows at 2x,"
                        " 20 RAFT iters, neighbor_stride 5",
            "measured": False,
            "e2e_total_s": round(total, 2),
            "e2e_fps": round(fps, 4),
            "per_stage_isolated": per_stage,
        }
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
