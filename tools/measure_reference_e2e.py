"""Measure the PyTorch reference END-TO-END, for real.

Runs the actual reference driver (``/root/reference/tool/video_inpainting.py``,
stage machine at :419-749) as a subprocess on the same synthetic 24-frame
432x240 object-removal clip that bench.py uses, and records measured wall
time + per-stage splits derived from the driver's own progress prints.
This replaces the previous *composed* estimate (per-stage times + assumed
0.15 s/frame CPU stages) with a measured A/B: bench.py's ``vs_baseline``
divides by the ``e2e_fps`` written here.

The reference's pretrained weights are git-LFS-missing in this image, so
both sides run random-init weights — a fair like-for-like for throughput
(identical architectures and shapes; RAFT iterations are fixed at 20
regardless of weights). Missing third-party modules that the reference
imports but does not exercise on the inference path (cvbase, skimage,
torchvision) are provided as minimal stubs on PYTHONPATH.

Run: python tools/measure_reference_e2e.py [--frames 24] [--keep]
Writes BASELINE_MEASURED.json at the repo root.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)


# ---------------- stubs for modules absent from this image ----------------

CVBASE_STUB = '''\
"""Minimal cvbase stand-in (flow I/O + flow2rgb) for the reference driver."""
import numpy as np

TAG = 202021.25

def read_flow(path):
    with open(path, "rb") as f:
        tag = np.frombuffer(f.read(4), np.float32)[0]
        assert abs(tag - TAG) < 1, tag
        w = int(np.frombuffer(f.read(4), np.int32)[0])
        h = int(np.frombuffer(f.read(4), np.int32)[0])
        data = np.frombuffer(f.read(h * w * 2 * 4), np.float32)
    return data.reshape(h, w, 2).copy()

def write_flow(flow, path):
    flow = np.asarray(flow, np.float32)
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.asarray([TAG], np.float32).tofile(f)
        np.asarray([w, h], np.int32).tofile(f)
        flow.tofile(f)

def flow2rgb(flow):
    # uint8 (not the real cvbase's float) so the reference driver's
    # save_flows imageio.imwrite works under this image's imageio,
    # which rejects float32 png writes; the pngs are cosmetic
    import cv2
    mag = np.sqrt((flow ** 2).sum(-1))
    ang = np.arctan2(flow[..., 1], flow[..., 0])
    hsv = np.zeros(flow.shape[:2] + (3,), np.uint8)
    hsv[..., 0] = ((ang + np.pi) / (2 * np.pi) * 179).astype(np.uint8)
    hsv[..., 1] = 255
    m = mag / (mag.max() + 1e-9)
    hsv[..., 2] = (m * 255).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
'''

SKIMAGE_FEATURE_STUB = '''\
import numpy as np

def canny(image, sigma=1.0, low_threshold=None, high_threshold=None, **kw):
    """cv2-backed approximation; the inference path never calls this."""
    import cv2
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if sigma > 0:
        k = max(3, int(2 * round(3 * sigma) + 1))
        img = cv2.GaussianBlur(img, (k, k), sigma)
    return cv2.Canny(img, 100, 200) > 0
'''

TV_FUNCTIONAL_STUB = '''\
import numpy as np
import torch

def to_tensor(pic):
    arr = np.asarray(pic)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
    if arr.ndim == 2:
        arr = arr[None]
    else:
        arr = arr.transpose(2, 0, 1)
    return torch.from_numpy(np.ascontiguousarray(arr))
'''

TV_TRANSFORMS_STUB = '''\
from . import functional

class ToTensor:
    def __call__(self, pic):
        return functional.to_tensor(pic)

class ColorJitter:
    def __init__(self, *a, **kw):
        pass
    def __call__(self, x):
        return x
'''

# imageio's ffmpeg backend is absent in this image; our own pipeline falls
# back to cv2.VideoWriter (fgt_tpu/core/video_io.py), so the reference gets
# the IDENTICAL fallback for its final result.mp4 write — everything else
# about imageio is untouched.
SITECUSTOMIZE_STUB = '''\
import imageio

_orig_mimwrite = imageio.mimwrite

def _mimwrite(path, frames, fps=30, quality=8, **kw):
    try:
        return _orig_mimwrite(path, frames, fps=fps, quality=quality, **kw)
    except Exception:
        import cv2
        import numpy as np
        frames = [np.asarray(f, dtype=np.uint8) for f in frames]
        h, w = frames[0].shape[:2]
        wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
        if not wr.isOpened():
            raise
        for f in frames:
            wr.write(f[:, :, ::-1])
        wr.release()

imageio.mimwrite = _mimwrite
try:
    imageio.v2.mimwrite = _mimwrite
except Exception:
    pass
'''


def write_stubs(root: str) -> str:
    stubs = os.path.join(root, "stubs")
    os.makedirs(stubs, exist_ok=True)
    with open(os.path.join(stubs, "cvbase.py"), "w") as f:
        f.write(CVBASE_STUB)
    sk = os.path.join(stubs, "skimage")
    os.makedirs(sk, exist_ok=True)
    open(os.path.join(sk, "__init__.py"), "w").close()
    with open(os.path.join(sk, "feature.py"), "w") as f:
        f.write(SKIMAGE_FEATURE_STUB)
    tv = os.path.join(stubs, "torchvision")
    tr = os.path.join(tv, "transforms")
    os.makedirs(tr, exist_ok=True)
    open(os.path.join(tv, "__init__.py"), "w").write("from . import transforms\n")
    with open(os.path.join(tr, "__init__.py"), "w") as f:
        f.write(TV_TRANSFORMS_STUB)
    with open(os.path.join(tr, "functional.py"), "w") as f:
        f.write(TV_FUNCTIONAL_STUB)
    with open(os.path.join(stubs, "sitecustomize.py"), "w") as f:
        f.write(SITECUSTOMIZE_STUB)
    return stubs


# ---------------- random-init reference checkpoints ----------------

def _fresh_modules(prefixes):
    for name in list(sys.modules):
        if any(name == p or name.startswith(p + ".") for p in prefixes):
            del sys.modules[name]


def make_checkpoints(root: str):
    import torch
    import yaml

    torch.manual_seed(0)
    ckpt = {}

    # RAFT: DataParallel-wrapped state dict (reference initialize_RAFT
    # tool/video_inpainting.py:186-197 expects the module.* prefix)
    sys.path.insert(0, REF)
    _fresh_modules(["RAFT"])
    raft_mod = importlib.import_module("RAFT.raft")
    raft_args = argparse.Namespace(small=False, dropout=0.0,
                                   mixed_precision=False, alternate_corr=False)
    model = torch.nn.DataParallel(raft_mod.RAFT(raft_args))
    ckpt["raft"] = os.path.join(root, "raft-things.pth")
    torch.save(model.state_dict(), ckpt["raft"])
    sys.path.pop(0)

    # LAFC: (tar, yaml) pair (initialize_LAFC :200-214)
    lafc_cfg = {"model": "lafc", "PASSMASK": 1, "cnum": 48,
                "conv_type": "vanilla", "in_channel": 3, "init_weights": 1,
                "norm": None, "num_flows": 3, "flow_interval": 3,
                "resBlocks": 1, "use_bias": 1, "use_residual": 1, "gc": 0}
    sys.path.insert(0, os.path.join(REF, "LAFC"))
    _fresh_modules(["models"])
    lafc_mod = importlib.import_module("models.lafc")
    lafc = lafc_mod.Model(lafc_cfg)
    d = os.path.join(root, "lafc_ckpt")
    os.makedirs(d, exist_ok=True)
    torch.save({"model_state_dict": lafc.state_dict()},
               os.path.join(d, "lafc.pth.tar"))
    with open(os.path.join(d, "config.yaml"), "w") as f:
        yaml.safe_dump(lafc_cfg, f)
    ckpt["lafc"] = d
    sys.path.pop(0)

    # FGT: (tar, yaml) pair (initialize_FGT :217-230); the yaml carries the
    # derived tuple params the trainer assembles at FGT/train.py:63-66
    fgt_cfg = {"model": "model", "PASSMASK": 1, "ape": 1, "cnum": 64,
               "conv_type": "vanilla", "drop": 0, "flow_inChannel": 2,
               "flow_cnum": 64, "flow_hidden": 256, "frame_hidden": 512,
               "gd": 4, "in_channel": 4, "init_weights": 1,
               "input_resolution": [240, 432], "kernel_size": [7, 7],
               "mlp_ratio": 40, "norm": None, "numBlocks": 8, "num_head": 4,
               "padding": [3, 3], "stride": [3, 3], "sw": 8, "tw": 2,
               "use_bias": 1}
    sys.path.insert(0, os.path.join(REF, "FGT"))
    _fresh_modules(["models"])
    fgt_mod = importlib.import_module("models.model")
    fgt = fgt_mod.Model(fgt_cfg)
    d = os.path.join(root, "fgt_ckpt")
    os.makedirs(d, exist_ok=True)
    torch.save({"model_state_dict": fgt.state_dict()},
               os.path.join(d, "fgt.pth.tar"))
    with open(os.path.join(d, "config.yaml"), "w") as f:
        yaml.safe_dump(fgt_cfg, f)
    ckpt["fgt"] = d
    sys.path.pop(0)
    _fresh_modules(["models", "RAFT"])
    return ckpt


# ---------------- stage classification from the driver's prints ----------------

STAGE_PATTERNS = [
    ("s1_raft", re.compile(r"Calculating (forward|backward) flow")),
    ("s2_lafc", re.compile(r"Indices: |Finish flow completion")),
    ("s3_gradients", re.compile(r"Preparing frame")),
    ("s5_poisson", re.compile(r"Poisson blending frame")),
    ("s6_fgt", re.compile(r"^\d+ \d+ \d+\s*$")),
    ("s7_done", re.compile(r"Done, please check")),
]


def classify(line: str):
    for name, pat in STAGE_PATTERNS:
        if pat.search(line):
            return name
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import yaml

    root = tempfile.mkdtemp(prefix="ref_e2e_")
    try:
        import bench

        frames_dir, masks_dir = bench.make_synthetic_data(root, n=args.frames)
        stubs = write_stubs(root)
        print("building random-init reference checkpoints...")
        ckpt = make_checkpoints(root)

        # run config mirroring bench.py's protocol (our parser defaults:
        # flow_mask_dilates 8, frame_dilates 0, consistencyThres 5)
        run_cfg = {"mode": "object_removal", "consistencyThres": 5,
                   "alpha": 0.1, "lafc_ckpts": ckpt["lafc"],
                   "fgt_ckpts": ckpt["fgt"], "raft_model": ckpt["raft"],
                   "flow_mask_dilates": 8, "frame_dilates": 0, "gpu": 0}
        cfg_path = os.path.join(root, "object_removal.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(run_cfg, f)

        outroot = os.path.join(root, "out")
        env = dict(os.environ)
        env["PYTHONPATH"] = stubs
        cmd = [sys.executable, "-u", "video_inpainting.py",
               "--opt", cfg_path, "--mode", "object_removal",
               "--path", frames_dir, "--path_mask", masks_dir,
               "--outroot", outroot, "--imgH", "240", "--imgW", "432"]
        print("running reference driver:", " ".join(cmd))
        t0 = time.perf_counter()
        proc = subprocess.Popen(cmd, cwd=os.path.join(REF, "tool"), env=env,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True,
                                bufsize=1)
        # timestamp every stage-marker line; "\r"-terminated progress prints
        # arrive as one long line only at flush, so split on \r too
        events = []  # (t, stage)
        full_log = os.path.join(root, "reference_stdout.log")
        assert proc.stdout is not None
        with open(full_log, "w") as lf:
            for raw in proc.stdout:
                t = time.perf_counter() - t0
                lf.write(f"[{t:9.2f}] {raw}")
                lf.flush()
                last_stage = events[-1][1] if events else ""
                for piece in raw.replace("\r", "\n").split("\n"):
                    piece = piece.strip()
                    if not piece:
                        continue
                    st = classify(piece)
                    if st:
                        events.append((t, st))
                if not events or events[-1][1] != last_stage:
                    sys.stdout.write(raw if len(raw) < 200
                                     else raw[:200] + "\n")
        rc = proc.wait()
        total = time.perf_counter() - t0
        ok = rc == 0 and os.path.exists(os.path.join(outroot, "result.mp4"))
        print(f"reference rc={rc}, ok={ok}, total {total:.1f}s")
        if not ok:
            shutil.copy(full_log, "/tmp/ref_e2e_stdout.log")
            with open(full_log) as f:
                print(f.read()[-4000:])
            raise SystemExit(f"reference run failed (rc={rc})")

        # derive stage spans: a stage runs from its first marker to the
        # next stage's first marker; s0_init = start -> first marker
        firsts = {}
        for t, st in events:
            firsts.setdefault(st, t)
        order = [st for st, _ in STAGE_PATTERNS if st in firsts]
        stages = {}
        if order:
            stages["s0_init_load"] = round(firsts[order[0]], 2)
            for a, b in zip(order, order[1:]):
                stages[a] = round(firsts[b] - firsts[a], 2)
            if order[-1] != "s7_done":
                stages[order[-1]] = round(total - firsts[order[-1]], 2)
        # s4_flownn has no print marker: it is the gap inside s3->s5
        # (already folded into s3_gradients above); split it out by name
        if "s3_gradients" in stages:
            stages["s3_gradients_plus_s4_flownn"] = stages.pop("s3_gradients")

        fps = args.frames / total
        out = {
            "host": "same container as bench.py (torch CPU, "
                    f"{os.cpu_count()} core(s); reference pretrained "
                    "weights are git-LFS missing -> random init both sides)",
            "protocol": f"object removal 432x240, {args.frames} frames, "
                        "flows at 2x, 20 RAFT iters, neighbor_stride 5, "
                        "flow_mask_dilates 8, frame_dilates 0",
            "measured": True,
            "measured_cmd": "tools/measure_reference_e2e.py (subprocess of "
                            "/root/reference/tool/video_inpainting.py)",
            "e2e_total_s": round(total, 2),
            "e2e_fps": round(fps, 4),
            "stages_s": stages,
        }
        path = os.path.join(REPO, "BASELINE_MEASURED.json")
        prev = None
        if os.path.exists(path):
            with open(path) as f:
                prev = json.load(f)
        if prev and not prev.get("measured"):
            out["composed_estimate_r2"] = {
                k: prev[k] for k in ("raft_s_per_pair", "lafc_s_per_window",
                                     "fgt_s_per_window", "e2e_total_s",
                                     "e2e_fps") if k in prev}
        elif prev:
            # merge, never clobber: keep data other tools stored in the
            # record (measure_reference.py adds per_stage_isolated)
            for k in ("composed_estimate_r2", "per_stage_isolated"):
                if k in prev and k not in out:
                    out[k] = prev[k]
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out, indent=2))
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
