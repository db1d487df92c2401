"""flowNN backend micro-benchmark at outpainting scale (VERDICT r4 #8).

The 208-frame outpainting probe spent 1431 s (36% of wall) in s4_flownn
on the 1-core host. This tool measures the stage's three parts — the two
directional chaining passes, the two chain-sampling walks, and the fusion
— for each backend (native OpenMP kernels, lax.scan device twin for the
passes) on a synthetic border-hole clip at a given scale, so the
production backend choice is evidence-based rather than assumed.

Reference anchor: tool/get_flowNN_gradient.py:73-435.

    python tools/prop_bench.py --frames 48 --imgH 480 --imgW 864
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth(n: int, h: int, w: int, border: float = 0.25, seed: int = 0):
    """Border-hole masks (the outpainting geometry: original content in
    the middle, hole = enlarged canvas) + smooth panning flows."""
    rng = np.random.RandomState(seed)
    mask = np.ones((n, h, w), np.uint8)
    bh, bw = int(h * border), int(w * border)
    mask[:, bh:h - bh, bw:w - bw] = 0
    flow_f = rng.randn(n - 1, h, w, 2).astype(np.float32) * 0.05
    flow_f[..., 0] += -2.0
    flow_b = -flow_f
    gx = rng.randn(n, h, w, 3).astype(np.float32) * 0.01
    gy = rng.randn(n, h, w, 3).astype(np.float32) * 0.01
    return mask, flow_f, flow_b, gx, gy


def main():
    from fgt_tpu.utils.relay import honor_cpu_request

    honor_cpu_request()
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--imgH", type=int, default=480)
    ap.add_argument("--imgW", type=int, default=864)
    ap.add_argument("--border", type=float, default=0.25)
    ap.add_argument("--skip_device", action="store_true")
    args = ap.parse_args()

    from fgt_tpu import native
    from fgt_tpu.pipeline.propagation import PropagationConfig

    n, h, w = args.frames, args.imgH, args.imgW
    mask, vf, vb, gx, gy = synth(n, h, w, args.border)
    cfg = PropagationConfig()
    rec = {"frames": n, "h": h, "w": w,
           "hole_px_per_frame": int(mask[0].sum())}

    assert native.available(), "native kernels not built"
    passes = {}
    t0 = time.perf_counter()
    for follow, check, fwd in ((vb, vf, True), (vf, vb, False)):
        t1 = time.perf_counter()
        passes[fwd] = native.flownn_pass(mask, follow, check, fwd,
                                         cfg.consistency_thres)
        rec[f"native_pass_{'bn' if fwd else 'fn'}_s"] = round(
            time.perf_counter() - t1, 2)
    rec["native_passes_s"] = round(time.perf_counter() - t0, 2)

    g_both = np.ascontiguousarray(np.concatenate([gx, gy], axis=3),
                                  np.float32)
    t0 = time.perf_counter()
    for fwd, p in passes.items():
        have, nx, ny, nt, cu, cv_ = p
        t1 = time.perf_counter()
        native.flownn_sample(g_both, have, nx, ny, nt, fwd)
        rec[f"native_sample_{'bn' if fwd else 'fn'}_s"] = round(
            time.perf_counter() - t1, 2)
    rec["native_samples_s"] = round(time.perf_counter() - t0, 2)

    # whole-stage wall through the production entry (includes fusion)
    from fgt_tpu.pipeline.propagation import get_flownn_gradient_frames

    t0 = time.perf_counter()
    get_flownn_gradient_frames(cfg, gx, gy, mask.astype(bool), vf, vb)
    rec["native_stage_s"] = round(time.perf_counter() - t0, 2)

    if not args.skip_device:
        import jax

        from fgt_tpu.pipeline.propagation_tpu import directional_pass_tpu

        mask_r = mask.transpose(1, 2, 0)       # reference layout entry
        vf_r = vf.transpose(1, 2, 3, 0)
        vb_r = vb.transpose(1, 2, 3, 0)
        t0 = time.perf_counter()
        bn = directional_pass_tpu(mask_r, vb_r, vf_r, n, forward=True,
                                  cfg=cfg)
        jax.block_until_ready(bn[0]) if hasattr(bn[0], "block_until_ready") \
            else None
        rec["device_pass_bn_cold_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        bn = directional_pass_tpu(mask_r, vb_r, vf_r, n, forward=True,
                                  cfg=cfg)
        rec["device_pass_bn_warm_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        directional_pass_tpu(mask_r, vf_r, vb_r, n, forward=False, cfg=cfg)
        rec["device_pass_fn_warm_s"] = round(time.perf_counter() - t0, 2)

        # parity spot-check vs native on the BN pass
        have_n = passes[True][0].astype(bool)
        agree = float((bn[0].transpose(2, 0, 1).astype(bool)
                       == have_n).mean())
        rec["device_native_have_agree"] = round(agree, 5)

    print(json.dumps(rec))


if __name__ == "__main__":
    main()
