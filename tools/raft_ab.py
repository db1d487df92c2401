"""Direct A/B decomposition of the RAFT stage device time (round 5).

Times, by fetching outputs (block_until_ready does not wait under axon):

* raft_encode_fn alone;
* the refine scan at iters in {1, 20} for each lookup backend
  ("fused" / "pallas" / "xla"), same chunk —
  per-iteration cost = (t20 - t1) / 19, fixed cost = t1.

Prints one JSON line. The op traces attribute most of the scan to an
opaque `while` self-time; this harness is the ground truth the traces
can't give (tools/profile_stage.py --stage raft is the trace twin).
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


def main():
    from fgt_tpu.utils.relay import cli_relay_guard

    cli_relay_guard()

    from fgt_tpu.pipeline.video_inpainting import (Models, _put,
                                                   build_parser,
                                                   calculate_flows_scan)

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--imgH", type=int, default=240)
    ap.add_argument("--imgW", type=int, default=432)
    ap.add_argument("--chunk", type=int, default=46)
    ap.add_argument("--lookups", default="fused,pallas")
    ap.add_argument("--iters", default="1,20")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    import cv2
    base = (rng.rand(args.imgH + 8, args.imgW + 40, 3) * 255).astype(
        np.float32)
    base = cv2.filter2D(base, -1, np.ones((7, 7), np.float32) / 49)
    vid = np.stack([base[4:4 + args.imgH, 4 + i:4 + i + args.imgW]
                    for i in range(args.frames)]).astype(np.uint8)

    flow_h = args.imgH * 2 if args.imgH < 350 else args.imgH
    flow_w = args.imgW * 2 if args.imgH < 350 else args.imgW
    margs = build_parser().parse_args(
        ["--imgH", str(args.imgH), "--imgW", str(args.imgW)])
    models = Models(margs)
    vid_dev = _put(vid)
    n = vid.shape[0]

    # encode alone. The probe fetch program must be warmed SEPARATELY:
    # a fresh __getitem__ signature compiles (~seconds) over the tunnel
    # and would pollute the timing.
    def probe(a):
        return np.asarray(a[-1, :1, :1, :1])

    enc = models.raft_encode_fn(models.raft_vars, vid_dev, flow_h, flow_w,
                                8)
    probe(enc[0])              # warm encode + probe programs
    t0 = time.perf_counter()
    enc = models.raft_encode_fn(models.raft_vars, vid_dev, flow_h, flow_w,
                                8)
    probe(enc[0])
    enc_s = time.perf_counter() - t0

    res = {"encode_s": round(enc_s, 4), "chunk": args.chunk}

    # refine-only: the raw scan over the precomputed features
    fmap, fnet_, finp = enc
    pairs = n - 1
    s_f = np.arange(pairs, dtype=np.int32)
    d_f = np.arange(1, pairs + 1, dtype=np.int32)
    src = np.concatenate([s_f, d_f])
    dst = np.concatenate([d_f, s_f])
    from fgt_tpu.pipeline.video_inpainting import _scan_chunks
    c = max(1, min(args.chunk, 2 * pairs))
    idx = np.stack([_scan_chunks(src, c), _scan_chunks(dst, c)], axis=1)
    for lk in args.lookups.split(","):
        for it in [int(x) for x in args.iters.split(",")]:
            fn = models.raft_scan(lk)

            def run_refine():
                out = fn(models.raft_vars, fmap, fnet_, finp, idx, it,
                         args.imgH, args.imgW)
                probe(out)

            run_refine()
            t0 = time.perf_counter()
            run_refine()
            res[f"refine_{lk}_iters{it}_s"] = round(
                time.perf_counter() - t0, 4)
    iters_list = [int(x) for x in args.iters.split(",")]
    for lk in args.lookups.split(","):
        models.fused_corr_mode = "on" if lk == "fused" else "off"
        models.pallas_lookup_mode = "on" if lk == "pallas" else "off"
        for it in iters_list:
            def run():
                f, b, df, db = calculate_flows_scan(
                    models, vid_dev, n, args.imgH, args.imgW, flow_h,
                    flow_w, iters=it, chunk=args.chunk,
                    defer_forward=True, defer_backward=True)
                # tiny fetch forces the full scan without paying the
                # 10 MB flow download
                np.asarray(db[-1, :1, :1])

            run()              # compile + warm
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            res[f"{lk}_iters{it}_s"] = round(dt, 4)
        lo = res.get(f"{lk}_iters{iters_list[0]}_s")
        hi = res.get(f"{lk}_iters{iters_list[-1]}_s")
        if lo is not None and hi is not None and len(iters_list) > 1:
            span = iters_list[-1] - iters_list[0]
            res[f"{lk}_per_iter_ms"] = round(1e3 * (hi - lo) / span, 2)
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
