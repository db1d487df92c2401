"""Warm the XLA persistent cache for the Pallas-bearing stage programs.

Mosaic (Pallas) kernel compiles can hang indefinitely over this image's
remote-TPU tunnel, while cached executables load fine. The pipeline
therefore takes Pallas paths (flash window attention, RAFT correlation
lookup) on TPU only for shapes this tool has recorded as known-good in
the pallas guard registry (fgt_tpu/utils/pallas_guard.py).

The TPU is single-process, so this tool must run while no other process
holds the device (bench.py runs it automatically before constructing its
resident models). The parent process never initializes a jax backend; a
child subprocess (--child) owns the TPU, builds the EXACT stage programs
the pipeline jit-compiles (same closures via Models.raft_scan /
Models.fgt_scan), and AOT-compiles them into the shared persistent cache.
A hung child is killed at the timeout and the signature is recorded
failed, so later pipeline runs take the XLA fallback instead of hanging.

Usage:
  python tools/warm_cache.py                  # bench shapes (24f 432x240)
  python tools/warm_cache.py --frames 208 --imgH 480 --imgW 864
  python tools/warm_cache.py --stage raft --timeout 900
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _auto(v, base, h, w, base_h, base_w):
    """Mirror of the pipeline's resolution-aware auto chunk sizing."""
    if v is not None:
        return v
    return max(1, int(base * (base_h * base_w) / float(h * w)))


def plan(args):
    """Reproduce the shapes the pipeline will use for this protocol.
    Pure numpy/file work — safe in the deviceless parent."""
    import numpy as np

    from fgt_tpu.pipeline.video_inpainting import (
        DEFAULT_FGT_CONFIG, _scan_chunks, fgt_window_ids)

    n, img_h, img_w = args.frames, args.imgH, args.imgW
    if img_h < 350:
        flow_h, flow_w = img_h * 2, img_w * 2
    else:
        flow_h, flow_w = img_h, img_w
    # bench/demo sources are at image resolution -> device upscale path
    vshape = (n, img_h, img_w, 3) if not args.cpu_frame_upscale \
        else (n, flow_h, flow_w, 3)

    from fgt_tpu.pipeline.video_inpainting import auto_raft_chunk
    corr_dtype = "bfloat16" if args.bf16 else "float32"
    # pallas_lookup=True: this tool warms the PALLAS scan program, and the
    # pipeline sizes that path's chunk with the pallas budget (the XLA
    # fallback uses a smaller chunk and needs no warming)
    # ONE scan program for both directions (pipeline batches fwd+bwd
    # pairs into the same scan steps), so the idx covers 2*(n-1) pairs.
    # Each lookup path gets its own budgeted chunk (and so idx shape).
    pairs = 2 * (n - 1)
    src = np.arange(pairs, dtype=np.int32)

    def _idx_shape(fused: bool):
        rc = (args.raft_chunk if args.raft_chunk is not None
              else auto_raft_chunk(
                  pairs, flow_h, flow_w,
                  corr_itemsize=2 if corr_dtype != "float32" else 4,
                  pallas_lookup=not fused, fused=fused))
        c = max(1, min(rc, pairs))
        return (np.stack([_scan_chunks(src, c), _scan_chunks(src, c)],
                         axis=1)).shape

    idx_shape = _idx_shape(False)
    idx_shape_fused = _idx_shape(True)

    fgt_cfg = dict(DEFAULT_FGT_CONFIG)
    if args.fgt_ckpts and os.path.isdir(args.fgt_ckpts):
        try:
            import yaml

            from fgt_tpu.utils.checkpoint import find_model_pair

            _, cfg_path = find_model_pair(args.fgt_ckpts)
            with open(cfg_path) as f:
                fgt_cfg.update(yaml.safe_load(f))
        except FileNotFoundError:
            pass
    ids_mat, t_n = fgt_window_ids(n, args.neighbor_stride, args.step,
                                  args.num_ref)
    wb = max(1, min(_auto(args.window_batch, 6, img_h, img_w, 240, 432),
                    ids_mat.shape[0]))
    ids_k_shape = _scan_chunks(ids_mat, wb).shape

    dtype = "bfloat16" if args.bf16 else "float32"
    wire = ("float16" if args.bf16 and not getattr(args, "wire_f32", False)
            else "float32")   # mirror of pipeline wire_dtypes()
    return {
        "wire": wire,
        "vshape": vshape, "idx_shape": idx_shape,
        "idx_shape_fused": idx_shape_fused, "iters": args.raft_iters,
        "out_hw": (img_h, img_w), "flow_hw": (flow_h, flow_w),
        "frames_shape": (n, img_h, img_w, 3),
        "ids_k_shape": ids_k_shape, "t_n": t_n,
        "fgt_cfg": fgt_cfg, "dtype": dtype,
    }


def signatures(args, p):
    from dataclasses import dataclass

    from fgt_tpu.pipeline.video_inpainting import (fgt_scan_signature,
                                                   raft_scan_signature)

    @dataclass
    class _RC:
        small: bool
        alternate_corr: bool
        corr_dtype: str = "float32"

        @property
        def alt(self):  # pragma: no cover - convenience
            return self.alternate_corr

    rc = _RC(small=bool(args.small),
             alternate_corr=bool(args.alternate_corr),
             corr_dtype="bfloat16" if args.bf16 else "float32")
    sigs = {}
    if args.stage in ("all", "raft_fused"):
        sigs["raft_fused"] = raft_scan_signature(
            rc, p["dtype"], p["vshape"], p["idx_shape_fused"], p["iters"],
            p["out_hw"], p["flow_hw"], wire=p["wire"], lookup="fused")
    if args.stage in ("all", "raft"):
        sigs["raft"] = raft_scan_signature(
            rc, p["dtype"], p["vshape"], p["idx_shape"], p["iters"],
            p["out_hw"], p["flow_hw"], wire=p["wire"])
    if args.stage in ("all", "fgt") and p["fgt_cfg"].get("use_flash", 0):
        sigs["fgt"] = fgt_scan_signature(
            p["fgt_cfg"], p["dtype"], p["frames_shape"], p["ids_k_shape"],
            p["t_n"], wire=p["wire"])
    return sigs


def run_child(args):
    """Owns the TPU: build the exact stage programs and AOT-compile them
    into the persistent cache."""
    import jax
    import numpy as np

    from fgt_tpu.pipeline.video_inpainting import (Models, build_parser)
    from fgt_tpu.utils import pallas_guard as pg
    from fgt_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    p = plan(args)
    sigs = signatures(args, p)
    pipe_args = build_parser().parse_args([
        "--imgH", str(args.imgH), "--imgW", str(args.imgW),
        "--raft_iters", str(args.raft_iters)]
        + (["--small"] if args.small else [])
        + (["--alternate_corr"] if args.alternate_corr else [])
        + (["--f32"] if not args.bf16 else [])
        + (["--wire_f32"] if getattr(args, "wire_f32", False) else [])
        + (["--fgt_ckpts", args.fgt_ckpts] if args.fgt_ckpts else [])
        + (["--lafc_ckpts", args.lafc_ckpts] if args.lafc_ckpts else []))
    models = Models(pipe_args)
    sds = jax.ShapeDtypeStruct

    if "raft" in sigs or "raft_fused" in sigs:
        # mirror the shared-encoding split: refine-only scan over
        # precomputed 1/8-res features (calculate_flows_scan)
        n = p["vshape"][0]
        h8, w8 = p["flow_hw"][0] // 8, p["flow_hw"][1] // 8
        cfg = models.raft_cfg
        fdim = 128 if cfg.small else 256
        ft = models.dtype
        for lk, sig_key, ishape in (("fused", "raft_fused",
                                     p["idx_shape_fused"]),
                                    ("pallas", "raft", p["idx_shape"])):
            if sig_key not in sigs:
                continue
            print(f"compiling raft_scan ({lk} lookup) {p['vshape']} ...")
            fn = models.raft_scan(lk)
            fn.fn.lower(models.raft_vars,
                        sds((n, h8, w8, fdim), ft),
                        sds((n, h8, w8, cfg.hidden_dim), ft),
                        sds((n, h8, w8, cfg.context_dim), ft),
                        sds(ishape, np.int32), p["iters"],
                        *p["out_hw"]).compile()
            pg.record(sigs[sig_key], True)
            print("  ok:", sigs[sig_key])

    if "fgt" in sigs:
        n, h, w, _ = p["frames_shape"]
        print(f"compiling fgt_scan (flash attention) {p['frames_shape']} "
              f"ids {p['ids_k_shape']} ...")
        fn = models.fgt_scan(use_flash=True)
        fn.fn.lower(models.fgt_vars, sds((n, h, w, 3), np.uint8),
                    sds((n, h, w, 1), np.uint8),
                    sds((n - 1, h, w, 2), models.wire_np),
                    sds(p["ids_k_shape"], np.int32),
                    sds((), np.int32), p["t_n"]).compile()
        pg.record(sigs["fgt"], True)
        print("  ok:", sigs["fgt"])
    return 0


def main():

    from fgt_tpu.utils.relay import honor_cpu_request

    honor_cpu_request()   # JAX_PLATFORMS=cpu beats the axon sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--imgH", type=int, default=240)
    ap.add_argument("--imgW", type=int, default=432)
    ap.add_argument("--raft_iters", type=int, default=20)
    ap.add_argument("--raft_chunk", type=int, default=None)
    ap.add_argument("--window_batch", type=int, default=None)
    ap.add_argument("--neighbor_stride", type=int, default=5)
    ap.add_argument("--step", type=int, default=10)
    ap.add_argument("--num_ref", type=int, default=-1)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--alternate_corr", action="store_true")
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--wire_f32", action="store_true",
                    help="warm the f32-wire program variants (--wire_f32 "
                         "pipeline runs trace different programs)")
    ap.add_argument("--cpu_frame_upscale", action="store_true")
    ap.add_argument("--fgt_ckpts", default="checkpoints/fgt")
    ap.add_argument("--lafc_ckpts", default="checkpoints/lafc")
    ap.add_argument("--stage", choices=["all", "raft", "raft_fused",
                                        "fgt"],
                    default="all")
    ap.add_argument("--timeout", type=float, default=None)
    ap.add_argument("--retry", action="store_true",
                    help="re-probe signatures previously recorded failed")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        sys.exit(run_child(args))

    # parent: never init a jax backend (the child needs the TPU)
    from fgt_tpu.utils import pallas_guard as pg

    p = plan(args)
    sigs = signatures(args, p)
    if not sigs:
        print("nothing to warm (no pallas-bearing stage selected)")
        return
    child_argv = [sys.executable, os.path.abspath(__file__), "--child"] + [
        a for a in sys.argv[1:] if a != "--retry"]
    ok_all = True
    for stage, sig in sigs.items():
        known = pg.check(sig)
        if known is True:
            print(f"{stage}: {sig} already recorded ok")
            continue
        if known is False and not args.retry:
            print(f"{stage}: {sig} recorded FAILED earlier "
                  "(--retry to re-probe)")
            ok_all = False
            continue
        ok = pg.probe(sig, child_argv + ["--stage", stage],
                      timeout_s=args.timeout)
        print(f"{stage}: {sig} -> {'ok' if ok else 'FAILED/timeout'}")
        ok_all = ok_all and ok
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
