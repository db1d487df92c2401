"""Op-level device profile of one pipeline stage program on the real TPU.

VERDICT r3 #2/#5 ask for a committed trace analysis naming where device
time goes (s1_raft runs at 2.7% MFU; training at 6-10%). This tool traces
ONE warm invocation of a stage program with ``jax.profiler`` and
aggregates the XLA op events from the TPU device plane of the resulting
``.xplane.pb`` (parsed via tensorflow's bundled xplane proto), printing a
JSON summary: top ops by self time, grouped by op category.

Usage:
  python tools/profile_stage.py --stage raft [--chunk 8] [--frames 24]
  python tools/profile_stage.py --stage fgt_train
  python tools/profile_stage.py --stage lafc_train

The parse half is pure-protobuf and also runs offline:
  python tools/profile_stage.py --parse /tmp/fgt_trace_raft
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------- xplane parsing ----------------

def _load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    raw = open(paths[-1], "rb").read()
    if paths[-1].endswith(".gz"):
        raw = gzip.decompress(raw)
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(raw)
    return xs, paths[-1]


_CATEGORY_RULES = [
    (r"fusion", "fusion"),
    (r"^(conv|%conv)|convolution", "convolution"),
    (r"dot|einsum", "dot"),
    (r"dynamic-slice|dynamic_slice", "dynamic-slice"),
    (r"dynamic-update", "dynamic-update-slice"),
    (r"custom-call|mosaic|tpu_custom", "custom-call (pallas)"),
    (r"copy", "copy"),
    (r"reduce-window|reduce_window", "reduce-window"),
    (r"all-reduce|all-gather|collective", "collective"),
    (r"scatter", "scatter"),
    (r"gather", "gather"),
    (r"transpose", "transpose"),
    (r"infeed|outfeed", "infeed/outfeed"),
]


def _category(name: str, display: str) -> str:
    s = (display or name).lower()
    for pat, cat in _CATEGORY_RULES:
        if re.search(pat, s):
            return cat
    return "other"


def parse_trace(trace_dir: str, top: int = 40) -> dict:
    """Aggregate self-time per op name on the TPU device plane(s)."""
    xs, path = _load_xspace(trace_dir)
    per_op: dict[str, float] = {}
    per_line: dict[str, float] = {}
    device_planes = [p for p in xs.planes
                     if "TPU" in p.name and "Host" not in p.name]
    if not device_planes:  # tunnel backends sometimes label differently
        device_planes = [p for p in xs.planes
                         if p.name.startswith("/device:")]
    for plane in device_planes:
        meta = {m_id: m for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            lname = f"{plane.name}::{line.name}"
            # XLA op-level lines only: skip module/trace-scope summary
            # lines, which nest ops and would double-count
            if line.name.lower() in ("xla modules", "steps"):
                for ev in line.events:
                    per_line[lname] = per_line.get(lname, 0.0) \
                        + ev.duration_ps / 1e12
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = (m.display_name or m.name) if m else "?"
                key = name
                per_op[key] = per_op.get(key, 0.0) + ev.duration_ps / 1e12
                per_line[lname] = per_line.get(lname, 0.0) \
                    + ev.duration_ps / 1e12
    cats: dict[str, float] = {}
    for name, t in per_op.items():
        c = _category(name, name)
        cats[c] = cats.get(c, 0.0) + t
    total = sum(per_op.values())
    ranked = sorted(per_op.items(), key=lambda kv: -kv[1])[:top]
    return {
        "trace": path,
        "device_plane_names": [p.name for p in device_planes],
        "line_totals_s": {k: round(v, 4) for k, v in sorted(
            per_line.items(), key=lambda kv: -kv[1])},
        "op_total_s": round(total, 4),
        "categories_s": {k: round(v, 4) for k, v in sorted(
            cats.items(), key=lambda kv: -kv[1])},
        "top_ops": [{"name": n[:160], "self_s": round(t, 5),
                     "pct": round(100 * t / max(total, 1e-12), 2)}
                    for n, t in ranked],
    }


# ---------------- stage runners ----------------

def _bench_video(frames: int, h: int, w: int):
    import numpy as np

    sys.path.insert(0, REPO)
    from bench import make_synthetic_data
    import tempfile
    import imageio.v2 as imageio

    root = tempfile.mkdtemp(prefix="fgt_prof_")
    frames_dir, masks_dir = make_synthetic_data(root, frames, h, w)
    vid = np.stack([imageio.imread(p) for p in sorted(
        glob.glob(os.path.join(frames_dir, "*.png")))])
    masks = np.stack([imageio.imread(p) for p in sorted(
        glob.glob(os.path.join(masks_dir, "*.png")))])
    return vid, masks


def run_raft(args) -> str:
    import jax
    import numpy as np

    from fgt_tpu.pipeline.video_inpainting import (
        Models, build_parser, calculate_flows_scan, _put)
    from fgt_tpu.utils.profiling import maybe_trace

    vid, _ = _bench_video(args.frames, args.imgH, args.imgW)
    flow_h = args.imgH * 2 if args.imgH < 350 else args.imgH
    flow_w = args.imgW * 2 if args.imgH < 350 else args.imgW
    margs = build_parser().parse_args(
        ["--imgH", str(args.imgH), "--imgW", str(args.imgW),
         "--pallas_lookup", args.pallas_lookup,
         "--fused_corr", args.fused_corr])
    models = Models(margs)
    vid_dev = _put(vid)
    n = vid.shape[0]

    def once():
        f, b, df, db = calculate_flows_scan(
            models, vid_dev, n, args.imgH, args.imgW, flow_h, flow_w,
            iters=20, chunk=args.chunk, defer_forward=True,
            defer_backward=True)
        # block_until_ready does NOT wait under axon; a tiny fetch of the
        # scan output is the only real drain. Without it the warm calls'
        # device work bleeds into the traced window and the trace shows
        # ops from programs the traced call never ran.
        np.asarray(b()[-1, :1, :1])

    once()  # compile + tunnel warm
    once()   # fetch inside once() drains the device before tracing
    with maybe_trace(args.out, enabled=True):
        once()
    return args.out


def run_fgt_infer(args) -> str:
    """Trace one warm s6 fgt_synthesis_scan at bench shape (VERDICT r4 #4:
    why did inference NOT inherit the cell fold/unfold win the train step
    got). Uses the same packed-wire device path the pipeline runs."""
    import jax
    import numpy as np

    from fgt_tpu.pipeline.video_inpainting import (Models, _put,
                                                   build_parser,
                                                   fgt_synthesis_scan)
    from fgt_tpu.utils.profiling import maybe_trace

    vid, masks = _bench_video(args.frames, args.imgH, args.imgW)
    margs = build_parser().parse_args(
        ["--imgH", str(args.imgH), "--imgW", str(args.imgW)])
    models = Models(margs)
    rng = np.random.RandomState(0)
    frames = vid.astype(np.float32) / 255.0
    masks_np = (masks > 127).astype(np.float32)[..., None]
    # post-Poisson-like content inside the hole
    frames[masks_np[..., 0] > 0] = rng.rand(
        int((masks_np > 0).sum()), 3).astype(np.float32)
    flows = rng.randn(args.frames - 1, args.imgH, args.imgW, 2).astype(
        np.float32)
    flows_dev = _put(flows.astype(models.wire_np))
    base_dev = _put(vid)
    wb = args.batch or 6

    def once():
        out = fgt_synthesis_scan(models, frames, masks_np, flows,
                                 flows_dev, neighbor_stride=5, step=10,
                                 window_batch=wb, base_u8=vid,
                                 base_u8_dev=base_dev)
        return out

    once()  # compile + tunnel warm
    once()
    with maybe_trace(args.out, enabled=True):
        once()
    return args.out


def run_train(args, which: str) -> str:
    """Trace one warm jitted train step at reference dims (the same
    step programs bench_train measures)."""
    import jax
    import jax.numpy as jnp

    from fgt_tpu.utils.profiling import maybe_trace

    if which == "fgt_train":
        from fgt_tpu.models.discriminator import TemporalPatchGAN
        from fgt_tpu.models.registry import build_model
        from fgt_tpu.pipeline.video_inpainting import DEFAULT_FGT_CONFIG
        from fgt_tpu.train.fgt_step import (FGTLossWeights, GANTrainState,
                                            make_fgt_train_step)
        from fgt_tpu.train.schedules import make_adam, warmup_step_decay
        import bench_train as bt

        h, w, t = args.imgH, args.imgW, 5
        b = args.batch or 2
        cfg = dict(DEFAULT_FGT_CONFIG)
        cfg["res_h"], cfg["res_w"] = h, w
        cfg["use_flash"] = 0
        gen = build_model("model", cfg)
        disc = TemporalPatchGAN(in_channels=3, dist_cnum=32)
        rng = jax.random.PRNGKey(0)
        dummy_fr = jnp.zeros((1, t, h, w, 3))
        dummy_fl = jnp.zeros((1, t, h, w, 2))
        dummy_m = jnp.zeros((1, t, h, w, 1))
        g_params = jax.jit(gen.init)(rng, dummy_fr, dummy_fl, dummy_m)
        d_vars = jax.jit(disc.init)(jax.random.fold_in(rng, 1), dummy_fr)
        sched = warmup_step_decay(1e-4, decay_interval=300_000, gamma=0.1)
        g_tx, d_tx = make_adam(sched), make_adam(sched)

        def g_apply(params, frames, flows, masks):
            return gen.apply(params, frames, flows, masks)

        def d_apply(variables, video, sn_update):
            if sn_update:
                out, mut = disc.apply(variables, video, sn_update=True,
                                      mutable=["spectral"])
                return out, mut["spectral"]
            return disc.apply(variables, video), variables["spectral"]

        step = make_fgt_train_step(
            g_apply, d_apply, None, g_tx, d_tx, FGTLossWeights(),
            compute_dtype=jnp.bfloat16)
        state = GANTrainState(
            g_params=g_params, d_params=d_vars["params"],
            d_spectral=d_vars["spectral"], g_opt=g_tx.init(g_params),
            d_opt=d_tx.init(d_vars["params"]),
            step=jnp.zeros((), jnp.int32))
        batch = {k: jnp.asarray(v) for k, v in
                 bt.synth_fgt_batch(b, t, h, w).items()}
        state, m = step(state, batch, None)        # compile
        jax.block_until_ready(m)
        state, m = step(state, batch, None)
        jax.block_until_ready(m)
        with maybe_trace(args.out, enabled=True):
            state, m = step(state, batch, None)
            jax.block_until_ready(m)
        return args.out

    # lafc_train
    from fgt_tpu.models.registry import build_model
    from fgt_tpu.pipeline.video_inpainting import DEFAULT_LAFC_CONFIG
    from fgt_tpu.train.lafc_step import (LAFCLossWeights,
                                         make_lafc_train_step)
    from fgt_tpu.train.schedules import make_adam, warmup_step_decay
    import bench_train as bt

    h, w = args.imgH, args.imgW
    b = args.batch or 4
    cfg = dict(DEFAULT_LAFC_CONFIG)
    cfg["use_edges"] = 1
    model = build_model("lafc", cfg)
    rng = jax.random.PRNGKey(0)
    t = cfg["num_flows"]
    params = jax.jit(model.init)(rng, jnp.zeros((1, t, h, w, 2)),
                                 jnp.zeros((1, t, h, w, 1)))
    tx = make_adam(warmup_step_decay(1e-4, decay_interval=120_000,
                                     gamma=0.1))
    step = make_lafc_train_step(model.apply, tx, LAFCLossWeights(),
                                compute_dtype=jnp.bfloat16)
    opt_state = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in
             bt.synth_lafc_batch(b, h, w, t).items()}
    params, opt_state, m = step(params, opt_state, batch)
    jax.block_until_ready(m)
    params, opt_state, m = step(params, opt_state, batch)
    jax.block_until_ready(m)
    with maybe_trace(args.out, enabled=True):
        params, opt_state, m = step(params, opt_state, batch)
        jax.block_until_ready(m)
    return args.out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="raft",
                    choices=["raft", "fgt_infer", "fgt_train",
                             "lafc_train"])
    ap.add_argument("--parse", default="",
                    help="only parse an existing trace dir")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--imgH", type=int, default=240)
    ap.add_argument("--imgW", type=int, default=432)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--out", default="")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json", default="", help="write summary JSON here")
    ap.add_argument("--pallas_lookup", default="auto",
                    choices=["auto", "on", "off"],
                    help="raft stage: force the corr-lookup path so the "
                         "trace matches the path the bench actually took "
                         "(the guard registry is per-process)")
    ap.add_argument("--fused_corr", default="auto",
                    choices=["auto", "on", "off"],
                    help="raft stage: force/disable the fused on-the-fly "
                         "correlation path (no pyramid in HBM)")
    args = ap.parse_args()

    if args.parse:
        summary = parse_trace(args.parse, args.top)
    else:
        from fgt_tpu.utils.relay import honor_cpu_request

        honor_cpu_request()
        args.out = args.out or f"/tmp/fgt_trace_{args.stage}"
        if args.stage == "raft":
            trace_dir = run_raft(args)
        elif args.stage == "fgt_infer":
            trace_dir = run_fgt_infer(args)
        else:
            trace_dir = run_train(args, args.stage)
        summary = parse_trace(trace_dir, args.top)

    print(json.dumps(summary, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
