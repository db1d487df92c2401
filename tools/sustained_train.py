"""Sustained FGT GAN training through the REAL trainer (VERDICT r4 #7).

Runs ``fgt_tpu.train.trainer.FGTTrainer`` — not the bare step function —
for N steps at the reference dims (240x432, 5 frames, batch 2, bf16
mixed precision, frozen LAFC-single flow oracle) over a synthetic
YouTube-VOS-style dataset tree, with:

* the in-training DAVIS-protocol validation actually firing
  (``train/validate.py`` — PSNR/SSIM/L1/L2 + side-by-side canvases),
* TB/jsonl metrics curves (``MetricsWriter``),
* LR decay VISIBLE inside the run: ``UPDATE_INTERVAL`` is scaled to
  ``steps // 2`` so the warmup_step_decay boundary is crossed mid-run
  (the reference decays every 300k of 500k iters — same shape, scaled),
* the checkpoint trio cadence (``save_checkpoint_freq``).

Reference anchor: FGT/networks/network.py:86-354 (hot loop + validation),
FGT/config/train.yaml:34-45 (budget). No datasets ship in this image, so
the tree is synthetic: textured panning videos whose stored flows are the
true pan field plus noise — the data pipeline (jpg decode, .flo read +
flow_tf, STTN mask synthesis, regionfill diffusion, item-0 fallback) is
the real one end to end.

Prints ONE JSON line and writes the full record (+ curves copied from
metrics.jsonl) to --out (default docs/SUSTAINED_TRAIN_r05.json).
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


def _write_video_tree(root: str, n_videos: int, n_frames: int,
                      h: int, w: int, flow_h: int, flow_w: int,
                      seed: int = 0) -> None:
    """frames/<video>/%05d.jpg + flows/<video>/{forward,backward}_flo —
    the YouTube-VOS layout both trainers consume (SURVEY §2.3)."""
    import cv2
    import imageio.v2 as imageio

    from fgt_tpu.core.flow_io import write_flow

    rng = np.random.RandomState(seed)
    k = np.ones((9, 9), np.float32) / 81.0
    for v in range(n_videos):
        name = f"video{v:03d}"
        fdir = os.path.join(root, "frames", name)
        xdir = os.path.join(root, "flows", name)
        os.makedirs(fdir, exist_ok=True)
        os.makedirs(os.path.join(xdir, "forward_flo"), exist_ok=True)
        os.makedirs(os.path.join(xdir, "backward_flo"), exist_ok=True)
        pan = int(rng.randint(1, 4))
        base = (rng.rand(h + 8, w + pan * n_frames + 8, 3) * 255)
        base = cv2.filter2D(base.astype(np.float32), -1, k)
        base = base.astype(np.uint8)
        for i in range(n_frames):
            fr = base[4:4 + h, 4 + pan * i:4 + pan * i + w]
            imageio.imwrite(os.path.join(fdir, f"{i:05d}.jpg"), fr,
                            quality=92)
        # true flow of the pan (+ mild noise), stored at flow res — the
        # dataset's flow_tf resize/rescale path runs for real
        sx = pan * flow_w / float(w)
        for i in range(n_frames - 1):
            noise = rng.randn(flow_h, flow_w, 2).astype(np.float32) * 0.05
            fwd = noise.copy()
            fwd[..., 0] += -sx
            bwd = -fwd
            write_flow(fwd, os.path.join(xdir, "forward_flo",
                                         f"{i:05d}.flo"))
            write_flow(bwd, os.path.join(xdir, "backward_flo",
                                         f"{i:05d}.flo"))


def main():
    from fgt_tpu.utils.relay import cli_relay_guard

    cli_relay_guard()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--videos", type=int, default=8)
    ap.add_argument("--frames", type=int, default=26)
    ap.add_argument("--imgH", type=int, default=240)
    ap.add_argument("--imgW", type=int, default=432)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--val_every_steps", type=int, default=1000)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--root", default="/tmp/fgt_sustained")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "SUSTAINED_TRAIN_r05.json"))
    args = ap.parse_args()

    import jax

    from fgt_tpu.models.registry import build_model
    from fgt_tpu.utils import checkpoint as ckpt
    from fgt_tpu.utils.hostmem import retain_heap

    retain_heap()
    h, w = args.imgH, args.imgW
    root = args.root
    t_gen0 = time.time()
    if not os.path.isdir(os.path.join(root, "frames")):
        _write_video_tree(root, args.videos, args.frames, h, w,
                          h // 2, w // 2, seed=0)
    val_root = os.path.join(root, "val")
    if not os.path.isdir(os.path.join(val_root, "frames")):
        _write_video_tree(val_root, 4, 25, h, w, h // 2, w // 2, seed=99)
    gen_s = time.time() - t_gen0

    # frozen LAFC-single oracle: random-init weights saved as msgpack (no
    # pretrained stage-1 ships here; the ORACLE CALL is what's exercised)
    flow_cfg = {"cnum": 48, "in_channel": 3, "PASSMASK": 1,
                "use_residual": 1, "resBlocks": 1, "use_bias": 1,
                "conv_type": "vanilla"}
    oracle_path = os.path.join(root, "lafc_single.msgpack")
    if not os.path.exists(oracle_path):
        import jax.numpy as jnp

        fm = build_model("lafc_single", flow_cfg)
        fp = jax.jit(fm.init)(jax.random.PRNGKey(2),
                              jnp.zeros((1, h, w, 2)),
                              jnp.zeros((1, h, w, 1)))
        ckpt.save_pytree(fp, oracle_path)

    steps = args.steps
    opt = {
        "name": "FGT_sustained_r05", "model": "model",
        "outputdir": os.path.join(root, "outputs"),
        "datasetName_train": "train_dataset",
        "seed": 10, "mixed_precision": 1, "record_iter": 16,
        "use_valid": True,
        "datasets": {
            "dataInfo": {
                "frame_path": os.path.join(root, "frames"),
                "flow_path": os.path.join(root, "flows"),
                "name2len": None,
                "flow": {"flow_height": h, "flow_width": w},
                "edge": {"sigma": 1, "low_threshold": 0.1,
                         "high_threshold": 0.2},
            },
            "valInfo": {
                "frame_root": os.path.join(val_root, "frames"),
                "flow_root": os.path.join(val_root, "flows"),
                "num_videos": 4, "input_resolution": [h, w],
                "pivot": 12,
            },
            "train": {"batch_size": args.batch, "n_workers": args.workers},
        },
        "train": {
            "lr": 1e-4, "lr_decay": 0.1, "BETA1": 0.9, "BETA2": 0.999,
            "MAX_ITERS": steps,
            # decay boundary crossed mid-run so the StepLR schedule is
            # exercised (reference shape: decay at 300k of 500k)
            "UPDATE_INTERVAL": max(1, steps // 2),
            "WARMUP": None,
            "log_freq": 16, "save_checkpoint_freq": max(500, steps // 2),
            "L1M": 1, "L1V": 1, "adv": 0.01,
        },
        "flow_checkPoint": oracle_path,
        "flow_config": flow_cfg,
        "flow_direction": "for", "num_frames": 5, "sample": "random",
        "input_resolution": (h, w),
        # reference model scale (FGT/config/train.yaml:58-85)
        "res_h": h, "res_w": w, "in_channel": 4, "cnum": 64,
        "flow_inChannel": 2, "flow_cnum": 64, "dist_cnum": 32,
        "frame_hidden": 512, "flow_hidden": 256, "PASSMASK": 1,
        "numBlocks": 8, "kernel_size_w": 7, "kernel_size_h": 7,
        "stride_h": 3, "stride_w": 3, "pad_h": 3, "pad_w": 3,
        "num_head": 4, "conv_type": "vanilla", "norm": None,
        "use_bias": 1, "ape": 1, "mlp_ratio": 40, "drop": 0, "tw": 2,
        "sw": 8, "gd": 4, "ref_length": 10, "path": {}, "resume": False,
    }
    # epoch = ceil(videos / global_batch) loader steps; validation fires
    # per-epoch in the trainer, so convert the step cadence
    iters_per_epoch = max(1, -(-args.videos // args.batch))
    opt["train"]["val_freq"] = max(1, args.val_every_steps
                                   // iters_per_epoch)

    from fgt_tpu.train.trainer import FGTTrainer

    t0 = time.time()
    trainer = FGTTrainer(opt)
    t_init = time.time() - t0
    t0 = time.time()
    trainer.train()
    wall = time.time() - t0

    # distill the committed record from the run's own metrics stream
    mpath = os.path.join(trainer.run_dir, "tb", "metrics.jsonl")
    rows = [json.loads(ln) for ln in open(mpath)]
    train_rows = [r for r in rows if "gen_loss" in r]
    val_rows = [r for r in rows if any(k.startswith("val/") for k in r)]
    lrs = [(r["step"], r["lr"]) for r in train_rows if "lr" in r]
    gl = [r["gen_loss"] for r in train_rows]
    dl = [r["dis_loss"] for r in train_rows]
    half = len(dl) // 2
    ckpts = sorted(os.listdir(os.path.join(trainer.run_dir,
                                           "checkpoints")))
    rec = {
        "metric": f"fgt_trainer_sustained_{steps}steps_{h}x{w}"
                  f"_b{args.batch}_bf16",
        "value": round(steps / wall, 3), "unit": "steps/s",
        "vs_baseline": 0.0,
        "steps": steps, "wall_s": round(wall, 1),
        "init_s": round(t_init, 1), "datagen_s": round(gen_s, 1),
        "videos": args.videos, "global_batch": trainer.global_batch,
        "validations": [
            {"step": r["step"],
             **{k.split("/", 1)[1]: round(v, 4) for k, v in r.items()
                if k.startswith("val/")}} for r in val_rows],
        "lr_first": lrs[0][1] if lrs else None,
        "lr_last": lrs[-1][1] if lrs else None,
        "lr_decayed": bool(lrs and lrs[-1][1] < lrs[0][1] * 0.5),
        "gen_loss_first_mean": round(float(np.mean(gl[:4])), 4),
        "gen_loss_last_mean": round(float(np.mean(gl[-4:])), 4),
        "dis_loss_last_half_min": round(float(np.min(dl[half:])), 4),
        "dis_loss_last_half_max": round(float(np.max(dl[half:])), 4),
        "checkpoints": ckpts,
        "run_dir": trainer.run_dir,
        "curves": {
            "step": [r["step"] for r in train_rows],
            "gen_loss": [round(r["gen_loss"], 4) for r in train_rows],
            "dis_loss": [round(r["dis_loss"], 4) for r in train_rows],
            "lr": [r.get("lr") for r in train_rows],
            "it_per_s": [round(r.get("it_per_s", 0.0), 3)
                         for r in train_rows],
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "curves"}))


if __name__ == "__main__":
    main()
