"""Overfit quality gate: prove that training this framework improves its
own inpainting output (round-2 verdict #4).

No pretrained reference checkpoints exist in this environment (git-LFS
missing), so absolute PSNR parity is unprovable. What IS provable: start
from random weights, run the full pipeline on a synthetic clip (PSNR
before), briefly train LAFC on matching smooth flows and FGT on the
clip's own frames (the reference two-stage recipe, README.md:98-121, in
miniature), re-run the pipeline with the trained weights (PSNR after),
and require the inpainted PSNR to improve.

Run (TPU or CPU): python tools/overfit_gate.py [--lafc_steps 150]
    [--fgt_steps 100] [--frames 24]
Writes OVERFIT_GATE.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_pipeline_psnr(frames_dir, masks_dir, out, lafc_dir, fgt_dir,
                      hole_only: bool = False):
    import cv2
    import imageio.v2 as imageio

    from fgt_tpu.core import metrics as M
    from fgt_tpu.core.video_io import read_video
    from fgt_tpu.pipeline.video_inpainting import (build_parser,
                                                   video_inpainting)

    args = build_parser().parse_args([
        "--mode", "object_removal", "--path", frames_dir,
        "--path_mask", masks_dir, "--outroot", out,
        "--imgH", "240", "--imgW", "432",
        "--lafc_ckpts", lafc_dir, "--fgt_ckpts", fgt_dir,
        "--raft_model", "/nonexistent", "--vis_frame"])
    out_path = video_inpainting(args)
    png_dir = os.path.join(out, "frames")
    if os.path.isdir(png_dir):   # lossless dumps (codec noise excluded)
        result = np.stack([imageio.imread(os.path.join(png_dir, f))
                           for f in sorted(os.listdir(png_dir))]
                          ).astype(np.float64)
    else:
        result = np.stack(read_video(out_path)).astype(np.float64)
    gt_files = sorted(os.listdir(frames_dir))
    gt = np.stack([cv2.resize(imageio.imread(
        os.path.join(frames_dir, f)).astype(np.float64), (432, 240))
        for f in gt_files])
    n = min(len(result), len(gt))
    if not hole_only:
        return float(np.mean([M.psnr(result[i].astype(np.uint8),
                                     gt[i].astype(np.uint8))
                              for i in range(n)]))
    # hole-region PSNR: one MSE over all hole pixels of the clip —
    # isolates what the synthesis stages put INSIDE the mask
    mk_files = sorted(os.listdir(masks_dir))
    se = cnt = 0.0
    for i in range(n):
        mk = cv2.resize(imageio.imread(
            os.path.join(masks_dir, mk_files[i])), (432, 240),
            interpolation=cv2.INTER_NEAREST) > 0
        if mk.ndim == 3:
            mk = mk[..., 0]
        d = (result[i].astype(np.float64)
             - gt[i].astype(np.float64))[mk]
        se += float((d ** 2).sum())
        cnt += d.size
    mse = se / max(cnt, 1.0)
    return float(10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12)))


def make_static_data(root: str, n: int, h: int = 240, w: int = 432):
    """Static camera + static mask: the hole region is NEVER revealed, so
    flow chains fill nothing (flowNN's mask_tofill stays the whole hole)
    and the inpainted content is pure FGT hallucination — isolating the
    FGT stage's learning signal (round-3 verdict #8)."""
    import cv2
    import imageio.v2 as imageio

    frames_dir = os.path.join(root, "frames")
    masks_dir = os.path.join(root, "masks")
    os.makedirs(frames_dir, exist_ok=True)
    os.makedirs(masks_dir, exist_ok=True)
    rng = np.random.RandomState(7)
    base = (rng.rand(h, w, 3) * 255).astype(np.float32)
    base = cv2.filter2D(base, -1,
                        np.ones((9, 9), np.float32) / 81.0)
    # temporal jitter below RAFT's sensitivity keeps D's real/fake task
    # non-degenerate without revealing the hole
    mask = np.zeros((h, w), np.uint8)
    mask[92:148, 188:244] = 255
    for i in range(n):
        jit = rng.randn(h, w, 3).astype(np.float32) * 1.5
        frame = np.clip(base + jit, 0, 255).astype(np.uint8)
        imageio.imwrite(os.path.join(frames_dir, f"{i:05d}.png"), frame)
        imageio.imwrite(os.path.join(masks_dir, f"{i:05d}.png"), mask)
    return frames_dir, masks_dir


def train_lafc(steps: int, h: int, w: int, pan: float = 2.0):
    """Overfit LAFC on smooth pan-like flows with rectangular holes (the
    flow statistics of the synthetic eval clip)."""
    import jax
    import jax.numpy as jnp

    from fgt_tpu.models.registry import build_model
    from fgt_tpu.pipeline.video_inpainting import DEFAULT_LAFC_CONFIG
    from fgt_tpu.train.lafc_step import (LAFCLossWeights,
                                         make_lafc_train_step)
    from fgt_tpu.train.schedules import make_adam, warmup_step_decay

    cfg = dict(DEFAULT_LAFC_CONFIG)
    cfg["use_edges"] = 1
    model = build_model("lafc", cfg)
    t = cfg["num_flows"]
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, t, h, w, 2)),
                                 jnp.zeros((1, t, h, w, 1)))
    tx = make_adam(warmup_step_decay(2e-4, decay_interval=10**6, gamma=0.1))
    step = make_lafc_train_step(model.apply, tx, LAFCLossWeights())
    opt_state = tx.init(params)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    losses = []
    for i in range(steps):
        rng = np.random.RandomState(i % 8)
        b = 4
        base = np.stack([xx * 0 + pan + 0.3 * np.sin(yy / 53.0 + i % 8),
                         yy * 0 + 0.3 * np.cos(xx / 47.0 - i % 8)], -1)
        flows = np.broadcast_to(base, (b, t, h, w, 2)).astype(np.float32)
        masks = np.zeros((b, t, h, w, 1), np.float32)
        for j in range(b):
            y0 = 40 + 13 * j
            x0 = 100 + 17 * j
            masks[j, :, y0:y0 + 72, x0:x0 + 72] = 1.0
        diffused = flows * (1 - masks) + \
            rng.randn(*flows.shape).astype(np.float32) * masks * 0.5
        cur = rng.rand(b, h, w, 3).astype(np.float32)
        batch = {"flows": jnp.asarray(flows.copy()),
                 "diffused_flows": jnp.asarray(diffused),
                 "masks": jnp.asarray(masks),
                 "edges": jnp.zeros((b, h, w, 1)),
                 "current_frame": jnp.asarray(cur),
                 "shift_frame": jnp.asarray(np.roll(cur, int(pan), 2))}
        params, opt_state, m = step(params, opt_state, batch)
        if (i + 1) % 25 == 0 or i == 0:
            losses.append(round(float(m["loss"]), 4))
            print(f"  lafc step {i + 1}/{steps} loss {losses[-1]}")
    return model, jax.device_get(params), cfg, losses


def train_fgt(steps: int, frames_dir: str, h: int, w: int,
              pan: float = 2.0):
    """Overfit FGT on the eval clip's own frames: reconstruct masked
    windows (the reference stage-2 recipe with the adversarial term)."""
    import cv2
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from fgt_tpu.models.discriminator import TemporalPatchGAN
    from fgt_tpu.models.registry import build_model
    from fgt_tpu.pipeline.video_inpainting import DEFAULT_FGT_CONFIG
    from fgt_tpu.train.fgt_step import (FGTLossWeights, GANTrainState,
                                        make_fgt_train_step)
    from fgt_tpu.train.schedules import make_adam, warmup_step_decay

    cfg = dict(DEFAULT_FGT_CONFIG)
    cfg["res_h"], cfg["res_w"] = h, w
    cfg["use_flash"] = 0          # XLA path: works everywhere unguarded
    gen = build_model("model", cfg)
    disc = TemporalPatchGAN(in_channels=3, dist_cnum=32)
    t = 5
    rng = jax.random.PRNGKey(0)
    g_params = jax.jit(gen.init)(rng, jnp.zeros((1, t, h, w, 3)),
                                 jnp.zeros((1, t, h, w, 2)),
                                 jnp.zeros((1, t, h, w, 1)))
    d_vars = jax.jit(disc.init)(jax.random.fold_in(rng, 1),
                                jnp.zeros((1, t, h, w, 3)))
    g_tx = make_adam(warmup_step_decay(2e-4, 10**6, 0.1))
    d_tx = make_adam(warmup_step_decay(2e-4, 10**6, 0.1))

    def g_apply(p, fr, fl, m):
        return gen.apply(p, fr, fl, m)

    def d_apply(variables, video, sn_update):
        if sn_update:
            out, mut = disc.apply(variables, video, sn_update=True,
                                  mutable=["spectral"])
            return out, mut["spectral"]
        return disc.apply(variables, video), variables["spectral"]

    step = make_fgt_train_step(g_apply, d_apply, None, g_tx, d_tx,
                               FGTLossWeights())
    state = GANTrainState(
        g_params=g_params, d_params=d_vars["params"],
        d_spectral=d_vars["spectral"], g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_vars["params"]), step=jnp.zeros((), jnp.int32))

    files = sorted(os.listdir(frames_dir))
    clip = np.stack([cv2.resize(imageio.imread(
        os.path.join(frames_dir, f)).astype(np.float32), (w, h))
        for f in files]) / 255.0 * 2 - 1          # [N, h, w, 3]
    n = clip.shape[0]
    l1s = []
    for i in range(steps):
        rng_np = np.random.RandomState(i % 8)
        b = 2
        frames = np.stack([clip[s:s + t] for s in
                           rng_np.randint(0, n - t, size=b)])
        masks = np.zeros((b, t, h, w, 1), np.float32)
        for j in range(b):
            y0 = rng_np.randint(30, h - 90)
            x0 = rng_np.randint(30, w - 90)
            masks[j, :, y0:y0 + 72, x0:x0 + 72] = 1.0
        flows = np.zeros((b, t, h, w, 2), np.float32)
        flows[..., 0] = pan
        batch = {"frames": jnp.asarray(frames), "masks": jnp.asarray(masks),
                 "flows": jnp.asarray(flows)}
        state, m = step(state, batch, None)
        if (i + 1) % 25 == 0 or i == 0:
            l1s.append(round(float(m["l1_masked"]) + float(m["l1_valid"]),
                             4))
            print(f"  fgt step {i + 1}/{steps} l1 {l1s[-1]}")
    return gen, jax.device_get(state.g_params), cfg, l1s


def run_fgt_only(args, root):
    """Static-clip gate (round-3 verdict #8): flowNN fills nothing, the
    hole PSNR delta is carried by FGT alone. Validation protocol anchor:
    /root/reference/FGT/networks/network.py:258-354."""
    from fgt_tpu.pipeline.video_inpainting import (DEFAULT_FGT_CONFIG,
                                                   DEFAULT_LAFC_CONFIG,
                                                   Models, build_parser)
    from fgt_tpu.utils import checkpoint as ckpt

    frames_dir, masks_dir = make_static_data(root, n=args.frames)
    h, w = 240, 432
    lafc0 = os.path.join(root, "ck_lafc0")
    fgt0 = os.path.join(root, "ck_fgt0")
    m0 = Models(build_parser().parse_args(
        ["--imgH", str(h), "--imgW", str(w)]))
    ckpt.save_model_dir(m0.lafc_vars, dict(DEFAULT_LAFC_CONFIG), lafc0)
    ckpt.save_model_dir(m0.fgt_vars, dict(DEFAULT_FGT_CONFIG), fgt0)
    del m0

    print("fgt-only gate: evaluating with random-init weights...")
    psnr0 = run_pipeline_psnr(frames_dir, masks_dir,
                              os.path.join(root, "out0"), lafc0, fgt0,
                              hole_only=True)
    print(f"hole PSNR before FGT training: {psnr0:.3f} dB")

    print(f"training FGT {args.fgt_steps} steps on the static clip...")
    _, fgt_params, fgt_cfg, fgt_l1s = train_fgt(
        args.fgt_steps, frames_dir, h, w, pan=0.0)
    fgt1 = os.path.join(root, "ck_fgt1")
    ckpt.save_model_dir(fgt_params, fgt_cfg, fgt1)

    print("evaluating with trained FGT (LAFC unchanged)...")
    psnr1 = run_pipeline_psnr(frames_dir, masks_dir,
                              os.path.join(root, "out1"), lafc0, fgt1,
                              hole_only=True)
    print(f"hole PSNR after FGT training: {psnr1:.3f} dB")

    rec = {
        "protocol": f"STATIC camera + static mask, {args.frames} frames "
                    "432x240: flow chains cannot reach the hole "
                    "(mask_tofill stays full), so the hole-region PSNR "
                    f"delta isolates FGT; {args.fgt_steps} overfit steps, "
                    "LAFC left random both times",
        "hole_psnr_before_db": round(psnr0, 3),
        "hole_psnr_after_db": round(psnr1, 3),
        "improved": bool(psnr1 > psnr0),
        "fgt_l1_curve": fgt_l1s,
    }
    path = os.path.join(REPO, "OVERFIT_GATE.json")
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
    merged["fgt_only"] = rec
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(rec))


def main():

    from fgt_tpu.utils.relay import honor_cpu_request

    honor_cpu_request()   # JAX_PLATFORMS=cpu beats the axon sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--lafc_steps", type=int, default=150)
    ap.add_argument("--fgt_steps", type=int, default=100)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--fgt_only", action="store_true",
                    help="static-camera/static-mask gate: flow chains "
                         "cannot fill the hole, so the PSNR delta "
                         "isolates FGT hallucination learning")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import shutil

    import bench
    from fgt_tpu.utils import checkpoint as ckpt
    from fgt_tpu.utils.compile_cache import enable_compilation_cache
    from fgt_tpu.utils.hostmem import retain_heap

    enable_compilation_cache()
    retain_heap()
    root = tempfile.mkdtemp(prefix="fgt_overfit_")
    try:
        if args.fgt_only:
            return run_fgt_only(args, root)
        frames_dir, masks_dir = bench.make_synthetic_data(root,
                                                          n=args.frames)
        h, w = 240, 432

        # random-init checkpoint pair (the "before")
        from fgt_tpu.pipeline.video_inpainting import (DEFAULT_FGT_CONFIG,
                                                       DEFAULT_LAFC_CONFIG,
                                                       Models, build_parser)

        before_lafc = os.path.join(root, "ck_lafc0")
        before_fgt = os.path.join(root, "ck_fgt0")
        m0 = Models(build_parser().parse_args(
            ["--imgH", str(h), "--imgW", str(w)]))
        ckpt.save_model_dir(m0.lafc_vars, dict(DEFAULT_LAFC_CONFIG),
                            before_lafc)
        ckpt.save_model_dir(m0.fgt_vars, dict(DEFAULT_FGT_CONFIG),
                            before_fgt)
        del m0

        print("evaluating with random-init weights...")
        t0 = time.time()
        psnr0 = run_pipeline_psnr(frames_dir, masks_dir,
                                  os.path.join(root, "out0"),
                                  before_lafc, before_fgt)
        print(f"PSNR before training: {psnr0:.3f} dB "
              f"({time.time() - t0:.0f}s)")

        print(f"training LAFC {args.lafc_steps} steps...")
        _, lafc_params, lafc_cfg, lafc_losses = train_lafc(
            args.lafc_steps, h, w)
        after_lafc = os.path.join(root, "ck_lafc1")
        ckpt.save_model_dir(lafc_params, lafc_cfg, after_lafc)

        print(f"training FGT {args.fgt_steps} steps...")
        _, fgt_params, fgt_cfg, fgt_l1s = train_fgt(
            args.fgt_steps, frames_dir, h, w)
        after_fgt = os.path.join(root, "ck_fgt1")
        ckpt.save_model_dir(fgt_params, fgt_cfg, after_fgt)

        print("evaluating with trained weights...")
        psnr1 = run_pipeline_psnr(frames_dir, masks_dir,
                                  os.path.join(root, "out1"),
                                  after_lafc, after_fgt)
        print(f"PSNR after training: {psnr1:.3f} dB")

        rec = {
            "protocol": f"synthetic pan clip, {args.frames} frames "
                        "432x240, object removal, random-init -> "
                        f"LAFC {args.lafc_steps} + FGT {args.fgt_steps} "
                        "overfit steps",
            "psnr_before_db": round(psnr0, 3),
            "psnr_after_db": round(psnr1, 3),
            "improved": bool(psnr1 > psnr0),
            "lafc_loss_curve": lafc_losses,
            "fgt_l1_curve": fgt_l1s,
        }
        path = os.path.join(REPO, "OVERFIT_GATE.json")
        merged = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    merged = json.load(f)
            except (OSError, ValueError):
                merged = {}
        merged.update(rec)          # top-level keys: the full-recipe gate
        with open(path, "w") as f:
            json.dump(merged, f, indent=2)
        print(json.dumps(rec))
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
