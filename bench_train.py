"""Training throughput + correctness benchmark on the attached device.

Drives the REAL jitted train steps (fgt_tpu/train/{lafc_step,fgt_step})
at reference-scale model dims — LAFC 3-flow 240x432 (LAFC/config/
train.yaml:34-52), FGT GAN 8-block/512-hidden/mlp-40 5-frame 240x432
(FGT/config/train.yaml:34-85) — on a fixed synthetic batch:

  * steps/s over a timed run of dispatch-chained steps (no per-step host
    sync, like a real training loop between log points),
  * MFU via XLA cost analysis of the compiled step,
  * loss trajectory (fixed batch -> must decrease: proof the step learns),
  * checkpoint -> restore -> continue, asserting the resumed loss
    trajectory matches the uninterrupted one.

Prints ONE JSON line per model (like bench.py) and writes BENCH_TRAIN.json.

Run: python bench_train.py [--model both|lafc|fgt] [--steps 50]
     [--batch N] [--bf16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("FGT_COSTS", "1")

import numpy as np


def synth_lafc_batch(b: int, h: int, w: int, t: int = 3, seed: int = 0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    flows = np.stack([
        np.stack([np.sin(yy / 37.0 + i) * 8 + xx / w * 3,
                  np.cos(xx / 29.0 - i) * 8 + yy / h * 3], -1)
        for i in range(t)], 0)[None].repeat(b, 0).astype(np.float32)
    masks = np.zeros((b, t, h, w, 1), np.float32)
    masks[:, :, h // 3: h // 3 + 72, w // 3: w // 3 + 96] = 1.0
    diffused = flows * (1 - masks) + rng.randn(*flows.shape).astype(
        np.float32) * masks
    edges = (rng.rand(b, h, w, 1) > 0.95).astype(np.float32)
    cur = rng.rand(b, h, w, 3).astype(np.float32)
    shift = np.roll(cur, 4, axis=2)
    return {"flows": flows, "diffused_flows": diffused, "masks": masks,
            "edges": edges, "current_frame": cur, "shift_frame": shift}


def synth_fgt_batch(b: int, t: int, h: int, w: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    base = rng.rand(1, 1, h, w, 3).astype(np.float32)
    frames = np.broadcast_to(base, (b, t, h, w, 3)).copy() * 2 - 1
    frames += rng.randn(b, t, h, w, 3).astype(np.float32) * 0.05
    masks = np.zeros((b, t, h, w, 1), np.float32)
    masks[:, :, h // 3: h // 3 + 72, w // 3: w // 3 + 96] = 1.0
    flows = rng.randn(b, t, h, w, 2).astype(np.float32)
    return {"frames": frames.astype(np.float32), "masks": masks,
            "flows": flows}


def _mfu(stage: str, steps: int, wall: float):
    """Per-step MFU from the cost ledger: the timed loop ran ``steps``
    calls in ``wall`` seconds; the ledger also counted the compile call
    and the resume checks, so normalize by its own call tally."""
    from fgt_tpu.utils.costs import LEDGER, device_peak

    row = LEDGER.stages.get(stage, {})
    flops = row.get("flops", 0.0)
    calls = row.get("calls", 0) or 1
    per_step = flops / calls
    tfps = per_step * steps / max(wall, 1e-9) / 1e12
    peak_fl, _ = device_peak()
    mfu = (tfps * 1e12 / peak_fl) if peak_fl else 0.0
    return mfu, tfps


def run_lafc(args, timer, results):
    import jax
    import jax.numpy as jnp

    from fgt_tpu.models.registry import build_model
    from fgt_tpu.pipeline.video_inpainting import DEFAULT_LAFC_CONFIG
    from fgt_tpu.train.lafc_step import (LAFCLossWeights,
                                         make_lafc_train_step)
    from fgt_tpu.train.schedules import make_adam, warmup_step_decay
    from fgt_tpu.utils import checkpoint as ckpt
    from fgt_tpu.utils.costs import LEDGER, costed

    h, w = args.imgH, args.imgW
    cfg = dict(DEFAULT_LAFC_CONFIG)
    cfg["use_edges"] = 1
    model = build_model("lafc", cfg)
    rng = jax.random.PRNGKey(0)
    t = cfg["num_flows"]
    params = jax.jit(model.init)(rng, jnp.zeros((1, t, h, w, 2)),
                                 jnp.zeros((1, t, h, w, 1)))
    sched = warmup_step_decay(1e-4, decay_interval=120_000, gamma=0.1)
    tx = make_adam(sched)
    import jax.numpy as _jnp
    step = costed(make_lafc_train_step(
        model.apply, tx, LAFCLossWeights(),
        compute_dtype=_jnp.bfloat16 if args.bf16 else None), "lafc_step")
    opt_state = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in
             synth_lafc_batch(args.batch or 4, h, w, t).items()}

    with timer.stage("lafc_train"):
        params, opt_state, m = step(params, opt_state, batch)  # compile
        jax.block_until_ready(m)
        loss0 = float(m["loss"])
        losses = [loss0]
        t0 = time.perf_counter()
        for i in range(args.steps):
            params, opt_state, m = step(params, opt_state, batch)
            if (i + 1) % 10 == 0:
                losses.append(float(m["loss"]))
        jax.block_until_ready(m)
        wall = time.perf_counter() - t0

    # checkpoint -> continue vs restore -> continue
    path = "/tmp/bench_train_lafc.msgpack"
    host_state = {"params": jax.device_get(params),
                  "opt": jax.device_get(opt_state)}  # before donation
    ckpt.save_pytree(host_state, path)
    cont, p2, o2 = [], params, opt_state
    for _ in range(3):
        p2, o2, m = step(p2, o2, batch)   # donates p2/o2 buffers
        cont.append(float(m["loss"]))
    st = ckpt.load_pytree(host_state, path)
    p3, o3, res = st["params"], st["opt"], []
    for _ in range(3):
        p3, o3, m = step(p3, o3, batch)
        res.append(float(m["loss"]))
    resume_ok = bool(np.allclose(cont, res, rtol=1e-4, atol=1e-6))

    sps = args.steps / wall
    mfu, tfps = _mfu("lafc_train", args.steps, wall)
    rec = {"metric": "lafc_train_steps_per_sec_240x432_b%d%s"
                     % (args.batch or 4, "_bf16" if args.bf16 else ""),
           "value": round(sps, 3), "unit": "steps/s",
           "vs_baseline": 0.0,
           "mfu": round(mfu, 4),
           "tflops_per_s": round(tfps, 2),
           "loss_first": round(loss0, 4),
           "loss_last": round(losses[-1], 4),
           "loss_decreased": bool(losses[-1] < loss0),
           "resume_trajectory_matches": resume_ok,
           "losses_every10": [round(x, 4) for x in losses]}
    print(json.dumps(rec))
    results["lafc" + ("_bf16" if args.bf16 else "")] = rec


def run_fgt(args, timer, results):
    import jax
    import jax.numpy as jnp

    from fgt_tpu.models.discriminator import TemporalPatchGAN
    from fgt_tpu.models.registry import build_model
    from fgt_tpu.pipeline.video_inpainting import DEFAULT_FGT_CONFIG
    from fgt_tpu.train.fgt_step import (FGTLossWeights, GANTrainState,
                                        make_fgt_train_step)
    from fgt_tpu.train.schedules import make_adam, warmup_step_decay
    from fgt_tpu.utils import checkpoint as ckpt
    from fgt_tpu.utils.costs import LEDGER, costed

    h, w = args.imgH, args.imgW
    t = 5
    b = args.batch or 2     # reference: batch 2/GPU (train.yaml:34-45)
    cfg = dict(DEFAULT_FGT_CONFIG)
    cfg["res_h"], cfg["res_w"] = h, w
    if args.flash:
        cfg["use_flash"] = 1
    else:
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

    step = costed(make_fgt_train_step(
        g_apply, d_apply, None, g_tx, d_tx, FGTLossWeights(),
        compute_dtype=jnp.bfloat16 if args.bf16 else None), "fgt_step")
    state = GANTrainState(
        g_params=g_params, d_params=d_vars["params"],
        d_spectral=d_vars["spectral"], g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_vars["params"]), step=jnp.zeros((), jnp.int32))
    batch = {k: jnp.asarray(v) for k, v in
             synth_fgt_batch(b, t, h, w).items()}

    with timer.stage("fgt_train"):
        state, m = step(state, batch, None)       # compile
        jax.block_until_ready(m)
        l1_0 = float(m["l1_masked"]) + float(m["l1_valid"])
        l1s = [l1_0]
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, m = step(state, batch, None)
            if (i + 1) % 10 == 0:
                l1s.append(float(m["l1_masked"]) + float(m["l1_valid"]))
        jax.block_until_ready(m)
        wall = time.perf_counter() - t0

    path = "/tmp/bench_train_fgt.msgpack"
    host_state = jax.device_get(state)   # before donation invalidates it
    ckpt.save_pytree(host_state, path)
    cont, s2 = [], state
    for _ in range(3):
        s2, m = step(s2, batch, None)    # donates s2 buffers
        cont.append(float(m["gen_loss"]))
    s3 = ckpt.load_pytree(host_state, path)
    res = []
    for _ in range(3):
        s3, m = step(s3, batch, None)
        res.append(float(m["gen_loss"]))
    resume_ok = bool(np.allclose(cont, res, rtol=1e-4, atol=1e-6))

    sps = args.steps / wall
    mfu, tfps = _mfu("fgt_train", args.steps, wall)
    variant = ("_bf16" if args.bf16 else "") + \
        ("_flash" if args.flash else "")
    rec = {"metric": f"fgt_gan_train_steps_per_sec_{h}x{w}_b{b}{variant}",
           "value": round(sps, 3), "unit": "steps/s",
           "vs_baseline": 0.0,
           "mfu": round(mfu, 4),
           "tflops_per_s": round(tfps, 2),
           "l1_first": round(l1_0, 4), "l1_last": round(l1s[-1], 4),
           "l1_decreased": bool(l1s[-1] < l1_0),
           "resume_trajectory_matches": resume_ok,
           "l1_every10": [round(x, 4) for x in l1s]}
    print(json.dumps(rec))
    results["fgt" + variant] = rec


def _sn_sigmas(d_params, d_spectral):
    """Estimated spectral norm per SN conv: sigma = u^T W v from the
    power-iteration buffers (torch.nn.utils.spectral_norm's estimate).
    Walks the spectral collection; params share the module paths."""
    import jax

    sig = {}
    spec_flat = jax.tree_util.tree_flatten_with_path(d_spectral)[0]
    by_mod: dict = {}
    for path, leaf in spec_flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        by_mod.setdefault(keys[:-1], {})[keys[-1]] = np.asarray(leaf)
    for mod, uv in by_mod.items():
        if "u" not in uv or "v" not in uv:
            continue
        node = d_params
        try:
            for k in mod:
                node = node[k]
            kernel = np.asarray(node["kernel"], np.float64)
        except (KeyError, TypeError):
            continue
        out = kernel.shape[-1]
        mat = kernel.reshape(-1, out).T  # (out, rest)
        sig["/".join(mod)] = float(uv["u"] @ (mat @ uv["v"]))
    return sig


def run_fgt_sustained(args, timer, results):
    """Sustained reference-scale FGT GAN training (VERDICT r3 #4): N
    steps of alternating D/G updates at the reference dims
    (FGT/config/train.yaml:34-85, hot loop FGT/networks/network.py:86-182),
    cycling a pool of distinct synthetic batches so the adversarial
    dynamics are real (not single-batch overfit). Logs G/D losses, the
    discriminator's spectral-norm sigma estimates, and the LR schedule;
    does one mid-run checkpoint->restore and asserts the resumed
    trajectory matches the uninterrupted one exactly."""
    import jax
    import jax.numpy as jnp

    from fgt_tpu.models.discriminator import TemporalPatchGAN
    from fgt_tpu.models.registry import build_model
    from fgt_tpu.pipeline.video_inpainting import DEFAULT_FGT_CONFIG
    from fgt_tpu.train.fgt_step import (FGTLossWeights, GANTrainState,
                                        make_fgt_train_step)
    from fgt_tpu.train.schedules import make_adam, warmup_step_decay
    from fgt_tpu.utils import checkpoint as ckpt
    from fgt_tpu.utils.costs import costed

    h, w = args.imgH, args.imgW
    t = 5
    b = args.batch or 2     # reference: batch 2/GPU (train.yaml:34-45)
    n_steps = args.sustained
    log_every = max(1, args.log_every)
    cfg = dict(DEFAULT_FGT_CONFIG)
    cfg["res_h"], cfg["res_w"] = h, w
    cfg["use_flash"] = 1 if args.flash else 0
    gen = build_model("model", cfg)
    disc = TemporalPatchGAN(in_channels=3, dist_cnum=32)
    rng = jax.random.PRNGKey(0)
    g_params = jax.jit(gen.init)(rng, jnp.zeros((1, t, h, w, 3)),
                                 jnp.zeros((1, t, h, w, 2)),
                                 jnp.zeros((1, t, h, w, 1)))
    d_vars = jax.jit(disc.init)(jax.random.fold_in(rng, 1),
                                jnp.zeros((1, t, h, w, 3)))

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

    step = costed(make_fgt_train_step(
        g_apply, d_apply, None, g_tx, d_tx, FGTLossWeights(),
        compute_dtype=jnp.bfloat16 if args.bf16 else None), "fgt_sustained")
    state = GANTrainState(
        g_params=g_params, d_params=d_vars["params"],
        d_spectral=d_vars["spectral"], g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_vars["params"]), step=jnp.zeros((), jnp.int32))

    pool = [{k: jnp.asarray(v) for k, v in
             synth_fgt_batch(b, t, h, w, seed=s).items()}
            for s in range(args.pool)]

    curves: dict = {"step": [], "gen_loss": [], "dis_loss": [],
                    "dis_real": [], "dis_fake": [], "adv": [],
                    "l1_masked": [], "lr": []}
    sigma_snapshots: dict = {}
    resume_ok = None
    ckpt_path = "/tmp/bench_train_fgt_sustained.msgpack"
    mid = n_steps // 2

    with timer.stage("fgt_sustained"):
        state, m = step(state, pool[0], None)       # compile
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        i = 0
        while i < n_steps:
            state, m = step(state, pool[i % len(pool)], None)
            i += 1
            if i % log_every == 0 or i == n_steps:
                _log_point(curves, i, m, sched)
            if i == mid:
                # mid-run checkpoint; continue 3 steps; restore + replay the
                # same 3 steps on the restored copy; assert identical. The
                # continued branch IS the main trajectory (steps mid+1..+3).
                host_state = jax.device_get(state)
                ckpt.save_pytree(host_state, ckpt_path)
                sigma_snapshots["mid"] = _sn_sigmas(
                    host_state.d_params, host_state.d_spectral)
                cont = []
                for j in range(3):
                    state, m = step(state, pool[(i + j) % len(pool)], None)
                    cont.append(float(m["gen_loss"]))
                s3 = ckpt.load_pytree(host_state, ckpt_path)
                res = []
                for j in range(3):
                    s3, mc = step(s3, pool[(i + j) % len(pool)], None)
                    res.append(float(mc["gen_loss"]))
                resume_ok = bool(np.allclose(cont, res, rtol=1e-4,
                                             atol=1e-6))
                i += 3
        jax.block_until_ready(m)
        wall = time.perf_counter() - t0

    host_state = jax.device_get(state)
    sigma_snapshots["end"] = _sn_sigmas(host_state.d_params,
                                        host_state.d_spectral)
    n_exec = n_steps + 3        # + the restored-replay probe steps
    mfu, tfps = _mfu("fgt_sustained", n_exec, wall)
    d = curves["dis_loss"]
    half = len(d) // 2
    sig_end = sigma_snapshots["end"]
    # D collapse would show as dis_loss pinned near 0 (D wins; hinge
    # saturates) or diverging; healthy alternating GAN keeps it bounded.
    # SN sigma should hover near 1 (power iteration tracking the top
    # singular value of the normalized kernel).
    no_collapse = (min(d[half:]) > 0.02 and max(d[half:]) < 2.5
                   and max(sig_end.values(), default=1.0) < 4.0)
    variant = ("_bf16" if args.bf16 else "") + \
        ("_flash" if args.flash else "")
    rec = {"metric": f"fgt_gan_sustained_{n_steps}steps_{h}x{w}_b{b}"
                     f"{variant}",
           "value": round((n_steps + 6) / wall, 3), "unit": "steps/s",
           "vs_baseline": 0.0,
           "steps": n_steps, "wall_s": round(wall, 1),
           "mfu": round(mfu, 4), "tflops_per_s": round(tfps, 2),
           "batch_pool": args.pool,
           "resume_trajectory_matches": resume_ok,
           "no_d_collapse": bool(no_collapse),
           "dis_loss_last_half_min": round(min(d[half:]), 4),
           "dis_loss_last_half_max": round(max(d[half:]), 4),
           "sn_sigma_mid": {k: round(v, 4)
                            for k, v in sigma_snapshots["mid"].items()},
           "sn_sigma_end": {k: round(v, 4) for k, v in sig_end.items()},
           "curves": curves}
    print(json.dumps({k: v for k, v in rec.items() if k != "curves"}))
    results["fgt_sustained" + variant] = rec


def _log_point(curves, step_idx, m, sched):
    # sigma snapshots are taken from the mid/end host copies only (a
    # per-point device_get of the full D tree would stall the pipeline)
    curves["step"].append(step_idx)
    for k in ("gen_loss", "dis_loss", "dis_real", "dis_fake", "adv",
              "l1_masked"):
        curves[k].append(round(float(m[k]), 5))
    curves["lr"].append(float(sched(step_idx)))


def main():

    from fgt_tpu.utils.relay import honor_cpu_request

    honor_cpu_request()   # JAX_PLATFORMS=cpu beats the axon sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["both", "lafc", "fgt"],
                    default="both")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--imgH", type=int, default=240)
    ap.add_argument("--imgW", type=int, default=432)
    ap.add_argument("--flash", action="store_true",
                    help="use the Pallas flash-attention custom-VJP path "
                         "in the FGT train step")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed precision: model fwd/bwd in bfloat16, "
                         "params/optimizer/losses in f32")
    ap.add_argument("--sustained", type=int, default=0, metavar="N",
                    help="run N sustained FGT GAN steps over a batch pool "
                         "with loss/sigma/lr curves + mid-run resume check "
                         "(overrides --model)")
    ap.add_argument("--pool", type=int, default=8,
                    help="distinct synthetic batches cycled in --sustained")
    ap.add_argument("--log_every", type=int, default=25)
    args = ap.parse_args()

    from fgt_tpu.utils.relay import on_axon, wait_for_relay

    if on_axon() and not wait_for_relay(
            float(os.environ.get("FGT_RELAY_WAIT", "1800"))):
        print(json.dumps({"metric": "train_steps_per_sec", "value": 0.0,
                          "unit": "steps/s", "vs_baseline": 0.0,
                          "error": "axon relay down; bench not run"}))
        sys.exit(1)

    from fgt_tpu.utils.compile_cache import enable_compilation_cache
    from fgt_tpu.utils.hostmem import retain_heap
    from fgt_tpu.utils.logging_utils import StageTimer

    enable_compilation_cache()
    retain_heap()
    timer = StageTimer()
    results: dict = {}
    if args.sustained:
        run_fgt_sustained(args, timer, results)
    else:
        if args.model in ("both", "lafc"):
            run_lafc(args, timer, results)
        if args.model in ("both", "fgt"):
            run_fgt(args, timer, results)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_TRAIN.json")
    # merge with prior runs so f32/bf16/flash variants coexist in the record
    merged: dict = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)


if __name__ == "__main__":
    main()
