"""Offline RAFT flow extraction over a dataset tree.

Capability parity with the reference ``tool/flow_extract.py:55-192``: for
every video directory under ``--datapath``, compute forward and backward
flows between consecutive (resized) frames and write them as
``<outroot>/<video>/forward_flo/NNNNN.flo`` / ``backward_flo/NNNNN.flo``,
printing per-frame timing. Pairs are batched per chunk on TPU.
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import cv2
import imageio
import jax
import jax.numpy as jnp
import numpy as np

from fgt_tpu.core import flow_io
from fgt_tpu.models import raft as raft_mod
from fgt_tpu.utils import checkpoint as ckpt_utils
from fgt_tpu.utils.logging_utils import setup_logger

logger = setup_logger()


def extract_video(raft_fn, raft_vars, frames: np.ndarray, out_dir: str,
                  chunk: int = 4):
    n = frames.shape[0]
    os.makedirs(os.path.join(out_dir, "forward_flo"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "backward_flo"), exist_ok=True)
    for mode, sub in (("forward", "forward_flo"), ("backward", "backward_flo")):
        src = frames[:-1] if mode == "forward" else frames[1:]
        dst = frames[1:] if mode == "forward" else frames[:-1]
        for lo in range(0, n - 1, chunk):
            hi = min(lo + chunk, n - 1)
            a, b = src[lo:hi], dst[lo:hi]
            pad = chunk - (hi - lo)
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, 0)], 0)
                b = np.concatenate([b, np.repeat(b[-1:], pad, 0)], 0)
            out = np.asarray(raft_fn(raft_vars, jnp.asarray(a), jnp.asarray(b)))
            for k in range(hi - lo):
                flow_io.write_flow(out[k],
                                   os.path.join(out_dir, sub, f"{lo+k:05d}.flo"))


def main(argv=None):

    from fgt_tpu.utils.relay import cli_relay_guard

    cli_relay_guard()   # honor cpu requests; fail fast on a dead tunnel
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True, help="root of video dirs")
    p.add_argument("--outroot", required=True)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--raft_model", default="checkpoints/raft/raft.msgpack")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--chunk", type=int, default=4)
    args = p.parse_args(argv)

    model = raft_mod.RAFT(raft_mod.RAFTConfig(iters=args.iters))
    dummy = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, iters=1)
    if os.path.exists(args.raft_model):
        if args.raft_model.endswith((".pth", ".tar")):
            from fgt_tpu.convert.torch2jax import convert_raft_checkpoint

            variables = convert_raft_checkpoint(args.raft_model, variables)
        else:
            variables = ckpt_utils.load_pytree(variables, args.raft_model)
    else:
        logger.warning("RAFT weights missing; using random init")

    @jax.jit
    def raft_fn(v, a, b):
        return model.apply(v, a, b, iters=args.iters, test_mode=True)[1]

    videos = sorted(d for d in os.listdir(args.datapath)
                    if os.path.isdir(os.path.join(args.datapath, d)))
    total_frames, t0 = 0, time.perf_counter()
    for vid in videos:
        files = sorted(glob.glob(os.path.join(args.datapath, vid, "*.jpg"))
                       + glob.glob(os.path.join(args.datapath, vid, "*.png")))
        if len(files) < 2:
            continue
        frames = []
        for fp in files:
            fr = imageio.imread(fp).astype(np.float32)
            if fr.ndim == 2:
                fr = np.stack([fr] * 3, -1)
            frames.append(cv2.resize(fr[..., :3], (args.width, args.height),
                                     interpolation=cv2.INTER_LINEAR))
        frames = np.stack(frames)
        tv = time.perf_counter()
        extract_video(raft_fn, variables, frames,
                      os.path.join(args.outroot, vid), chunk=args.chunk)
        dt = time.perf_counter() - tv
        total_frames += len(files)
        logger.info("%s: %d frames, %.3f s/frame", vid, len(files),
                    dt / len(files))
    dt = time.perf_counter() - t0
    logger.info("done: %d frames in %.1fs (%.3f s/frame)", total_frames, dt,
                dt / max(total_frames, 1))


if __name__ == "__main__":
    main()
