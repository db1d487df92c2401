"""In-training validation on a DAVIS-style tree
(reference FGT/networks/network.py:258-354, LAFC/networks/network.py:271-373).

Protocol: first ``num_videos`` videos, a window of ``num_frames`` around
pivot frame 20 plus dilated reference frames, masks from ``mask_root`` (or
a centered square when absent), diffusion-filled flows, PSNR/SSIM/L1/L2 on
uint8 composites.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import cv2
import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import numpy as np

from fgt_tpu.core import metrics as metrics_mod
from fgt_tpu.core.flow_io import read_flow
from fgt_tpu.core.masks import rect_mask
from fgt_tpu.data.datasets import diffusion_fill, flow_tf
from fgt_tpu.train.fgt_step import norm_flows_nhwc


def _ref_index(neighbor_ids, length, ref_length):
    refs = []
    for i in range(0, length, ref_length):
        if i not in neighbor_ids:
            refs.append(i)
    return refs


def _read_window_frames(frame_dir, width, height, ids):
    out = []
    for i in ids:
        for ext in ("jpg", "png"):
            p = os.path.join(frame_dir, f"{i:05d}.{ext}")
            if os.path.exists(p):
                f = imageio.imread(p)
                out.append(cv2.resize(f[..., :3], (width, height)))
                break
        else:
            return []
    return out


def validate_fgt(gen, g_params, frame_root: str, flow_root: Optional[str],
                 flow_params=None, flow_model=None, mask_root: Optional[str]
                 = None, num_videos: int = 10, resolution=(240, 432),
                 mask_size: int = 96, pivot: int = 20, num_frames: int = 5,
                 ref_length: int = 20, save_dir: Optional[str] = None
                 ) -> dict:
    """With ``save_dir``, per-video side-by-side canvases
    (result | GT | masked input), one row per validation frame, are
    written next to the scalars (reference FGT/networks/network.py:470-491
    dumps the same triple)."""
    height, width = resolution
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    videos = sorted(os.listdir(frame_root))[:num_videos]
    apply_fn = jax.jit(lambda p, fr, fl, m: gen.apply(p, fr, fl, m))
    flow_fn = None
    if flow_model is not None and flow_params is not None:
        flow_fn = jax.jit(lambda p, f, m: flow_model.apply(p, f, m))

    psnrs, ssims, l1s, l2s = [], [], [], []
    for video in videos:
        frame_dir = os.path.join(frame_root, video)
        n = len(glob.glob(os.path.join(frame_dir, "*.jpg"))) or \
            len(glob.glob(os.path.join(frame_dir, "*.png")))
        if n == 0:
            continue
        piv = min(pivot, n - 1)
        neighbor_ids = list(range(max(0, piv - num_frames // 2),
                                  min(n, piv + num_frames // 2)))
        ids = _ref_index(neighbor_ids, n, ref_length) + neighbor_ids
        frames = _read_window_frames(frame_dir, width, height, ids)
        if not frames:
            continue

        masks = []
        for i in ids:
            m = None
            if mask_root:
                p = os.path.join(mask_root, video, f"{i:05d}.png")
                if os.path.exists(p):
                    m = (imageio.imread(p) > 127).astype(np.uint8)
                    if m.ndim == 3:
                        m = m[..., 0]
                    m = cv2.resize(m, (width, height),
                                   interpolation=cv2.INTER_NEAREST)
            if m is None:
                m = rect_mask(height, width, size=mask_size)
            masks.append(m)

        flows = []
        for i in ids:
            f = None
            if flow_root:
                p = os.path.join(flow_root, video, "forward_flo",
                                 f"{min(i, n - 2):05d}.flo")
                if os.path.exists(p):
                    f = flow_tf(read_flow(p), height, width)
            if f is None:
                f = np.zeros((height, width, 2), np.float32)
            flows.append(diffusion_fill(f, masks[len(flows)]))

        frames_np = np.stack(frames).astype(np.float32) / 127.5 - 1
        masks_np = np.stack(masks).astype(np.float32)[..., None]
        flows_np = np.stack(flows).astype(np.float32)

        if flow_fn is not None:
            out = flow_fn(flow_params, jnp.asarray(flows_np),
                          jnp.asarray(masks_np))
            flows_np = np.asarray(out[0] if isinstance(out, tuple) else out)
        flows_j = norm_flows_nhwc(jnp.asarray(flows_np)[None])
        frames_j = jnp.asarray(frames_np)[None]
        masks_j = jnp.asarray(masks_np)[None]
        filled = np.asarray(apply_fn(g_params, frames_j * (1 - masks_j),
                                     flows_j, masks_j))[0]
        comp = filled * masks_np + frames_np * (1 - masks_np)

        gt_u8 = ((frames_np + 1) * 127.5).clip(0, 255).astype(np.uint8)
        comp_u8 = ((comp + 1) * 127.5).clip(0, 255).astype(np.uint8)
        for t in range(gt_u8.shape[0]):
            psnrs.append(metrics_mod.psnr(comp_u8[t], gt_u8[t]))
            ssims.append(metrics_mod.ssim(comp_u8[t], gt_u8[t]))
            l1s.append(np.abs(comp_u8[t].astype(np.float64)
                              - gt_u8[t].astype(np.float64)).mean())
            l2s.append(((comp_u8[t].astype(np.float64)
                         - gt_u8[t].astype(np.float64)) ** 2).mean())
        if save_dir:
            masked_u8 = ((frames_np * (1 - masks_np) + 1) * 127.5)\
                .clip(0, 255).astype(np.uint8)
            rows = [np.concatenate([comp_u8[t], gt_u8[t], masked_u8[t]],
                                   axis=1) for t in range(gt_u8.shape[0])]
            imageio.imwrite(os.path.join(save_dir, f"{video}.png"),
                            np.concatenate(rows, axis=0))
    if not psnrs:
        return {}
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            "l1": float(np.mean(l1s)), "l2": float(np.mean(l2s))}


def validate_lafc(model, params, flow_root: str, num_videos: int = 10,
                  resolution=(240, 432), mask_size: int = 96,
                  num_flows: int = 3, interval: int = 3,
                  single: bool = False, save_dir: Optional[str] = None
                  ) -> dict:
    """Flow-domain validation (reference LAFC/networks/network.py:271-373):
    first videos' forward+backward flows, centered square masks, diffusion
    fill, completion, PSNR/SSIM on flow->RGB + L1/L2 on raw flows.

    With ``save_dir``, a flow triptych (completed | GT | diffused input)
    per video/direction is written as flow->RGB PNGs (reference
    LAFC/networks/network.py:481-513)."""
    from fgt_tpu.core.flow_viz import flow_to_rgb
    from fgt_tpu.core.metrics import calculate_flow_metrics
    from fgt_tpu.pipeline.video_inpainting import indices_gen

    height, width = resolution
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    apply_fn = jax.jit(lambda p, f, m: model.apply(p, f, m))
    videos = sorted(os.listdir(flow_root))[:num_videos]
    agg = {"psnr": [], "ssim": [], "l1": [], "l2": []}
    for video in videos:
        for direction in ("forward_flo", "backward_flo"):
            d = os.path.join(flow_root, video, direction)
            if not os.path.isdir(d):
                continue
            files = sorted(glob.glob(os.path.join(d, "*.flo")))
            if len(files) <= num_flows:
                continue
            pivot = min(20, len(files) - 1)
            ids = indices_gen(pivot, interval, num_flows, len(files))
            mask = rect_mask(height, width, size=mask_size).astype(
                np.float32)[..., None]
            flows, diffused = [], []
            for i in ids:
                f = flow_tf(read_flow(files[i]), height, width)
                flows.append(f)
                diffused.append(diffusion_fill(f, mask[..., 0]))
            gt = np.stack(flows).astype(np.float32)
            din = np.stack(diffused).astype(np.float32)
            masks = np.repeat(mask[None], len(ids), 0)
            if single:
                out = apply_fn(params, jnp.asarray(din[num_flows // 2][None]),
                               jnp.asarray(masks[num_flows // 2][None]))
            else:
                out = apply_fn(params, jnp.asarray(din[None]),
                               jnp.asarray(masks[None]))
            out = out[0] if isinstance(out, tuple) else out
            filled = np.asarray(out)
            filled = filled.reshape(-1, height, width, 2)
            target = gt[num_flows // 2][None]
            comp = (filled * mask + target * (1 - mask))
            m = calculate_flow_metrics(comp, target)
            for k in agg:
                agg[k].append(m[k])
            if save_dir:
                trip = np.concatenate(
                    [flow_to_rgb(comp[0]), flow_to_rgb(target[0]),
                     flow_to_rgb(din[num_flows // 2])], axis=1)
                imageio.imwrite(
                    os.path.join(save_dir, f"{video}_{direction}.png"),
                    (trip * 255).clip(0, 255).astype(np.uint8))
    if not agg["psnr"]:
        return {}
    return {k: float(np.mean(v)) for k, v in agg.items()}
