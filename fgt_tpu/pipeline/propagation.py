"""Flow-guided gradient propagation (flowNN) — vectorized numpy.

Behavioral contract from the reference ``tool/get_flowNN_gradient.py:11-534``
and its helpers (``tool/utils/common_utils.py:149-256``):

1. **Forward pass** (frames 1..N-1): every hole pixel follows the backward
   flow to frame t-1; if the landing point is (a) known -> it becomes the
   pixel's backward flow neighbor (BN), or (b) an already-chained hole ->
   the chain is extended with a sub-pixel refinement vector. A
   backward/forward cycle-consistency check gates both cases, and the
   per-pixel consistency error is the running max along the chain.
2. **Backward pass** (frames N-2..0): symmetric, along forward flows (FN).
3. **Interpolation**: gradients are bilinearly sampled at the chain
   endpoints, in source-frame order so transitively filled values can feed
   later frames (the reference samples from the evolving array).
4. **Fusion**: BN/FN candidates are blended with weights
   ``exp(-consistency/alpha)``; pixels with no candidate are returned as the
   still-unfilled mask for the FGT hallucination stage.

State is kept dense ([H, W, N] arrays) instead of the reference's sparse
pixel table — same math, fully vectorized.
"""

from __future__ import annotations

import dataclasses

import cv2
import numpy as np


def interp(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Bilinear sampling of ``img [H, W(, C)]`` at float coords, zero outside
    (cv2.remap INTER_LINEAR semantics; reference common_utils.py:149-172
    including the 1024-column reshape to bypass cv2's SHRT_MAX limit)."""
    x = np.asarray(x, dtype=np.float32).reshape(1, -1)
    y = np.asarray(y, dtype=np.float32).reshape(1, -1)
    num = x.shape[1]
    cols = num // 1024 + 1
    pad = cols * 1024 - num
    map_x = np.concatenate((x, np.zeros((1, pad), np.float32)), axis=1).reshape(1024, cols)
    map_y = np.concatenate((y, np.zeros((1, pad), np.float32)), axis=1).reshape(1024, cols)
    out = cv2.remap(img.astype(np.float32), map_x, map_y, cv2.INTER_LINEAR)
    if img.ndim == 2:
        return out.reshape(-1)[:num]
    return out.reshape(-1, img.shape[2])[:num]


def consist_check(flow_f: np.ndarray, flow_b: np.ndarray):
    """Dense fwd/bwd cycle error (reference common_utils.py:234-256).

    Returns (|err| map, (u, v) error components), both [H, W]."""
    H, W = flow_f.shape[:2]
    fy, fx = np.mgrid[0:H, 0:W].astype(np.float32)
    fxx = fx + flow_b[:, :, 0]
    fyy = fy + flow_b[:, :, 1]
    u = fxx + cv2.remap(flow_f[:, :, 0], fxx, fyy, cv2.INTER_LINEAR) - fx
    v = fyy + cv2.remap(flow_f[:, :, 1], fxx, fyy, cv2.INTER_LINEAR) - fy
    err = np.sqrt(u ** 2 + v ** 2)
    return err, np.stack((u, v), axis=2)


@dataclasses.dataclass
class PropagationConfig:
    consistency_thres: float = 5.0
    alpha: float = 0.1


def _directional_pass(mask, flow_follow, flow_check, n_frames, forward, cfg):
    """One chaining pass. ``forward=True`` walks frames 1..N-1 along backward
    flows (BN); ``forward=False`` walks N-2..0 along forward flows (FN).

    Returns (have [H,W,N] bool, nn_x, nn_y [H,W,N] float, nn_t [H,W,N] int,
    cons [H,W,N] consistency magnitude).
    """
    H, W, N = mask.shape
    have = np.zeros((H, W, N), dtype=bool)
    nn_x = np.zeros((H, W, N), dtype=np.float64)
    nn_y = np.zeros((H, W, N), dtype=np.float64)
    nn_t = np.full((H, W, N), -1, dtype=np.int64)
    cons_u = np.zeros((H, W, N), dtype=np.float64)
    cons_v = np.zeros((H, W, N), dtype=np.float64)

    frames = range(1, N) if forward else range(N - 2, -1, -1)
    ys_grid, xs_grid = np.mgrid[0:H, 0:W]

    for t in frames:
        src_t = t - 1 if forward else t + 1
        flow_idx = t - 1 if forward else t
        f_follow = flow_follow[:, :, :, flow_idx]   # flow from t to src_t
        f_check = flow_check[:, :, :, flow_idx]     # flow from src_t to t

        hole = mask[:, :, t]
        hy, hx = np.nonzero(hole)
        if hy.size == 0:
            continue

        ty = hy + f_follow[hy, hx, 1]
        tx = hx + f_follow[hy, hx, 0]
        tyi = np.round(ty).astype(np.int64)
        txi = np.round(tx).astype(np.int64)

        # cycle consistency: follow back with the opposite flow and compare
        back_u = interp(f_check[:, :, 0], tx, ty)
        back_v = interp(f_check[:, :, 1], tx, ty)
        diff = np.sqrt((ty + back_v - hy) ** 2 + (tx + back_u - hx) ** 2)
        consist = diff < cfg.consistency_thres

        # dense cycle error of the flow pair at frame t's pixels
        _, uv = consist_check(f_check, f_follow)

        # in-bounds (last row/col carry no valid gradient -> strict bounds,
        # reference get_flowNN_gradient.py:115-119)
        valid = (tyi >= 0) & (tyi < H - 1) & (txi >= 0) & (txi < W - 1)
        hy, hx = hy[valid], hx[valid]
        ty, tx, tyi, txi = ty[valid], tx[valid], tyi[valid], txi[valid]
        consist = consist[valid]

        known = mask[tyi, txi, src_t] == 0

        # case 1: direct known neighbor
        sel = known & consist
        have[hy[sel], hx[sel], t] = True
        nn_x[hy[sel], hx[sel], t] = tx[sel]
        nn_y[hy[sel], hx[sel], t] = ty[sel]
        nn_t[hy[sel], hx[sel], t] = src_t
        cons_u[hy[sel], hx[sel], t] = np.abs(uv[hy[sel], hx[sel], 0])
        cons_v[hy[sel], hx[sel], t] = np.abs(uv[hy[sel], hx[sel], 1])

        # case 2: transitive chain through an already-resolved hole pixel
        chained = have[tyi, txi, src_t]
        sel2 = (~known) & chained & consist
        ref_y = ty - tyi  # sub-pixel refinement
        ref_x = tx - txi
        cy = nn_y[tyi, txi, src_t] + ref_y
        cx = nn_x[tyi, txi, src_t] + ref_x
        cyi = np.round(cy).astype(np.int64)
        cxi = np.round(cx).astype(np.int64)
        in_b = (cyi >= 0) & (cyi < H - 1) & (cxi >= 0) & (cxi < W - 1)
        sel2 = sel2 & in_b
        have[hy[sel2], hx[sel2], t] = True
        nn_x[hy[sel2], hx[sel2], t] = cx[sel2]
        nn_y[hy[sel2], hx[sel2], t] = cy[sel2]
        nn_t[hy[sel2], hx[sel2], t] = nn_t[tyi[sel2], txi[sel2], src_t]
        cons_u[hy[sel2], hx[sel2], t] = np.maximum(
            np.abs(uv[hy[sel2], hx[sel2], 0]),
            np.abs(cons_u[tyi[sel2], txi[sel2], src_t]))
        cons_v[hy[sel2], hx[sel2], t] = np.maximum(
            np.abs(uv[hy[sel2], hx[sel2], 1]),
            np.abs(cons_v[tyi[sel2], txi[sel2], src_t]))

    cons = np.sqrt(cons_u ** 2 + cons_v ** 2)
    return have, nn_x, nn_y, nn_t, cons


def _sample_chains(gradient, have, nn_x, nn_y, nn_t, mask, forward):
    """Fill hole-pixel gradients from chain endpoints, iterating source
    frames in chain direction so transitively filled values are available
    (reference get_flowNN_gradient.py:372-435)."""
    H, W, C, N = gradient.shape
    out = gradient.copy()
    frames = range(N) if forward else range(N - 1, -1, -1)
    for s in frames:
        sel = have & (nn_t == s)
        ys, xs, ts = np.nonzero(sel)
        if ys.size == 0:
            continue
        vals = interp(out[:, :, :, s], nn_x[ys, xs, ts], nn_y[ys, xs, ts])
        out[ys, xs, :, ts] = vals
    return out


def get_flownn_gradient(cfg: PropagationConfig,
                        gradient_x: np.ndarray, gradient_y: np.ndarray,
                        mask: np.ndarray, mask_gradient: np.ndarray,
                        video_flow_f: np.ndarray, video_flow_b: np.ndarray):
    """Main entry. Shapes follow the reference:

    gradient_x/y: [H, W, 3, N]; mask, mask_gradient: [H, W, N] bool;
    video_flow_f/b: [H, W, 2, N-1].

    Returns (gradient_x, gradient_y, mask_tofill).

    A lax.scan device implementation of the directional chaining exists
    (propagation_tpu, parity-tested) but measured 20x SLOWER than this
    vectorized numpy pass at 432x240 (per-frame scalar gathers + state
    fetches dominate on TPU), so the host path stays the default. Set
    ``FGT_PROP_DEVICE=1`` to use it anyway (e.g. to keep the host free).
    """
    import os

    H, W, N = mask.shape

    dir_pass = _directional_pass
    if os.environ.get("FGT_PROP_DEVICE"):
        from fgt_tpu.pipeline.propagation_tpu import directional_pass_tpu
        dir_pass = directional_pass_tpu

    # pass 1: BN chains via backward flows
    have_bn, bx, by, bt, cons_bn = dir_pass(
        mask, video_flow_b, video_flow_f, N, forward=True, cfg=cfg)
    # pass 2: FN chains via forward flows
    have_fn, fx, fy, ft, cons_fn = dir_pass(
        mask, video_flow_f, video_flow_b, N, forward=False, cfg=cfg)

    gx_bn = _sample_chains(gradient_x, have_bn, bx, by, bt, mask, forward=True)
    gy_bn = _sample_chains(gradient_y, have_bn, bx, by, bt, mask, forward=True)
    gx_fn = _sample_chains(gradient_x, have_fn, fx, fy, ft, mask, forward=False)
    gy_fn = _sample_chains(gradient_y, have_fn, fx, fy, ft, mask, forward=False)

    gradient_x = gradient_x.copy()
    gradient_y = gradient_y.copy()
    mask_tofill = np.zeros((H, W, N), dtype=bool)

    for t in range(N):
        have = np.stack([have_bn[:, :, t], have_fn[:, :, t]], axis=2)
        any_nn = have.any(axis=2)
        w = np.exp(-np.stack([cons_bn[:, :, t], cons_fn[:, :, t]], axis=2)
                   / cfg.alpha)
        w = w * have
        wsum = w.sum(axis=2, keepdims=True)
        # numerical fallback: uniform over available candidates
        fallback = have / np.maximum(have.sum(axis=2, keepdims=True), 1)
        weights = np.where(wsum > 0, w / np.maximum(wsum, 1e-30), fallback)

        for grad, cand0, cand1 in ((gradient_x, gx_bn, gx_fn),
                                   (gradient_y, gy_bn, gy_fn)):
            fused = (cand0[:, :, :, t] * weights[:, :, 0:1]
                     + cand1[:, :, :, t] * weights[:, :, 1:2])
            grad[:, :, :, t] = np.where(any_nn[:, :, None], fused,
                                        grad[:, :, :, t])
        mask_tofill[:, :, t] = (~any_nn) & mask[:, :, t]

    return gradient_x, gradient_y, mask_tofill
