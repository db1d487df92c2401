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
    if img.ndim == 3 and img.shape[2] > 4:
        # cv2.remap interpolates >4-channel images on a different code path
        # (not bit-equal); process 3-channel blocks so stacked gx|gy calls
        # reproduce the separate per-gradient results exactly
        return np.concatenate(
            [interp(img[:, :, i:i + 3], x, y)
             for i in range(0, img.shape[2], 3)], axis=1)
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


def _run_passes(mask, video_flow_f, video_flow_b, cfg):
    """Both directional chaining passes; native OpenMP kernels when built
    (single-call, no dense per-frame remaps), numpy otherwise. Returns
    ((have, nn_x, nn_y, nn_t, cons) for BN, same for FN), [H, W, N] each."""
    import os

    N = mask.shape[2]
    if os.environ.get("FGT_PROP_DEVICE"):
        from fgt_tpu.pipeline.propagation_tpu import directional_pass_tpu
        bn = directional_pass_tpu(mask, video_flow_b, video_flow_f, N,
                                  forward=True, cfg=cfg)
        fn = directional_pass_tpu(mask, video_flow_f, video_flow_b, N,
                                  forward=False, cfg=cfg)
        return bn, fn

    from fgt_tpu import native
    if native.available() and not os.environ.get("FGT_PROP_NUMPY"):
        mask_n = np.ascontiguousarray(mask.transpose(2, 0, 1), np.uint8)
        vf = np.ascontiguousarray(video_flow_f.transpose(3, 0, 1, 2),
                                  np.float32)
        vb = np.ascontiguousarray(video_flow_b.transpose(3, 0, 1, 2),
                                  np.float32)
        out = []
        for follow, check, fwd in ((vb, vf, True), (vf, vb, False)):
            have, nx, ny, nt, cu, cv_ = native.flownn_pass(
                mask_n, follow, check, fwd, cfg.consistency_thres)
            out.append((
                have.transpose(1, 2, 0).astype(bool),
                nx.transpose(1, 2, 0), ny.transpose(1, 2, 0),
                nt.transpose(1, 2, 0),
                np.sqrt(cu * cu + cv_ * cv_).transpose(1, 2, 0)))
        return out[0], out[1]

    bn = _directional_pass(mask, video_flow_b, video_flow_f, N,
                           forward=True, cfg=cfg)
    fn = _directional_pass(mask, video_flow_f, video_flow_b, N,
                           forward=False, cfg=cfg)
    return bn, fn


def _sample(gradient, have, nn_x, nn_y, nn_t, mask, forward):
    """Chain sampling — native bucketed kernel when built, numpy scan
    otherwise. gradient [H, W, C, N] -> filled copy, same layout."""
    import os

    from fgt_tpu import native
    if native.available() and not os.environ.get("FGT_PROP_NUMPY") \
            and not os.environ.get("FGT_PROP_DEVICE"):
        g = np.ascontiguousarray(gradient.transpose(3, 0, 1, 2), np.float32)
        out = native.flownn_sample(
            g, np.ascontiguousarray(have.transpose(2, 0, 1), np.uint8),
            np.ascontiguousarray(nn_x.transpose(2, 0, 1), np.float32),
            np.ascontiguousarray(nn_y.transpose(2, 0, 1), np.float32),
            np.ascontiguousarray(nn_t.transpose(2, 0, 1), np.int32),
            forward)
        return out.transpose(1, 2, 3, 0).astype(gradient.dtype)
    return _sample_chains(gradient, have, nn_x, nn_y, nn_t, mask, forward)


def get_flownn_gradient_frames(cfg: PropagationConfig,
                               gradient_x: np.ndarray,
                               gradient_y: np.ndarray,
                               mask: np.ndarray,
                               video_flow_f: np.ndarray,
                               video_flow_b: np.ndarray):
    """Frame-first twin of :func:`get_flownn_gradient` (no --Nonlocal).

    gradient_x/y: [N, H, W, C]; mask: [N, H, W] bool;
    video_flow_f/b: [N-1, H, W, 2] — the pipeline's natural layouts, which
    are ALSO the native kernels' layouts. The reference-layout entry point
    spends ~0.7 s/24-frame pass on transpose copies converting
    [H, W, ..., N] views back to contiguous [N, ...] buffers; this path
    has none. Equivalence is pinned by test (same math, same kernels).

    CONSUMES gradient_x/gradient_y: when they are already contiguous
    f32 the native fusion fills their hole pixels in place and returns
    them (the defensive copies cost ~13 s at outpainting scale on this
    host). No pipeline caller reads the inputs afterwards.

    Returns (gradient_x, gradient_y, mask_tofill), frame-first.
    """
    import os

    from fgt_tpu import native
    if not (native.available() and not os.environ.get("FGT_PROP_NUMPY")
            and not os.environ.get("FGT_PROP_DEVICE")):
        # fallback backends live in reference layout — convert at the rim
        gx_r, gy_r, tofill_r = get_flownn_gradient(
            cfg, gradient_x.transpose(1, 2, 3, 0),
            gradient_y.transpose(1, 2, 3, 0), mask.transpose(1, 2, 0),
            mask.transpose(1, 2, 0), video_flow_f.transpose(1, 2, 3, 0),
            video_flow_b.transpose(1, 2, 3, 0))
        return (gx_r.transpose(3, 0, 1, 2), gy_r.transpose(3, 0, 1, 2),
                tofill_r.transpose(2, 0, 1))

    from fgt_tpu.utils.hostmem import retain_heap
    retain_heap()

    mask_n = np.ascontiguousarray(mask, np.uint8)
    vf = np.ascontiguousarray(video_flow_f, np.float32)
    vb = np.ascontiguousarray(video_flow_b, np.float32)
    bn_pass = native.flownn_pass(mask_n, vb, vf, True,
                                 cfg.consistency_thres)
    fn_pass = native.flownn_pass(mask_n, vf, vb, False,
                                 cfg.consistency_thres)

    # One chain walk per direction over its own evolving copy (gx|gy
    # stacked on channels), sampled IN PLACE; fusion runs natively and
    # writes straight into the (consumed) gradient arrays. The Python
    # fusion this replaces indexed every hole pixel through
    # np.nonzero/f64 fancy-index temporaries — GB-scale allocations
    # that dominated the stage on the slow-first-touch host (~57 s of
    # a 68 s stage at the 48-frame outpainting shape).
    gx_out = np.ascontiguousarray(gradient_x, np.float32)
    gy_out = np.ascontiguousarray(gradient_y, np.float32)
    s_bn = np.concatenate([gx_out, gy_out], axis=3)
    s_fn = np.concatenate([gx_out, gy_out], axis=3)
    native.flownn_sample(s_bn, bn_pass[0], bn_pass[1], bn_pass[2],
                         bn_pass[3], True, inplace=True)
    native.flownn_sample(s_fn, fn_pass[0], fn_pass[1], fn_pass[2],
                         fn_pass[3], False, inplace=True)
    tofill = native.flownn_fuse(gx_out, gy_out, s_bn, s_fn, bn_pass,
                                fn_pass, mask_n, cfg.alpha)
    return gx_out, gy_out, tofill.view(bool)


_KEY_FRAMES = lambda N: (0, N // 2, N - 1)  # noqa: E731


def _nonlocal_frame(t, mask, nl_flow_f, nl_flow_b, gradient_x, gradient_y,
                    cfg):
    """Non-local key-source candidates for frame ``t`` (reference
    ``tool/utils/common_utils.py:332-417`` + dense consistency maps at
    ``tool/get_flowNN_gradient.py:441-461``). Samples the EVOLVING
    gradient arrays — key frame 0 has already been fused when t > 0,
    matching the reference's in-place update order.

    nl_flow_f/b: [H, W, 2, 3, N] — flow from t to key k / key k to t.
    Returns (have [H,W,3] bool, cons [H,W,3], gx_k, gy_k [H,W,C,3])."""
    H, W, N = mask.shape
    keys = _KEY_FRAMES(N)
    hy, hx = np.nonzero(mask[:, :, t])
    have = np.zeros((H, W, 3), bool)
    cons = np.zeros((H, W, 3), np.float64)
    C = gradient_x.shape[2]
    gx_k = np.zeros((H, W, C, 3), gradient_x.dtype)
    gy_k = np.zeros((H, W, C, 3), gradient_y.dtype)
    for k, key in enumerate(keys):
        ff = nl_flow_f[:, :, :, k, t]
        fb = nl_flow_b[:, :, :, k, t]
        err, _ = consist_check(fb, ff)
        cons[:, :, k] = err
        gx_k[:, :, :, k] = gradient_x[:, :, :, t]
        gy_k[:, :, :, k] = gradient_y[:, :, :, t]
        if hy.size == 0:
            continue
        tx = hx + ff[hy, hx, 0]
        ty = hy + ff[hy, hx, 1]
        bu = interp(fb[:, :, 0], tx, ty)
        bv = interp(fb[:, :, 1], tx, ty)
        diff = np.sqrt((ty + bv - hy) ** 2 + (tx + bu - hx) ** 2)
        tyi = np.round(ty).astype(np.int64)
        txi = np.round(tx).astype(np.int64)
        valid = (tyi >= 0) & (tyi < H - 1) & (txi >= 0) & (txi < W - 1)
        sel = valid & (diff < cfg.consistency_thres)
        sel[sel] &= mask[tyi[sel], txi[sel], key] == 0
        if not sel.any():
            continue
        sy, sx = hy[sel], hx[sel]
        have[sy, sx, k] = True
        gx_k[sy, sx, :, k] = interp(gradient_x[:, :, :, key],
                                    tx[sel], ty[sel])
        gy_k[sy, sx, :, k] = interp(gradient_y[:, :, :, key],
                                    tx[sel], ty[sel])
    return have, cons, gx_k, gy_k


def get_flownn_gradient(cfg: PropagationConfig,
                        gradient_x: np.ndarray, gradient_y: np.ndarray,
                        mask: np.ndarray, mask_gradient: np.ndarray,
                        video_flow_f: np.ndarray, video_flow_b: np.ndarray,
                        nonlocal_flow_f: np.ndarray | None = None,
                        nonlocal_flow_b: np.ndarray | None = None):
    """Main entry. Shapes follow the reference:

    gradient_x/y: [H, W, 3, N]; mask, mask_gradient: [H, W, N] bool;
    video_flow_f/b: [H, W, 2, N-1];
    nonlocal_flow_f/b (``--Nonlocal``): [H, W, 2, 3, N].

    Returns (gradient_x, gradient_y, mask_tofill).

    Backend selection: the native OpenMP kernels (native/fgt_native.cpp
    flownn_pass/flownn_sample) are the default — one C call per pass, no
    dense per-frame remaps, hole pixels bucketed by endpoint frame.
    ``FGT_PROP_NUMPY=1`` forces the vectorized numpy path (always
    available); ``FGT_PROP_DEVICE=1`` the lax.scan device twin (measured
    20x slower at 432x240 — per-frame scalar gathers dominate on TPU —
    but keeps the host free).
    """
    H, W, N = mask.shape
    use_nl = nonlocal_flow_f is not None

    (have_bn, bx, by, bt, cons_bn), (have_fn, fx, fy, ft, cons_fn) = \
        _run_passes(mask, video_flow_f, video_flow_b, cfg)

    # one chain walk per direction: gx/gy share the NN maps, so sample them
    # stacked on the channel axis (the kernel is C-generic)
    g_both = np.concatenate([gradient_x, gradient_y], axis=2)
    C = gradient_x.shape[2]
    s_bn = _sample(g_both, have_bn, bx, by, bt, mask, forward=True)
    s_fn = _sample(g_both, have_fn, fx, fy, ft, mask, forward=False)
    gx_bn, gy_bn = s_bn[:, :, :C], s_bn[:, :, C:]
    gx_fn, gy_fn = s_fn[:, :, :C], s_fn[:, :, C:]

    gradient_x = gradient_x.copy()
    gradient_y = gradient_y.copy()
    mask_tofill = np.zeros((H, W, N), dtype=bool)

    if not use_nl:
        # candidate fusion restricted to hole pixels (the NN maps are only
        # defined there) — ~30x less arithmetic than dense [H, W, N] frames
        ys, xs, ts = np.nonzero(mask)
        have = np.stack([have_bn[ys, xs, ts], have_fn[ys, xs, ts]], -1)
        cons = np.stack([cons_bn[ys, xs, ts], cons_fn[ys, xs, ts]], -1)
        w = np.exp(-cons / cfg.alpha) * have
        wsum = w.sum(-1, keepdims=True)
        fallback = have / np.maximum(have.sum(-1, keepdims=True), 1)
        weights = np.where(wsum > 0, w / np.maximum(wsum, 1e-30), fallback)
        any_nn = have.any(-1)
        for grad, c_bn, c_fn in ((gradient_x, gx_bn, gx_fn),
                                 (gradient_y, gy_bn, gy_fn)):
            fused = (c_bn[ys, xs, :, ts] * weights[:, :1]
                     + c_fn[ys, xs, :, ts] * weights[:, 1:])
            grad[ys, xs, :, ts] = np.where(any_nn[:, None], fused,
                                           grad[ys, xs, :, ts])
        mask_tofill[ys, xs, ts] = ~any_nn
        return gradient_x, gradient_y, mask_tofill

    for t in range(N):
        have_list = [have_bn[:, :, t], have_fn[:, :, t]]
        cons_list = [cons_bn[:, :, t], cons_fn[:, :, t]]
        gx_list = [gx_bn[:, :, :, t], gx_fn[:, :, :, t]]
        gy_list = [gy_bn[:, :, :, t], gy_fn[:, :, :, t]]
        if use_nl:
            have_k, cons_k, gx_k, gy_k = _nonlocal_frame(
                t, mask, nonlocal_flow_f, nonlocal_flow_b,
                gradient_x, gradient_y, cfg)
            for k in range(3):
                have_list.append(have_k[:, :, k])
                cons_list.append(cons_k[:, :, k])
                gx_list.append(gx_k[:, :, :, k])
                gy_list.append(gy_k[:, :, :, k])

        have = np.stack(have_list, axis=2)
        any_nn = have.any(axis=2)
        w = np.exp(-np.stack(cons_list, axis=2) / cfg.alpha)
        w = w * have
        wsum = w.sum(axis=2, keepdims=True)
        # numerical fallback: uniform over available candidates
        fallback = have / np.maximum(have.sum(axis=2, keepdims=True), 1)
        weights = np.where(wsum > 0, w / np.maximum(wsum, 1e-30), fallback)

        for grad, cands in ((gradient_x, gx_list), (gradient_y, gy_list)):
            fused = sum(c * weights[:, :, i:i + 1]
                        for i, c in enumerate(cands))
            grad[:, :, :, t] = np.where(any_nn[:, :, None], fused,
                                        grad[:, :, :, t])
        mask_tofill[:, :, t] = (~any_nn) & mask[:, :, t]

    return gradient_x, gradient_y, mask_tofill
