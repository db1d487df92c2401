"""flowNN directional chaining on TPU (lax.scan over frames).

Same math as :mod:`fgt_tpu.pipeline.propagation`'s ``_directional_pass``
(itself pinned to the reference ``tool/get_flowNN_gradient.py:73-370``),
restructured TPU-first:

* dense [H, W] per-frame state instead of hole-pixel index lists (no
  data-dependent shapes -> one compiled scan for any video length);
* the six per-pixel chain fields (have, nn_x, nn_y, nn_t, cons_u, cons_v)
  are PACKED into one [H*W, 6] buffer so each frame step costs one row
  gather instead of six scalar gathers;
* the sequential frame dependency is a ``lax.scan`` carry.

Chain SAMPLING and candidate fusion stay on the host (the evolving-array
bilinear reads are inherently sequential per source frame and tiny).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(img_flat: jnp.ndarray, h: int, w: int,
                     x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """img_flat: [H*W, C]; x, y: [H, W] -> [H, W, C]; zero outside."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0

    def tap(xi, yi, wt):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        lin = (jnp.clip(yi, 0, h - 1) * w
               + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        vals = jnp.take(img_flat, lin.reshape(-1), axis=0)
        vals = vals.reshape(*x.shape, img_flat.shape[-1])
        return vals * (wt * valid)[..., None]

    return (tap(x0, y0, (1 - fx) * (1 - fy))
            + tap(x0 + 1, y0, fx * (1 - fy))
            + tap(x0, y0 + 1, (1 - fx) * fy)
            + tap(x0 + 1, y0 + 1, fx * fy))


@functools.partial(jax.jit, static_argnames=("forward",))
def _scan_pass(mask, flow_follow, flow_check, src_ts, forward,
               consistency_thres):
    """mask: [N, H, W] f32; flow_follow/check: [T, H, W, 2] in scan order;
    src_ts: [T] source frame index per step. Returns per-step state
    [T, H, W, 6] (have, nn_x, nn_y, nn_t, cons_u, cons_v)."""
    n, h, w = mask.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    ys = ys.astype(jnp.float32)
    xs = xs.astype(jnp.float32)
    mask_flat = mask.reshape(n, h * w)

    def step(carry, inp):
        state_prev = carry                        # [H*W, 6]
        f_follow, f_check, src_t, t = inp
        hole = mask_flat[t.astype(jnp.int32)].reshape(h, w) > 0
        src_known = mask_flat[src_t.astype(jnp.int32)] == 0

        ty = ys + f_follow[:, :, 1]
        tx = xs + f_follow[:, :, 0]
        back = _bilinear_gather(f_check.reshape(h * w, 2), h, w, tx, ty)
        u = tx + back[:, :, 0] - xs
        v = ty + back[:, :, 1] - ys
        consist = jnp.sqrt(u ** 2 + v ** 2) < consistency_thres

        tyi = jnp.round(ty).astype(jnp.int32)
        txi = jnp.round(tx).astype(jnp.int32)
        valid = (tyi >= 0) & (tyi < h - 1) & (txi >= 0) & (txi < w - 1)
        lin = (jnp.clip(tyi, 0, h - 1) * w + jnp.clip(txi, 0, w - 1))
        lin_flat = lin.reshape(-1)

        known = jnp.take(src_known, lin_flat, axis=0).reshape(h, w)
        prev = jnp.take(state_prev, lin_flat, axis=0).reshape(h, w, 6)
        prev_have = prev[:, :, 0] > 0

        base = hole & valid & consist
        case1 = base & known

        ref_y = ty - tyi
        ref_x = tx - txi
        cx = prev[:, :, 1] + ref_x
        cy = prev[:, :, 2] + ref_y
        cyi = jnp.round(cy).astype(jnp.int32)
        cxi = jnp.round(cx).astype(jnp.int32)
        in_b = (cyi >= 0) & (cyi < h - 1) & (cxi >= 0) & (cxi < w - 1)
        case2 = base & (~known) & prev_have & in_b

        zero = jnp.zeros((h, w), jnp.float32)
        have = (case1 | case2).astype(jnp.float32)
        nn_x = jnp.where(case1, tx, jnp.where(case2, cx, zero))
        nn_y = jnp.where(case1, ty, jnp.where(case2, cy, zero))
        nn_t = jnp.where(case1, src_t.astype(jnp.float32),
                         jnp.where(case2, prev[:, :, 3], -1.0))
        au, av = jnp.abs(u), jnp.abs(v)
        cons_u = jnp.where(case1, au, jnp.where(
            case2, jnp.maximum(au, jnp.abs(prev[:, :, 4])), zero))
        cons_v = jnp.where(case1, av, jnp.where(
            case2, jnp.maximum(av, jnp.abs(prev[:, :, 5])), zero))

        state = jnp.stack([have, nn_x, nn_y, nn_t, cons_u, cons_v],
                          axis=-1).reshape(h * w, 6)
        return state, state.reshape(h, w, 6)

    init = jnp.zeros((h * w, 6), jnp.float32)
    init = init.at[:, 3].set(-1.0)
    ts = (jnp.arange(1, n) if forward
          else jnp.arange(n - 2, -1, -1)).astype(jnp.float32)
    _, states = jax.lax.scan(
        step, init, (flow_follow, flow_check, src_ts, ts))
    return states


def directional_pass_tpu(mask: np.ndarray, flow_follow: np.ndarray,
                         flow_check: np.ndarray, n_frames: int,
                         forward: bool, cfg):
    """Drop-in for propagation._directional_pass, running on the default
    jax device. Shapes follow the numpy version: mask [H, W, N],
    flows [H, W, 2, N-1]; returns (have, nn_x, nn_y, nn_t, cons)."""
    h, w, n = mask.shape
    mask_t = jnp.asarray(mask.transpose(2, 0, 1).astype(np.float32))
    ff = flow_follow.transpose(3, 0, 1, 2).astype(np.float32)  # [N-1,H,W,2]
    fc = flow_check.transpose(3, 0, 1, 2).astype(np.float32)
    if forward:
        order = np.arange(n - 1)            # flow idx for t = 1..N-1
        src_ts = np.arange(0, n - 1)
    else:
        order = np.arange(n - 2, -1, -1)    # flow idx for t = N-2..0
        src_ts = np.arange(n - 1, 0, -1)
    states = np.asarray(_scan_pass(
        mask_t, jnp.asarray(ff[order]), jnp.asarray(fc[order]),
        jnp.asarray(src_ts.astype(np.float32)), forward,
        float(cfg.consistency_thres)))        # [T, H, W, 6]

    have = np.zeros((h, w, n), dtype=bool)
    nn_x = np.zeros((h, w, n), dtype=np.float64)
    nn_y = np.zeros((h, w, n), dtype=np.float64)
    nn_t = np.full((h, w, n), -1, dtype=np.int64)
    cons_u = np.zeros((h, w, n), dtype=np.float64)
    cons_v = np.zeros((h, w, n), dtype=np.float64)
    frame_ids = range(1, n) if forward else range(n - 2, -1, -1)
    for step_i, t in enumerate(frame_ids):
        s = states[step_i]
        have[:, :, t] = s[:, :, 0] > 0
        nn_x[:, :, t] = s[:, :, 1]
        nn_y[:, :, t] = s[:, :, 2]
        nn_t[:, :, t] = s[:, :, 3].astype(np.int64)
        cons_u[:, :, t] = s[:, :, 4]
        cons_v[:, :, t] = s[:, :, 5]
    cons = np.sqrt(cons_u ** 2 + cons_v ** 2)
    return have, nn_x, nn_y, nn_t, cons
