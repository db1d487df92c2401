"""Training losses (JAX/NHWC).

Capability parity with the reference loss set:
* masked/valid mean-normalized L1      (FGT/networks/network.py:146-151)
* adversarial hinge / nsgan / lsgan    (LAFC/models/utils/flow_losses.py:88-125)
* generalized charbonnier              (flow_losses.py:418-434)
* 1st / 2nd order flow smoothness      (flow_losses.py:383-415, 437-464)
* ternary (census) loss + occlusion    (fbConsistencyCheck.py:56-108,
                                        LAFC/networks/network.py:164-172)
* pos/neg-weighted edge BCE + EdgeAcc  (bce_edge_loss.py:6-59)

Reference quirks preserved (they matter for training parity):
* the edge loss applies BCE-with-logits to ALREADY-sigmoided predictions;
* smoothness uses the hole mask, not the boundary mask its helper computes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fgt_tpu.core.warp import image_warp


# ---------------- reconstruction ----------------

def l1_normalized(pred, target, mask):
    """``L1(pred*m, target*m) / mean(m)`` — the reference's masked/valid
    reconstruction terms."""
    return jnp.mean(jnp.abs(pred * mask - target * mask)) / jnp.maximum(
        jnp.mean(mask), 1e-8)


# ---------------- adversarial ----------------

def adversarial_loss(outputs, is_real: bool, is_disc: bool,
                     kind: str = "hinge"):
    if kind == "hinge":
        if is_disc:
            sign = -1.0 if is_real else 1.0
            return jnp.mean(jax.nn.relu(1.0 + sign * outputs))
        return jnp.mean(-outputs)
    target = jnp.ones_like(outputs) if is_real else jnp.zeros_like(outputs)
    if kind == "nsgan":
        eps = 1e-7
        p = jnp.clip(outputs, eps, 1 - eps)
        return jnp.mean(-(target * jnp.log(p) + (1 - target) * jnp.log(1 - p)))
    if kind == "lsgan":
        return jnp.mean((outputs - target) ** 2)
    raise ValueError(kind)


# ---------------- charbonnier / smoothness ----------------

def charbonnier(x, mask=None, alpha: float = 0.45, beta: float = 1.0,
                epsilon: float = 0.001):
    error = jnp.power((x * beta) ** 2 + epsilon ** 2, alpha)
    if mask is not None:
        error = error * mask
    return jnp.sum(error) / x.size


def _flow_deltas(flow, filters):
    """Apply a bank of 3x3 difference filters per flow channel.

    flow: [B, H, W, 2] -> (delta_u, delta_v) each [B, H, W, n_filters]."""
    k = jnp.stack(filters, axis=-1)[:, :, None, :]  # [3,3,1,n]
    def conv1(x):
        return jax.lax.conv_general_dilated(
            x[..., None], k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return conv1(flow[..., 0]), conv1(flow[..., 1])


_FILTER_X = jnp.array([[0, 0, 0.], [0, 1, -1], [0, 0, 0]])
_FILTER_Y = jnp.array([[0, 0, 0.], [0, 1, 0], [0, -1, 0]])
_FILTER_X2 = jnp.array([[0, 0, 0.], [1, -2, 1], [0, 0, 0]])
_FILTER_Y2 = jnp.array([[0, 1, 0.], [0, -2, 0], [0, 1, 0]])
_FILTER_D1 = jnp.array([[1, 0, 0.], [0, -2, 0], [0, 0, 1]])
_FILTER_D2 = jnp.array([[0, 0, 1.], [0, -2, 0], [1, 0, 0]])


def smoothness_loss(flow, cmask):
    """First-order charbonnier smoothness; ``cmask`` is the hole mask
    [B, H, W, 1] (the reference passes target_mask here)."""
    du, dv = _flow_deltas(flow, [_FILTER_X, _FILTER_Y])
    return charbonnier(du, cmask) + charbonnier(dv, cmask)


def second_order_loss(flow, cmask):
    du, dv = _flow_deltas(flow, [_FILTER_X2, _FILTER_Y2, _FILTER_D1, _FILTER_D2])
    return charbonnier(du, cmask) + charbonnier(dv, cmask)


# ---------------- ternary (census) ----------------

def _rgb2gray(img):
    return (img[..., 0] * 0.299 + img[..., 1] * 0.587
            + img[..., 2] * 0.110)[..., None]


def ternary_transform(image, max_distance: int = 1):
    """Census transform (reference fbConsistencyCheck.py:56-66).

    image: [B, H, W, 3] in [0, 1] -> [B, H, W, patch^2] normalized."""
    patch = 2 * max_distance + 1
    intensities = _rgb2gray(image) * 255.0
    n = patch * patch
    w = jnp.eye(n).reshape(patch, patch, 1, n)
    patches = jax.lax.conv_general_dilated(
        intensities, w, (1, 1), ((max_distance, max_distance),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    transf = patches - intensities
    return transf / jnp.sqrt(0.81 + transf ** 2)


def hamming_distance(t1, t2):
    dist = (t1 - t2) ** 2
    return jnp.sum(dist / (0.1 + dist), axis=-1, keepdims=True)


def ternary_loss(comp_flow, gt_flow, mask, current_frame, shift_frame):
    """Census loss between the current frame and the shifted frame warped by
    the completed flow, gated by a soft non-occlusion mask derived from the
    GT flow (reference LAFC/networks/network.py:164-172).

    All inputs NHWC: flows [B,H,W,2], frames [B,H,W,3], mask [B,H,W,1]."""
    warped_gt = image_warp(shift_frame, gt_flow)
    diff = jnp.sum(jnp.abs(current_frame - warped_gt), axis=-1,
                   keepdims=True)
    noc_mask = jnp.exp(-50.0 * diff ** 2)
    warped_comp = image_warp(shift_frame, comp_flow)
    t1 = ternary_transform(current_frame)
    t21 = ternary_transform(warped_comp)
    dist = hamming_distance(t1, t21)
    return jnp.mean(dist * noc_mask * mask) / jnp.maximum(jnp.mean(mask), 1e-8)


# ---------------- edge ----------------

def edge_loss(pred_edges, gt_edges):
    """Pos/neg-frequency-weighted BCE (reference bce_edge_loss.py:6-25).

    NOTE: like the reference, this applies the WITH-LOGITS form to
    predictions that already passed a sigmoid — preserved for parity."""
    mask = (gt_edges > 0.5).astype(jnp.float32)
    b = mask.shape[0]
    num_pos = jnp.sum(mask.reshape(b, -1), axis=1)
    total = mask[0].size
    num_neg = total - num_pos
    neg_w = (num_neg / total).reshape(b, 1, 1, 1)
    pos_w = (num_pos / total).reshape(b, 1, 1, 1)
    weight = neg_w * mask + pos_w * (1 - mask)
    x = pred_edges.astype(jnp.float32)
    z = gt_edges.astype(jnp.float32)
    # bce_with_logits: max(x,0) - x*z + log(1+exp(-|x|))
    bce = jnp.maximum(x, 0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(weight * bce)


def edge_accuracy(pred_edge, gt_edge, threshold: float = 0.5):
    """(precision, recall) at a threshold (reference bce_edge_loss.py:28-59)."""
    labels = gt_edge > threshold
    preds = pred_edge > threshold
    relevant = jnp.sum(labels.astype(jnp.float32))
    selected = jnp.sum(preds.astype(jnp.float32))
    tp = jnp.sum(((preds == labels) & labels).astype(jnp.float32))
    precision = jnp.where(selected > 0, tp / (selected + 1e-8), 1.0)
    recall = jnp.where(relevant > 0, tp / (relevant + 1e-8), 1.0)
    return precision, recall


# ---------------- fb consistency (available, as in reference) ----------------

def create_outgoing_mask(flow):
    """1 where the flow stays in bounds (reference flow_losses.py:489-517).
    flow: [B, H, W, 2] -> [B, H, W, 1]."""
    b, h, w, _ = flow.shape
    xs = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    ys = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    px = xs + flow[..., 0]
    py = ys + flow[..., 1]
    inside = ((px <= w - 1) & (px >= 0) & (py <= h - 1) & (py >= 0))
    return inside[..., None].astype(flow.dtype)


def fb_consistency_loss(forward_flow, backward_flow, forward_gt, backward_gt,
                        fb_weight: float = 1.0):
    """UnFlow-style cycle consistency with GT-flow occlusion masking
    (reference flow_losses.py:315-376, image-warp term omitted by default
    as in the reference's default loss mix)."""
    mask_fw = create_outgoing_mask(forward_flow)
    mask_bw = create_outgoing_mask(backward_flow)

    fw_warped = image_warp(forward_flow, backward_gt)
    fw_warped_gt = image_warp(forward_gt, backward_gt)
    bw_warped = image_warp(backward_flow, forward_gt)
    bw_warped_gt = image_warp(backward_gt, forward_gt)

    def lsq(x):
        return jnp.sum(x ** 2, axis=-1, keepdims=True)

    diff_fw = bw_warped + forward_flow
    diff_fw_gt = bw_warped_gt + forward_gt
    diff_bw = backward_flow + fw_warped
    diff_bw_gt = backward_gt + fw_warped_gt

    occ_fw = (lsq(diff_fw_gt) > 0.01 * (lsq(forward_gt) + lsq(bw_warped_gt))
              + 0.5).astype(forward_flow.dtype)
    occ_bw = (lsq(diff_bw_gt) > 0.01 * (lsq(backward_gt) + lsq(fw_warped_gt))
              + 0.5).astype(forward_flow.dtype)
    mask_fw = mask_fw * (1 - occ_fw)
    mask_bw = mask_bw * (1 - occ_bw)
    return fb_weight * (charbonnier(diff_fw, mask_fw)
                        + charbonnier(diff_bw, mask_bw))
