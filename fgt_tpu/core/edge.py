"""Canny edge detection (numpy/cv2) for the LAFC edge-supervision pipeline.

The reference uses skimage.feature.canny on flow-gray images with
``sigma=1, low_threshold=0.1, high_threshold=0.2``
(LAFC/data/train_dataset_edge.py:139-146, config data_info.yaml). skimage is
not available in this environment, so this is a faithful reimplementation:
gaussian smoothing, sobel gradients, bilinear non-maximum suppression along
the gradient direction, double threshold with connected-component hysteresis.
Thresholds are absolute values on the gradient-magnitude image (skimage
semantics for float input with use_quantiles=False).
"""

from __future__ import annotations

import cv2
import numpy as np


def canny(image: np.ndarray, sigma: float = 1.0,
          low_threshold: float = 0.1, high_threshold: float = 0.2,
          mask: np.ndarray | None = None) -> np.ndarray:
    img = np.asarray(image, dtype=np.float64)
    ksize = max(3, int(4 * sigma + 1) | 1)
    smoothed = cv2.GaussianBlur(img, (ksize, ksize), sigma)

    gx = cv2.Sobel(smoothed, cv2.CV_64F, 1, 0, ksize=3) / 4.0
    gy = cv2.Sobel(smoothed, cv2.CV_64F, 0, 1, ksize=3) / 4.0
    mag = np.hypot(gx, gy)

    # --- non-maximum suppression (quantized to 4 directions) ---
    angle = np.arctan2(gy, gx)  # [-pi, pi]
    angle = np.mod(angle, np.pi)  # fold to [0, pi)
    q = ((angle + np.pi / 8) // (np.pi / 4)).astype(np.int32) % 4
    pad = np.pad(mag, 1)
    H, W = mag.shape
    c = pad[1:-1, 1:-1]
    neighbors = [
        (pad[1:-1, 2:], pad[1:-1, :-2]),   # 0:   horizontal gradient -> E/W
        (pad[2:, 2:], pad[:-2, :-2]),      # 45:  SE/NW
        (pad[2:, 1:-1], pad[:-2, 1:-1]),   # 90:  S/N
        (pad[2:, :-2], pad[:-2, 2:]),      # 135: SW/NE
    ]
    keep = np.zeros((H, W), dtype=bool)
    for d, (n1, n2) in enumerate(neighbors):
        sel = q == d
        keep |= sel & (c >= n1) & (c >= n2)
    nms = np.where(keep, mag, 0.0)

    # --- double threshold + hysteresis via connected components ---
    strong = nms >= high_threshold
    weak = nms >= low_threshold
    if mask is not None:
        strong &= mask.astype(bool)
        weak &= mask.astype(bool)
    n, labels = cv2.connectedComponents(weak.astype(np.uint8), connectivity=8)
    if n <= 1:
        return np.zeros_like(strong)
    has_strong = np.zeros(n, dtype=bool)
    np.logical_or.at(has_strong, labels[strong], True)
    has_strong[0] = False
    return has_strong[labels]


def flow_edge(flow: np.ndarray, sigma: float = 1.0,
              low_threshold: float = 0.1, high_threshold: float = 0.2):
    """(gray-magnitude, canny-edge) pair for a flow field, mirroring the
    LAFC dataset's ``load_edge`` (train_dataset_edge.py:139-146)."""
    from fgt_tpu.core.flow_viz import flow_to_rgb

    gray_flow = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    factor = max(gray_flow.max(), 1e-8)
    gray_flow = gray_flow / factor
    rgb = flow_to_rgb(flow)
    fg = cv2.cvtColor((rgb * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY) / 255.0
    edge = canny(fg, sigma=sigma, low_threshold=low_threshold,
                 high_threshold=high_threshold).astype(np.float64)
    return gray_flow, edge
