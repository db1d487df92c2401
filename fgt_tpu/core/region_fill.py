"""Laplacian region fill ("diffusion") for masked flow fields.

Behavioral contract from the reference (tool/utils/region_fill.py:7-126,
copies in FGT/LAFC data/util/flow_utils/region_fill.py): solve the discrete
Laplace equation inside the hole with Dirichlet boundary values taken from
the 4-connected perimeter of the hole, optionally on a resized grid, then
paste the solution back and restore all un-masked pixels exactly.

Implementation is a vectorized sparse solve (scipy spsolve). This is a CPU
preprocessing step feeding the TPU models; keeping it numpy avoids any
host<->device ping-pong for data loading.
"""

from __future__ import annotations

import cv2
import numpy as np
from scipy import sparse
from scipy.sparse.linalg import spsolve


def _find_boundary(mask: np.ndarray) -> np.ndarray:
    """4-connected outside-perimeter pixels of a boolean hole mask."""
    kernel = cv2.getStructuringElement(cv2.MORPH_CROSS, (3, 3))
    dilated = cv2.dilate(mask.astype(np.float64), kernel)
    return (dilated > 0) & (mask == 0)


def _num_neighbors(h: int, w: int) -> np.ndarray:
    n = np.full((h, w), 4.0)
    n[0, :] = n[-1, :] = 3.0
    n[:, 0] = n[:, -1] = 3.0
    n[0, 0] = n[0, -1] = n[-1, 0] = n[-1, -1] = 2.0
    return n


def _laplace_fill(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Solve the Laplace equation on `mask` pixels of `img`, in place."""
    h, w = img.shape
    perimeter = _find_boundary(mask)

    # Dirichlet data folded into the right-hand side: sum of perimeter
    # neighbor values for every pixel (vectorized 4-neighbor sum with
    # zero-padding at the image border).
    pvals = np.where(perimeter, img, 0.0)
    pad = np.pad(pvals, 1)
    rhs_full = pad[:-2, 1:-1] + pad[2:, 1:-1] + pad[1:-1, :-2] + pad[1:-1, 2:]

    ys, xs = np.nonzero(mask)
    npix = ys.size
    if npix == 0:
        return img
    rhs = rhs_full[ys, xs]

    grid = np.full((h + 2, w + 2), -1, dtype=np.int64)
    grid[ys + 1, xs + 1] = np.arange(npix)

    rows = [np.arange(npix)]
    cols = [np.arange(npix)]
    vals = [_num_neighbors(h, w)[ys, xs]]
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nb = grid[ys + 1 + dy, xs + 1 + dx]
        sel = nb >= 0
        rows.append(np.arange(npix)[sel])
        cols.append(nb[sel])
        vals.append(-np.ones(sel.sum()))
    A = sparse.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(npix, npix),
    ).tocsr()
    sol = spsolve(A, rhs)
    img[ys, xs] = sol
    return img


def regionfill(image: np.ndarray, mask: np.ndarray, factor: float = 1.0) -> np.ndarray:
    """Fill `mask` pixels of a single-channel `image` by Laplacian diffusion.

    Mirrors reference ``regionfill`` (tool/utils/region_fill.py:7-17): the
    solve runs at ``factor`` scale, results are resized back, and un-masked
    pixels are restored exactly from the input.
    """
    image = np.asarray(image, dtype=np.float64)
    mask = np.asarray(mask)
    if np.count_nonzero(mask) == 0:
        return image.copy()
    if factor != 1.0:
        small_mask = cv2.resize(mask.astype(np.float64), (0, 0), fx=factor, fy=factor) > 0
        small_img = cv2.resize(image, (0, 0), fx=factor, fy=factor)
    else:
        small_mask = mask > 0
        small_img = image.copy()
    _laplace_fill(small_img, small_mask)
    if factor != 1.0:
        small_img = cv2.resize(small_img, (image.shape[1], image.shape[0]))
    out = small_img
    out[mask == 0] = image[mask == 0]
    return out


def diffuse_flow(flow: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Fill both channels of an ``[H, W, 2]`` flow; hole values are zeroed
    first (reference FGT/data/train_dataset.py:101-105)."""
    mask2 = np.asarray(mask).astype(np.float64)
    if mask2.ndim == 3:
        mask2 = mask2[..., 0]
    out = np.zeros_like(flow, dtype=np.float64)
    for c in range(2):
        out[..., c] = regionfill(flow[..., c] * (1 - mask2), mask2)
    return out.astype(np.float32)
