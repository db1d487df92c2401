"""Poisson blending of propagated gradients into frames (scipy sparse).

Behavioral contract from the reference ``tool/utils/Poisson_blend_img.py``:
for every hole pixel p and 4-neighbor q (E, S, W, N), emit a least-squares
equation tying x_p to the propagated gradient — against the known target
value when q is outside the hole (Dirichlet), or against x_q when q is also
a hole (pure gradient constraint). Equations are skipped where the gradient
itself is still masked. The least-squares system (reference solves it with
scipy LSQR per channel) is solved here through the normal equations — one
sparse SPD factorization shared by the RGB channels.

``UnfilledMask`` marks hole pixels unreachable from known pixels through
gradient-valid 4-paths: two monotone raster sweeps (top-left and
bottom-right), exactly the reference's connectivity check
(Poisson_blend_img.py:151-178); we compute the same fixpoint with
vectorized shift iterations.

Unknowns are restricted to hole pixels (the reference allocates all H*W
columns; only hole columns ever receive coefficients, so the solutions
coincide while the solve here is much smaller).
"""

from __future__ import annotations

import numpy as np
from scipy import sparse
from scipy.sparse.linalg import lsqr, splu


def _unfilled_mask(hole: np.ndarray, grad_mask: np.ndarray) -> np.ndarray:
    """Hole pixels NOT connected to known pixels via gradient-valid paths.

    Native single-raster-pass kernel when available (the sweeps'
    dependencies are acyclic, so one pass computes the fixpoint the
    vectorized iterations below converge to — parity-tested); numpy
    fixpoint fallback otherwise."""
    from fgt_tpu import native

    if native.available():
        return native.unfilled_mask(hole, grad_mask)
    H, W = hole.shape
    hole = hole.astype(bool)
    gm = grad_mask.astype(bool)

    # top-left sweep: filled if up/left neighbor filled and that neighbor's
    # gradient cell is valid (reference checks gradientMask at the NEIGHBOR)
    tl = hole.copy()  # True = still unfilled
    while True:
        up_ok = np.zeros_like(tl)
        up_ok[1:, :] = (~tl[:-1, :]) & (~gm[:-1, :])
        left_ok = np.zeros_like(tl)
        left_ok[:, 1:] = (~tl[:, :-1]) & (~gm[:, :-1])
        new_tl = tl & ~(up_ok | left_ok)
        if np.array_equal(new_tl, tl):
            break
        tl = new_tl

    # bottom-right sweep: gradient validity is checked at the PIXEL itself
    br = hole.copy()
    while True:
        down_ok = np.zeros_like(br)
        down_ok[:-1, :] = ~br[1:, :]
        right_ok = np.zeros_like(br)
        right_ok[:, :-1] = (~br[:, 1:])
        ok = (down_ok | right_ok) & (~gm)
        new_br = br & ~ok
        if np.array_equal(new_br, br):
            break
        br = new_br

    return tl & br


class _PoissonPlan:
    """Everything determined by (hole, gm) alone: the equation system's
    sparsity+values (all ±1), its factorization, and the gather indices
    needed to rebuild the RHS per frame. Static-mask workloads (watermark
    removal, extrapolation borders) reuse one plan for every frame."""

    def __init__(self, hole: np.ndarray, gm: np.ndarray):
        H, W = hole.shape
        self.hole, self.gm = hole, gm
        py, px = np.nonzero(hole)
        self.py, self.px = py, px
        npix = py.size
        self.npix = npix
        col_of = np.full((H, W), -1, np.int64)
        col_of[py, px] = np.arange(npix)

        rows, cols, vals = [], [], []
        rhs_plan = []   # (kind, vy, vx, qy, qx) per equation block, ordered
        eq = 0
        #      3 (N)
        # 2(W) * 0(E)
        #      1 (S)
        # (dy, dx, gradient source id, gradient-valid test position)
        # source ids: 0 = -gx[y, x], 1 = -gy[y, x], 2 = gx[y, x-1],
        # 3 = gy[y-1, x]
        dirs = (
            (0, 1, 0, lambda y, x: ~gm[y, x]),          # E
            (1, 0, 1, lambda y, x: ~gm[y, x]),          # S
            (0, -1, 2, lambda y, x: ~gm[y, x - 1]),     # W
            (-1, 0, 3, lambda y, x: ~gm[y - 1, x]),     # N
        )
        for dy, dx, gsrc, gok in dirs:
            qy, qx = py + dy, px + dx
            valid = (qy >= 0) & (qy < H) & (qx >= 0) & (qx < W)
            vy, vx = py[valid], px[valid]
            qy, qx = qy[valid], qx[valid]
            havegrad = gok(vy, vx)
            q_known = ~hole[qy, qx]
            # boundary equations: x_p = grad + I[q]
            selb = havegrad & q_known
            n = int(selb.sum())
            rows.append(np.arange(eq, eq + n))
            cols.append(col_of[vy[selb], vx[selb]])
            vals.append(np.ones(n))
            rhs_plan.append(("b", gsrc, vy[selb], vx[selb],
                             qy[selb], qx[selb]))
            eq += n
            # interior equations: x_p - x_q = grad
            seli = havegrad & ~q_known
            n = int(seli.sum())
            rows.append(np.arange(eq, eq + n))
            cols.append(col_of[vy[seli], vx[seli]])
            vals.append(np.ones(n))
            rows.append(np.arange(eq, eq + n))
            cols.append(col_of[qy[seli], qx[seli]])
            vals.append(-np.ones(n))
            rhs_plan.append(("i", gsrc, vy[seli], vx[seli], None, None))
            eq += n

        self.rhs_plan = rhs_plan
        self.A = sparse.csr_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(eq, npix))
        # least squares via the normal equations: one SPD factorization
        # shared by all channels (~4x over per-channel LSQR at typical
        # hole sizes). The 1e-8 ridge keeps equation-less pixels at the
        # minimum-norm 0 that LSQR would return and makes the system
        # nonsingular.
        try:
            self.lu = splu((self.A.T @ self.A
                            + 1e-8 * sparse.eye(npix)).tocsc())
        except Exception:   # fall back to per-channel LSQR in solve()
            self.lu = None
        self.unfilled = _unfilled_mask(hole, gm)

    def rhs(self, img_target, gx, gy):
        srcs = (lambda y, x: -gx[y, x], lambda y, x: -gy[y, x],
                lambda y, x: gx[y, x - 1], lambda y, x: gy[y - 1, x])
        parts = []
        for kind, gsrc, vy, vx, qy, qx in self.rhs_plan:
            b_dir = srcs[gsrc](vy, vx)
            parts.append(b_dir + img_target[qy, qx] if kind == "b"
                         else b_dir)
        return np.concatenate(parts, axis=0)


# tiny LRU keyed by the (hole, gm) bytes — one entry suffices for
# static-mask videos, a few tolerate alternating patterns
_PLAN_CACHE: "dict[bytes, _PoissonPlan]" = {}
_PLAN_CACHE_MAX = 4


def _get_plan(hole: np.ndarray, gm: np.ndarray) -> _PoissonPlan:
    key = hole.tobytes() + gm.tobytes()
    plan = _PLAN_CACHE.pop(key, None)
    if plan is None:
        plan = _PoissonPlan(hole, gm)
        while len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    _PLAN_CACHE[key] = plan
    return plan


def poisson_blend(img_target: np.ndarray, grad_x: np.ndarray,
                  grad_y: np.ndarray, hole_mask: np.ndarray,
                  gradient_mask: np.ndarray | None = None):
    """Blend gradients into the hole of one frame.

    img_target: [H, W, 3]; grad_x: [H, W-1(+pad), 3]; grad_y likewise;
    hole_mask, gradient_mask: [H, W] bool-ish.
    Returns (blended [H, W, 3] float, unfilled_mask [H, W] bool).
    """
    H, W, C = img_target.shape
    hole = hole_mask.astype(bool)
    gm = (np.zeros((H, W), np.float32) if gradient_mask is None
          else gradient_mask).astype(bool)

    if not hole.any():
        return img_target.astype(np.float64), np.zeros((H, W), bool)

    # pad gradients back to [H, W] grids for uniform indexing
    gx = np.zeros((H, W, C), np.float64)
    gy = np.zeros((H, W, C), np.float64)
    gx[:, :grad_x.shape[1]] = grad_x
    gy[:grad_y.shape[0], :] = grad_y

    plan = _get_plan(hole, gm)
    b = plan.rhs(img_target, gx, gy)  # [eq, 3]

    if plan.lu is not None:
        recon = plan.lu.solve(plan.A.T @ b)
    else:
        recon = np.zeros((plan.npix, C))
        for ch in range(C):
            recon[:, ch] = lsqr(plan.A, b[:, ch])[0]

    out = img_target.astype(np.float64).copy()
    out[plan.py, plan.px] = recon
    return out, plan.unfilled.copy()
