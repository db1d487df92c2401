"""Device-resident Laplacian region fill ("diffusion") for flow fields.

TPU twin of :mod:`fgt_tpu.core.region_fill` (behavioral contract from the
reference ``tool/utils/region_fill.py:7-126``, applied per frame/channel
by the inference driver's ``diffusion`` at
``tool/video_inpainting.py:44-52``): solve the discrete Laplace equation
inside the hole with Dirichlet boundary values from the 4-connected hole
perimeter, Neumann (reduced neighbor count) at image borders, and restore
every un-masked pixel exactly.

The host implementations (scipy spsolve / the native OpenMP multigrid)
are exact direct/iterative solvers on the CPU; this one keeps the flows
on the TPU so the s1 RAFT -> s2 LAFC handoff never round-trips the host:
the masked 5-point Laplacian is a 4-neighbor shift-add and the solver is
batched conjugate gradients over all ``frames x channels`` planes in one
``lax.while_loop`` — dense, static-shape, XLA-friendly. CG on the
Dirichlet Laplacian is SPD-safe, and every plane gets its own alpha/beta
(per-plane convergence; finished planes freeze via the rs > 0 guard).

Accuracy: f32 CG to ``rtol=1e-6`` ~ 1e-4 absolute parity with the f64
host solve on unit-scale flows (asserted by tests/test_diffusion_tpu.py);
the LAFC model consumes the diffused field, so downstream parity is far
inside the model's own f32-vs-torch tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _nbsum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of the 4 in-grid neighbors, zero-padded at the border.

    x: [..., H, W] -> [..., H, W].
    """
    up = jnp.pad(x[..., 1:, :], [(0, 0)] * (x.ndim - 2) + [(0, 1), (0, 0)])
    dn = jnp.pad(x[..., :-1, :], [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)])
    lf = jnp.pad(x[..., :, 1:], [(0, 0)] * (x.ndim - 2) + [(0, 0), (0, 1)])
    rt = jnp.pad(x[..., :, :-1], [(0, 0)] * (x.ndim - 2) + [(0, 0), (1, 0)])
    return up + dn + lf + rt


def _neighbor_count(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """In-grid 4-neighbor count: 4 inside, 3 at edges, 2 at corners
    (reference region_fill.py formLeftSide / core.region_fill
    _num_neighbors)."""
    return _nbsum(jnp.ones((h, w), dtype))


def _cg_hole_solve(planes: jnp.ndarray, m: jnp.ndarray, keep: jnp.ndarray,
                   x0: jnp.ndarray, max_iters: int,
                   rtol: float) -> jnp.ndarray:
    """Batched CG on the hole-subspace Dirichlet Laplacian.

    ``x0`` is a warm start living in the hole subspace (zero outside the
    hole); the returned solution is in the same subspace. Convergence is
    to ``rtol * ||b||`` per plane regardless of the start, so a warm
    start changes cost, never accuracy.
    """
    h, w = planes.shape[-2:]
    # every non-hole 4-neighbor of a hole pixel is a perimeter pixel, so
    # the Dirichlet RHS reduces to the neighbor-sum of the kept image
    b = _nbsum(planes * keep) * m
    n = _neighbor_count(h, w) * m

    def matvec(x):
        # x lives in the hole subspace (zero outside); n*x - sum of hole
        # neighbors is the 5-point Dirichlet Laplacian
        return (n * x - _nbsum(x)) * m

    sum2 = lambda v: jnp.sum(v * v, axis=(-2, -1), keepdims=True)
    b2 = sum2(b)
    tol2 = (rtol * rtol) * b2          # per-plane absolute stop, squared

    r0 = b - matvec(x0)
    rs0 = sum2(r0)

    def cond(state):
        i, _, _, _, rs = state
        return jnp.logical_and(i < max_iters, jnp.any(rs > tol2))

    def body(state):
        i, x, r, p, rs = state
        ap = matvec(p)
        denom = jnp.sum(p * ap, axis=(-2, -1), keepdims=True)
        live = (rs > tol2).astype(jnp.float32)
        alpha = live * rs / jnp.where(denom > 0, denom, 1.0)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = sum2(r)
        # live-scaled: converged planes freeze at p = r (a drifting p
        # could overflow to inf and 0*inf-NaN the frozen x)
        beta = live * rs_new / jnp.where(rs > 0, rs, 1.0)
        p = r + beta * p
        return i + 1, x, r, p, rs_new

    _, x, _, _, _ = lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, r0, rs0))
    return x


def _restrict(x: jnp.ndarray) -> jnp.ndarray:
    """2x2-sum restriction (exact transpose of :func:`_prolong`).

    Odd extents are zero-padded first; zero-padding is subspace
    embedding, whose transpose is the cropping done in _prolong.
    """
    p, h, w = x.shape
    ph, pw = (-h) % 2, (-w) % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw)))
    h2, w2 = x.shape[-2:]
    return x.reshape(p, h2 // 2, 2, w2 // 2, 2).sum((2, 4))


def _prolong(xc: jnp.ndarray, shape) -> jnp.ndarray:
    """2x2-repeat prolongation, cropped to the fine ``shape``."""
    h, w = shape
    up = jnp.repeat(jnp.repeat(xc, 2, axis=-2), 2, axis=-1)
    return up[:, :h, :w]


def _mask_pyramid(m: jnp.ndarray, levels: int, min_size: int = 16):
    """Hole masks per level: coarse pixel is hole iff ANY fine pixel is.

    The max-pool rule makes every fine hole pixel reachable by a coarse
    correction (prolongated corrections are re-masked to the fine hole,
    so kept pixels are never touched)."""
    masks = [m]
    for _ in range(levels):
        h, w = masks[-1].shape[-2:]
        if min(h, w) // 2 < min_size:
            break
        masks.append((_restrict(masks[-1]) > 0).astype(m.dtype))
    return masks


def _vcycle(r: jnp.ndarray, masks, level: int = 0,
            nu: int = 1, omega: float = 0.8) -> jnp.ndarray:
    """One V(nu,nu)-cycle on the hole-subspace Dirichlet Laplacian.

    Damped-Jacobi smoothing, 2x2-sum/repeat transfers (a transpose
    pair), rediscretized coarse operators. The restricted residual is
    halved each descent: with sum/repeat transfers the Galerkin coarse
    operator is ~2x the rediscretized unscaled 5-point stencil, so
    solving L_c e_c = P^T r / 2 approximates the Galerkin correction.
    Used only as a preconditioner — the outer flexible CG owns accuracy.
    """
    m = masks[level]
    h, w = m.shape[-2:]
    n = _neighbor_count(h, w)
    ninv = omega * m / jnp.maximum(n, 1.0)

    def matvec(x):
        return (n * x - _nbsum(x)) * m

    def smooth(x, b, iters):
        for _ in range(iters):
            x = x + (b - matvec(x)) * ninv
        return x

    if level == len(masks) - 1:
        return smooth(jnp.zeros_like(r), r, 24)
    x = smooth(jnp.zeros_like(r), r, nu)
    rc = _restrict((r - matvec(x)) * 0.5) * masks[level + 1]
    xc = _vcycle(rc, masks, level + 1, nu, omega)
    x = x + _prolong(xc, (h, w)) * m
    return smooth(x, r, nu)


def _pcg_hole_solve(planes: jnp.ndarray, m: jnp.ndarray, keep: jnp.ndarray,
                    masks, max_iters: int, rtol: float) -> jnp.ndarray:
    """Flexible (Polak-Ribiere) CG with a V-cycle preconditioner.

    Same problem, stopping rule, and per-plane freeze semantics as
    :func:`_cg_hole_solve`; the V-cycle kills the low-frequency error
    modes whose elimination makes zero-init CG take O(hole-diameter)
    iterations, so the iteration count drops to O(10) independent of
    hole size. Flexible beta tolerates the cycle's mild asymmetry
    (masked transfers), keeping convergence safe.
    """
    h, w = planes.shape[-2:]
    b = _nbsum(planes * keep) * m
    n = _neighbor_count(h, w) * m

    def matvec(x):
        return (n * x - _nbsum(x)) * m

    sum2 = lambda v: jnp.sum(v * v, axis=(-2, -1), keepdims=True)
    dot = lambda a, c: jnp.sum(a * c, axis=(-2, -1), keepdims=True)
    tol2 = (rtol * rtol) * sum2(b)

    x0 = jnp.zeros_like(planes)
    z0 = _vcycle(b, masks)
    rz0 = dot(b, z0)
    rs0 = sum2(b)

    def cond(state):
        i, _, _, _, _, _, rs = state
        return jnp.logical_and(i < max_iters, jnp.any(rs > tol2))

    def body(state):
        i, x, r, z, p, rz, rs = state
        ap = matvec(p)
        denom = dot(p, ap)
        live = (rs > tol2).astype(jnp.float32)
        alpha = live * rz / jnp.where(denom > 0, denom, 1.0)
        x = x + alpha * p
        r_new = r - alpha * ap
        z_new = _vcycle(r_new, masks)
        rz_new = dot(r_new, z_new)
        # flexible beta: z'(r_new - r) instead of z'r_new — exact CG on
        # an SPD M, still convergent when M drifts slightly per iter
        beta = live * (rz_new - dot(r_new, z)) / jnp.where(rz > 0, rz, 1.0)
        p = z_new + beta * p
        return i + 1, x, r_new, z_new, p, rz_new, sum2(r_new)

    _, x, _, _, _, _, _ = lax.while_loop(
        cond, body, (jnp.int32(0), x0, b, z0, z0, rz0, rs0))
    return x


@partial(jax.jit, static_argnames=("max_iters", "levels"))
def laplace_fill_planes(planes: jnp.ndarray, hole: jnp.ndarray,
                        max_iters: int = 600,
                        rtol: float = 1e-6,
                        levels: int = 3) -> jnp.ndarray:
    """Laplace-fill the ``hole`` pixels of each plane.

    planes: [P, H, W] float; hole: [P, H, W] (bool or {0,1}); returns
    [P, H, W] float32 with hole pixels replaced by the Laplace solution
    and all other pixels bit-identical to the input (cast to f32).

    ``levels`` > 0 enables the multigrid-preconditioned CG (V-cycle
    depth = levels, capped by grid size); 0 falls back to plain CG.
    Both converge to ``rtol * ||b||`` per plane, so ``levels`` is a
    speed knob, not an accuracy knob: at the pipeline's 864x480 flow
    planes (48-plane batch, 120-px holes) the preconditioner cuts
    iterations 289 -> 22 and measured device time 0.605 -> 0.257 s
    (zero-init CG needs O(hole diameter) iterations, each moving the
    full plane batch through HBM; the V(1,1)-cycle costs ~5 fine
    matvecs but makes the iteration count hole-size-independent).
    """
    planes = planes.astype(jnp.float32)
    m = (hole > 0).astype(jnp.float32)
    keep = 1.0 - m
    if levels <= 0:
        x = _cg_hole_solve(planes, m, keep, jnp.zeros_like(planes),
                           max_iters, rtol)
    else:
        masks = _mask_pyramid(m, levels)
        x = _pcg_hole_solve(planes, m, keep, masks, max_iters, rtol)
    return planes * keep + x * m


def diffuse_flows_device(flows: jnp.ndarray, masks: jnp.ndarray,
                         max_iters: int = 600,
                         rtol: float = 1e-6) -> jnp.ndarray:
    """Diffusion-fill a stack of flows on device.

    flows: [T, H, W, 2] (any float dtype); masks: [T, H, W] or
    [T, H, W, 1]. Returns [T, H, W, 2] float32, the device twin of
    pipeline ``diffusion`` (host regionfill per frame/channel).
    """
    if masks.ndim == 4:
        masks = masks[..., 0]
    t, h, w, c = flows.shape
    planes = jnp.moveaxis(flows, -1, 1).reshape(t * c, h, w)
    hole = jnp.broadcast_to(masks[:, None], (t, c, h, w)).reshape(t * c, h, w)
    out = laplace_fill_planes(planes, hole, max_iters=max_iters, rtol=rtol)
    return jnp.moveaxis(out.reshape(t, c, h, w), 1, -1)
