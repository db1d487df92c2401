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


@partial(jax.jit, static_argnames=("max_iters",))
def laplace_fill_planes(planes: jnp.ndarray, hole: jnp.ndarray,
                        max_iters: int = 600,
                        rtol: float = 1e-6) -> jnp.ndarray:
    """Laplace-fill the ``hole`` pixels of each plane.

    planes: [P, H, W] float; hole: [P, H, W] (bool or {0,1}); returns
    [P, H, W] float32 with hole pixels replaced by the Laplace solution
    and all other pixels bit-identical to the input (cast to f32).
    """
    planes = planes.astype(jnp.float32)
    h, w = planes.shape[-2:]
    m = (hole > 0).astype(jnp.float32)
    keep = 1.0 - m
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

    x0 = jnp.zeros_like(planes)
    r0 = b
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
