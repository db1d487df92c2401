"""Fused flash attention (Pallas/TPU) for FGT's window attention.

The temporal attention (TMHSA) attends over sequences of
``t * (h/tw) * (w/tw)`` tokens — ~2.3k tokens per spatial group at
inference window sizes. XLA's naive attention materializes the
[*, L, L] score tensor in f32, which blows past HBM for batched
windows (14G temp at B=1, T=13). This kernel computes online-softmax
attention in VMEM tiles: scores never leave the chip, memory is O(L·ch)
instead of O(L^2).

Layout: q, k, v are [N, L, ch] with N = batch*groups*heads collapsed;
ch is the per-head width (128 for FGT's 512/4). L is padded to the
key/query block size internally; padded keys are masked to -inf before
the softmax, padded query rows are sliced away on return.

Reference semantics being fused: attention_base.py:61-66 (softmax(QK^T /
sqrt(ch)) V per spatial group across all window frames).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, kv_len: int, block_k: int):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                          # [BQ, CH]
    k = k_ref[0]                          # [BK, CH]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale     # [BQ, BK]

    key_idx = ik * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(key_idx < kv_len, s, NEG_INF)

    m_prev = m_scr[:]                     # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)       # [BQ, 1]
    l_new = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def flash_mhsa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
               scale: float, block_q: int = 512, block_k: int = 512,
               interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T * scale) v over [N, L, ch] sequences."""
    n, l, ch = q.shape
    bq = min(block_q, _round_up(l, 128))
    bk = min(block_k, _round_up(l, 128))
    lp_q = _round_up(l, bq)
    lp_k = _round_up(l, bk)

    def pad(x, lp):
        return jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))

    qp, kp, vp = pad(q, lp_q), pad(k, lp_k), pad(v, lp_k)

    grid = (n, lp_q // bq, lp_k // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=l, block_k=bk),
        out_shape=jax.ShapeDtypeStruct((n, lp_q, ch), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, ch), lambda i, iq, ik: (i, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, ch), lambda i, iq, ik: (i, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, ch), lambda i, iq, ik: (i, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, ch), lambda i, iq, ik: (i, iq, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, ch), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :l, :]


def flash_attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 scale: float) -> jnp.ndarray:
    """Drop-in for ops.attention._attend on [..., L, ch] operands.

    Collapses leading dims, runs the fused kernel (interpret mode off-TPU
    so CPU tests exercise identical math), restores the shape.
    """
    lead = q.shape[:-2]
    l, ch = q.shape[-2:]
    n = math.prod(lead) if lead else 1
    interpret = jax.default_backend() != "tpu"
    out = flash_mhsa(q.reshape(n, l, ch), k.reshape(n, l, ch),
                     v.reshape(n, l, ch), scale=scale, interpret=interpret)
    return out.reshape(*lead, l, ch)
