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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                  acc_scr, *, scale: float, kv_len: int, block_k: int):
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
        lse_ref[0] = m_scr[:] + jnp.log(l_scr[:])


def _flash_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dq_ref,
                     dq_scr, *, scale: float, kv_len: int, block_k: int):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]                      # [BQ, 1]
    dsum = dsum_ref[0]                    # [BQ, 1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    key_idx = ik * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(key_idx < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)                                 # [BQ, BK]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dsum) * scale
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                      dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float,
                      kv_len: int, block_k: int):
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]                      # [BQ, 1]
    dsum = dsum_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    key_idx = ik * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(key_idx < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)                                 # [BQ, BK]
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dsum) * scale
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _blocks(l: int, block_q: int, block_k: int):
    bq = min(block_q, _round_up(l, 128))
    bk = min(block_k, _round_up(l, 128))
    return bq, bk, _round_up(l, bq), _round_up(l, bk)


def _pad_l(x, lp, l):
    return jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))


def _q_spec(bq, ch):
    return pl.BlockSpec((1, bq, ch), lambda i, iq, ik: (i, iq, 0),
                        memory_space=pltpu.VMEM)


def _k_spec(bk, ch):
    return pl.BlockSpec((1, bk, ch), lambda i, iq, ik: (i, ik, 0),
                        memory_space=pltpu.VMEM)


def _row_spec(bq):
    # [N, L, 1] column vectors: last block dim 1 equals the array dim, the
    # sublane dim is the 8-divisible bq (TPU tiling constraint)
    return pl.BlockSpec((1, bq, 1), lambda i, iq, ik: (i, iq, 0),
                        memory_space=pltpu.VMEM)


def _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret):
    n, l, ch = q.shape
    bq, bk, lp_q, lp_k = _blocks(l, block_q, block_k)
    qp = _pad_l(q, lp_q, l)
    kp, vp = _pad_l(k, lp_k, l), _pad_l(v, lp_k, l)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=l, block_k=bk),
        out_shape=(jax.ShapeDtypeStruct((n, lp_q, ch), q.dtype),
                   jax.ShapeDtypeStruct((n, lp_q, 1), jnp.float32)),
        grid=(n, lp_q // bq, lp_k // bk),
        in_specs=[_q_spec(bq, ch), _k_spec(bk, ch), _k_spec(bk, ch)],
        out_specs=(_q_spec(bq, ch), _row_spec(bq)),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, ch), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core(q, k, v, scale, block_q, block_k, interpret):
    out, _ = _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret)
    return out


def _flash_core_fwd(q, k, v, scale, block_q, block_k, interpret):
    out, lse = _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_core_bwd(scale, block_q, block_k, interpret, res, dout):
    q, k, v, out, lse = res
    n, l, ch = q.shape
    bq, bk, lp_q, lp_k = _blocks(l, block_q, block_k)
    # dq kernel: 3 matmuls (s, dp, dq); dkv kernel: 4 (s, dv, dp, dk) —
    # 14 * N * Lq * Lk * ch MXU flops, invisible to XLA cost analysis
    from fgt_tpu.utils.costs import record_traced_flops

    record_traced_flops(14.0 * n * lp_q * lp_k * ch)
    qp = _pad_l(q, lp_q, l)
    kp, vp = _pad_l(k, lp_k, l), _pad_l(v, lp_k, l)
    # dout arrives at the kernel's padded shape (the unpad slice lives
    # outside the custom_vjp, so autodiff zero-pads the cotangent)
    dop = dout
    dsum = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1, keepdims=True)

    kern = dict(scale=scale, kv_len=l, block_k=bk)
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, **kern),
        out_shape=jax.ShapeDtypeStruct((n, lp_q, ch), q.dtype),
        grid=(n, lp_q // bq, lp_k // bk),
        in_specs=[_q_spec(bq, ch), _k_spec(bk, ch), _k_spec(bk, ch),
                  _q_spec(bq, ch), _row_spec(bq), _row_spec(bq)],
        out_specs=_q_spec(bq, ch),
        scratch_shapes=[pltpu.VMEM((bq, ch), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, dop, lse, dsum)

    # dk/dv: k-block outer, q-block inner (accumulate across queries)
    def kq(spec_b):
        return pl.BlockSpec((1, spec_b, ch), lambda i, ik, iq: (i, iq, 0),
                            memory_space=pltpu.VMEM)

    def kk(spec_b):
        return pl.BlockSpec((1, spec_b, ch), lambda i, ik, iq: (i, ik, 0),
                            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((1, bq, 1), lambda i, ik, iq: (i, iq, 0),
                       memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, **kern),
        out_shape=(jax.ShapeDtypeStruct((n, lp_k, ch), k.dtype),
                   jax.ShapeDtypeStruct((n, lp_k, ch), v.dtype)),
        grid=(n, lp_k // bk, lp_q // bq),
        in_specs=[kq(bq), kk(bk), kk(bk), kq(bq), row, row],
        out_specs=(kk(bk), kk(bk)),
        scratch_shapes=[pltpu.VMEM((bk, ch), jnp.float32),
                        pltpu.VMEM((bk, ch), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, dop, lse, dsum)
    return dq[:, :l], dk[:, :l], dv[:, :l]


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def flash_mhsa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
               scale: float, block_q: int = 512, block_k: int = 512,
               interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T * scale) v over [N, L, ch] sequences.

    Differentiable: the backward pass is a pair of Pallas kernels (dq and
    dk/dv) recomputing probabilities from the saved logsumexp — the
    standard flash-attention VJP, O(L*ch) memory in both directions.
    """
    l = q.shape[1]
    return _flash_core(q, k, v, scale, block_q, block_k, interpret)[:, :l]


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
    # analytic forward flops (qk^T + pv = 4*N*Lq*Lk*ch on padded tiles):
    # XLA cost analysis reports 0 for the Mosaic call, so the stage-level
    # cost ledger is credited here at trace time
    from fgt_tpu.utils.costs import record_traced_flops

    _, _, lp_q, lp_k = _blocks(l, 512, 512)
    record_traced_flops(4.0 * n * lp_q * lp_k * ch)
    out = flash_mhsa(q.reshape(n, l, ch), k.reshape(n, l, ch),
                     v.reshape(n, l, ch), scale=scale, interpret=interpret)
    return out.reshape(*lead, l, ch)
