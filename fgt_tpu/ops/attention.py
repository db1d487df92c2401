"""FGT attention modules: temporal window MHSA and flow-guided spatial MHSA.

TPU-first restructuring of the reference attention
(FGT/models/transformer_base/attention_base.py:25-106 and
attention_flow.py:25-171):

* All window partitioning is pure reshape/transpose, traced once per static
  (t, h, w); the reference's separate train/inference code paths collapse
  into one (JAX shapes are always static at trace time).
* The spatial attention's global key/value tokens are NOT repeated per
  window — the local-window and global contributions are contracted with a
  shared-key einsum, so the concatenated K/V never materializes. This is the
  main memory win over the reference (see SURVEY.md §7.3).
* Matmuls accumulate in float32 (``preferred_element_type``) so bf16 inputs
  still hit the MXU with a safe accumulator.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P


def _constrain(x: jnp.ndarray, axis: Optional[str], dim: int) -> jnp.ndarray:
    """Pin mesh axis ``axis`` onto tensor dim ``dim`` (sequence-parallel
    layout hints; requires an active mesh, e.g. ``jax.sharding.set_mesh``).
    No-op when ``axis`` is None."""
    if axis is None:
        return x
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(x, P(*spec))


def _pad_hw(x: jnp.ndarray, pad_b: int, pad_r: int) -> jnp.ndarray:
    if pad_b == 0 and pad_r == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))


def _attend(q, k, v, scale):
    # q: [..., Lq, ch], k: [..., Lk, ch], v: [..., Lk, ch]
    scores = jnp.einsum("...qc,...kc->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kc->...qc", probs, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class TMHSA(nn.Module):
    """Temporal multi-head self-attention over spatial groups.

    The (h, w) token grid is cut into ``group_size x group_size`` coarse
    cells; every cell attends across ALL t frames within itself
    (reference attention_base.py:76-106). Sequence length per cell is
    ``t * ceil(h/g) * ceil(w/g)``.
    """

    d_model: int
    group_size: int
    num_heads: int
    dropout: float = 0.0
    use_flash: bool = False   # fused Pallas attention (fwd + custom VJP)
    # Ulysses-style temporal sequence parallelism: mesh axis that shards
    # the folded (b*t) frame axis everywhere EXCEPT inside the attention
    # contraction, where an all-to-all (inserted by the SPMD partitioner
    # at the sharding-constraint boundary) re-scatters tokens full-length
    # per head subset. The reference has no analogue (SURVEY.md §5); its
    # temporal attention cost anchor is attention_base.py:61-66.
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: int, h: int, w: int,
                 deterministic: bool = True) -> jnp.ndarray:
        bt, n, c = x.shape
        x = _constrain(x, self.seq_axis, 0)
        assert n == h * w, f"token count {n} != {h}x{w}"
        b = bt // t
        g = self.group_size
        ch = c // self.num_heads
        # reference pad math (attention_base.py:29-34 / :44-50)
        wh, ww = math.ceil(h / g), math.ceil(w / g)
        pad_b = (wh - h % wh) % wh
        pad_r = (ww - w % ww) % ww
        new_h, new_w = h + pad_b, w + pad_r
        win_h, win_w = new_h // g, new_w // g

        xs = _pad_hw(x.reshape(bt, h, w, c), pad_b, pad_r)
        q = nn.Dense(c, name="query")(xs)
        k = nn.Dense(c, name="key")(xs)
        v = nn.Dense(c, name="value")(xs)

        def part(y):
            y = y.reshape(b, t, g, win_h, g, win_w, self.num_heads, ch)
            y = y.transpose(0, 2, 4, 6, 1, 3, 5, 7)
            y = y.reshape(b, g * g, self.num_heads, t * win_h * win_w, ch)
            # t-sharded -> head-sharded: the partitioner lowers this
            # re-layout to an all-to-all over seq_axis (Ulysses)
            return _constrain(y, self.seq_axis, 2)

        if self.use_flash:
            from fgt_tpu.ops.flash_attention import flash_attend

            att = flash_attend(part(q), part(k), part(v),
                               1.0 / math.sqrt(ch))
        else:
            att = _attend(part(q), part(k), part(v), 1.0 / math.sqrt(ch))
        att = _constrain(att, self.seq_axis, 2)
        att = att.reshape(b, g, g, self.num_heads, t, win_h, win_w, ch)
        att = att.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(bt, new_h, new_w, c)
        # head-sharded -> t-sharded for the FFN/conv trunk (all-to-all back)
        att = _constrain(att[:, :h, :w, :].reshape(bt, n, c),
                         self.seq_axis, 0)
        out = nn.Dense(c, name="out")(att)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class FlowGuidedSWMHSA(nn.Module):
    """Flow-guided shifted-window spatial attention with global tokens.

    Reference ``SWMHSA_depthGlobalWindowConcatLN_qkFlow_reweightFlow``
    (attention_flow.py:25-171):

    * flow features are gated by ``sigmoid(Dense(concat(x, f)))``;
    * q/k come from concat(frame, gated flow), v from the frame alone;
    * k and v are each [window tokens ++ global tokens], global tokens from a
      depthwise stride-``global_stride`` conv over the full (padded) map;
    * LayerNorm on q, k, v before the embedding Denses.

    We evaluate the local and global key blocks in one einsum pair instead of
    repeating global K/V per window.
    """

    d_model: int
    flow_d_model: int
    window_size: int
    global_stride: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, f: jnp.ndarray, h: int, w: int,
                 deterministic: bool = True) -> jnp.ndarray:
        bt, n, c = x.shape
        cf = f.shape[-1]
        ws = self.window_size
        heads = self.num_heads
        ch = c // heads
        pad_r = (ws - w % ws) % ws
        pad_b = (ws - h % ws) % ws
        new_h, new_w = h + pad_b, w + pad_r
        gh, gw = new_h // ws, new_w // ws

        xs = _pad_hw(x.reshape(bt, h, w, c), pad_b, pad_r)
        fs = _pad_hw(f.reshape(bt, h, w, cf), pad_b, pad_r)

        xf = jnp.concatenate([xs, fs], axis=-1)
        flow_w = nn.sigmoid(nn.Dense(cf, name="reweight")(xf))
        fs = fs * flow_w
        qk = jnp.concatenate([xs, fs], axis=-1)  # [bt, H, W, c+cf]
        qk_c = c + cf

        # global tokens: depthwise stride-gd convs on padded maps
        k_global = ConvDepthwise(qk_c, self.global_stride, name="global_k")(qk)
        v_global = ConvDepthwise(c, self.global_stride, name="global_v")(xs)
        k_global = k_global.reshape(bt, -1, qk_c)
        v_global = v_global.reshape(bt, -1, c)

        def windows(y, cc):
            y = y.reshape(bt, gh, ws, gw, ws, cc)
            y = y.transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(bt, gh * gw, ws * ws, cc)

        q_win = windows(qk, qk_c)
        x_win = windows(xs, c)

        q_norm = nn.LayerNorm(name="q_norm")
        k_norm = nn.LayerNorm(name="k_norm")
        v_norm = nn.LayerNorm(name="v_norm")
        q_emb = nn.Dense(c, name="query")
        k_emb = nn.Dense(c, name="key")
        v_emb = nn.Dense(c, name="value")

        q = q_emb(q_norm(q_win))                       # [bt, nw, ws2, c]
        k_loc = k_emb(k_norm(q_win))                   # local keys == windowed qk
        k_glo = k_emb(k_norm(k_global))                # [bt, kg, c]
        v_loc = v_emb(v_norm(x_win))
        v_glo = v_emb(v_norm(v_global))

        def heads_of(y, *lead):
            return y.reshape(*lead, heads, ch)

        q = heads_of(q, bt, gh * gw, ws * ws)
        k_loc = heads_of(k_loc, bt, gh * gw, ws * ws)
        k_glo = heads_of(k_glo, bt, -1)
        v_loc = heads_of(v_loc, bt, gh * gw, ws * ws)
        v_glo = heads_of(v_glo, bt, -1)

        scale = 1.0 / math.sqrt(ch)
        s_loc = jnp.einsum("bwqhc,bwkhc->bwhqk", q, k_loc,
                           preferred_element_type=jnp.float32) * scale
        s_glo = jnp.einsum("bwqhc,bkhc->bwhqk", q, k_glo,
                           preferred_element_type=jnp.float32) * scale
        scores = jnp.concatenate([s_loc, s_glo], axis=-1)
        probs = nn.softmax(scores, axis=-1)
        nloc = ws * ws
        att = (jnp.einsum("bwhqk,bwkhc->bwqhc", probs[..., :nloc],
                          v_loc.astype(jnp.float32))
               + jnp.einsum("bwhqk,bkhc->bwqhc", probs[..., nloc:],
                            v_glo.astype(jnp.float32))).astype(x.dtype)

        att = att.reshape(bt, gh, gw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        att = att.reshape(bt, new_h, new_w, c)[:, :h, :w, :].reshape(bt, n, c)
        out = nn.Dense(c, name="out")(att)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class ConvDepthwise(nn.Module):
    """Depthwise conv with kernel == stride (non-overlapping pooling-style
    token extraction; reference global_extract_k/v, attention_flow.py:44-48)."""

    features: int
    stride: int

    @nn.compact
    def __call__(self, x):
        from fgt_tpu.ops.conv_blocks import ConvND

        return ConvND(self.features, (self.stride, self.stride),
                      strides=self.stride, padding=0, groups=self.features,
                      name="conv")(x)
