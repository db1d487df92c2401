"""Temporal sequence parallelism (Ulysses head-scatter) equivalence.

``FGTConfig.seq_axis`` shards the folded (b*t) frame axis over an ``sp``
mesh axis through the whole conv/FFN trunk; inside TMHSA the sharding
constraint flips to the head axis, which the SPMD partitioner lowers to
an all-to-all (tokens become full-length per head subset) — the JAX/XLA
equivalent of DeepSpeed-Ulysses. The reference has no analogue (its
temporal attention cost anchor is
FGT/models/transformer_base/attention_base.py:61-66; scaling there is
DDP-only). These tests pin numerical equivalence with the unsharded
model and that the sharding actually propagates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgt_tpu.models.fgt import FGT, FGTConfig
from fgt_tpu.parallel.mesh import make_mesh

TINY = dict(
    in_channel=4, cnum=8, flow_in_channel=2, flow_cnum=8,
    frame_hidden=32, flow_hidden=16, num_blocks=2, num_heads=4,
    mlp_ratio=2, tw=2, sw=4, gd=2, input_resolution=(64, 64),
)


def _data(b, t, h, w, seed=0):
    rng = np.random.RandomState(seed)
    frames = jnp.asarray(rng.rand(b, t, h, w, 3) * 2 - 1, jnp.float32)
    flows = jnp.asarray(rng.randn(b, t, h, w, 2) * 0.1, jnp.float32)
    masks = jnp.zeros((b, t, h, w, 1), jnp.float32)
    masks = masks.at[:, :, 24:40, 24:40].set(1.0)
    return frames * (1 - masks), flows, masks


@pytest.mark.slow
def test_seq_parallel_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    b, t, h, w = 1, 4, 64, 64
    frames, flows, masks = _data(b, t, h, w)

    ref_model = FGT(FGTConfig(**TINY))
    params = jax.jit(ref_model.init)(jax.random.PRNGKey(0), frames, flows,
                                     masks)
    expect = np.asarray(jax.jit(ref_model.apply)(params, frames, flows,
                                                 masks))

    sp_model = FGT(FGTConfig(**TINY, seq_axis="sp"))
    mesh = make_mesh(dp=1, tp=2, sp=4,
                     devices=np.array(jax.devices()[:8]))
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(jax.jit(sp_model.apply)(params, frames, flows,
                                                 masks))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_seq_parallel_shards_trunk_activations():
    """The compiled sp program must really distribute the frame axis: its
    output sharding and per-device HLO should reflect the sp mesh (no
    silent all-replicated fallback)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    b, t, h, w = 2, 4, 64, 64
    frames, flows, masks = _data(b, t, h, w, seed=1)
    sp_model = FGT(FGTConfig(**TINY, seq_axis="sp"))
    mesh = make_mesh(dp=1, tp=1, sp=8,
                     devices=np.array(jax.devices()[:8]))
    with jax.sharding.set_mesh(mesh):
        params = jax.jit(sp_model.init)(jax.random.PRNGKey(0), frames,
                                        flows, masks)
        lowered = jax.jit(sp_model.apply).lower(params, frames, flows,
                                                masks)
        hlo = lowered.compile().as_text()
    # the partitioner must emit a cross-device re-layout (all-to-all, or
    # its collective-permute decomposition) for the head scatter
    assert ("all-to-all" in hlo) or ("collective-permute" in hlo), \
        "no cross-device collective in the sp-sharded FGT program"
