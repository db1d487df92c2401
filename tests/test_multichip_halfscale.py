"""Half-scale multichip EXECUTION test (round-3 verdict #7).

The full-scale tp audit (tests/test_tp_fullscale_audit.py) proves the
sharding specs via ``jax.eval_shape`` without executing a FLOP; the
toy-shape dryrun (__graft_entry__.py) executes but at 32x32/2-block
scale. This test closes the gap: the REAL dp x tp x sp GAN train step
runs on the 8-device CPU mesh at ~half reference scale (4 blocks,
120x216, cnum 32, frame_hidden 256, mlp_ratio 40 — the FLOP-dominant
FusionFFN shape kept at the reference ratio) and must match the
unsharded single-device step numerically.

Match: /root/reference/FGT/trainer.py:33-45 (DDP world launch),
FGT/config/train.yaml:58-90 (the dims being halved).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgt_tpu.models.discriminator import TemporalPatchGAN
from fgt_tpu.models.fgt import FGT, FGTConfig
from fgt_tpu.parallel.mesh import make_mesh, put_batch, put_replicated
from fgt_tpu.parallel.partition import put_partitioned, tp_param_fraction
from fgt_tpu.train.fgt_step import GANTrainState, make_fgt_train_step
from fgt_tpu.train.schedules import make_adam

B, T, H, W = 2, 4, 120, 216

HALF_CFG = dict(
    cnum=32, flow_cnum=32, frame_hidden=256, flow_hidden=128,
    num_blocks=4, num_heads=4, mlp_ratio=40, tw=2, sw=8, gd=4,
    input_resolution=(H, W))


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "frames": (rng.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1),
        "masks": (rng.rand(B, T, H, W, 1) > 0.8).astype(np.float32),
        "flows": rng.randn(B, T, H, W, 2).astype(np.float32) * 0.5,
    }


def _make_step(gen, disc):
    def g_apply(params, frames, flows, masks):
        return gen.apply(params, frames, flows, masks)

    def d_apply(variables, video, sn_update):
        if sn_update:
            out, mut = disc.apply(variables, video, sn_update=True,
                                  mutable=["spectral"])
            return out, mut["spectral"]
        return disc.apply(variables, video), variables["spectral"]

    g_tx = make_adam(lambda s: 1e-4)
    d_tx = make_adam(lambda s: 1e-4)
    # donate=False: the same initial state feeds both runs
    step = make_fgt_train_step(g_apply, d_apply, None, g_tx, d_tx,
                               donate=False)
    return step, g_tx, d_tx


def _init_state(gen, disc, g_tx, d_tx, batch):
    g_params = jax.jit(gen.init)(jax.random.PRNGKey(0),
                                 jnp.asarray(batch["frames"]),
                                 jnp.asarray(batch["flows"]),
                                 jnp.asarray(batch["masks"]))
    d_vars = jax.jit(disc.init)(jax.random.PRNGKey(1),
                                jnp.asarray(batch["frames"]))
    return GANTrainState(
        g_params=g_params, d_params=d_vars["params"],
        d_spectral=d_vars["spectral"], g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_vars["params"]), step=jnp.zeros((), jnp.int32))


@pytest.mark.heavy
def test_halfscale_dp_tp_sp_step_matches_unsharded():
    batch_np = _batch()
    disc = TemporalPatchGAN(in_channels=3, dist_cnum=16)

    # --- unsharded single-device run ---
    gen1 = FGT(FGTConfig(**HALF_CFG))
    step1, g_tx, d_tx = _make_step(gen1, disc)
    state1 = _init_state(gen1, disc, g_tx, d_tx, batch_np)
    host0 = jax.device_get(state1)        # identical init for both runs
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, m1 = step1(state1, batch1, None)
    m1 = jax.device_get(m1)

    # --- dp=2 x tp=2 x sp=2 mesh run from the SAME init ---
    mesh = make_mesh(dp=2, tp=2, sp=2, devices=jax.devices()[:8])
    gen8 = FGT(FGTConfig(**HALF_CFG, seq_axis="sp"))
    step8, _, _ = _make_step(gen8, disc)
    with jax.sharding.set_mesh(mesh):
        state8 = GANTrainState(
            g_params=put_partitioned(mesh, host0.g_params),
            g_opt=put_partitioned(mesh, host0.g_opt),
            d_params=put_replicated(mesh, host0.d_params),
            d_spectral=put_replicated(mesh, host0.d_spectral),
            d_opt=put_replicated(mesh, host0.d_opt),
            step=put_replicated(mesh, host0.step))
        batch8 = put_batch(mesh, {k: jnp.asarray(v)
                                  for k, v in batch_np.items()})
        state8, m8 = step8(state8, batch8, None)
        m8 = jax.device_get(m8)

        # the Megatron rules must actually shard the big params at this
        # scale (mlp_ratio-40 FusionFFN dominates)
        frac = tp_param_fraction(mesh, host0.g_params)
    assert frac > 0.5, f"tp-sharded param fraction {frac:.2f}"

    # loss scalars: tp/sp reassociate matmul + collective reductions, so
    # exact equality is not expected — but f32 end-to-end keeps it tight
    for k in ("gen_loss", "dis_loss", "l1_masked", "l1_valid"):
        np.testing.assert_allclose(float(m1[k]), float(m8[k]),
                                   rtol=2e-4, atol=2e-5), k

    # updated generator params agree leaf-by-leaf. Tolerance note: Adam
    # divides by sqrt(v)+eps, so where a gradient entry is ~0 the tp/sp
    # collective reassociation noise is amplified to ~1e-4 in the update
    # (observed: 1 of 36864 elements at 1.1e-4 with atol 5e-5) — 5e-4
    # still catches any real sharding bug (wrong shard, missing psum)
    # which shows as O(1) relative error.
    l1 = jax.tree_util.tree_leaves(jax.device_get(state1.g_params))
    l8 = jax.tree_util.tree_leaves(jax.device_get(state8.g_params))
    assert len(l1) == len(l8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)
