"""Train-step tests: loss semantics, optimization progress, and dp-mesh
equivalence (8 virtual CPU devices vs single device on identical data)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fgt_tpu.models.discriminator import TemporalPatchGAN
from fgt_tpu.models.fgt import FGT, FGTConfig
from fgt_tpu.models.lafc import Model as LAFCModel
from fgt_tpu.parallel.mesh import make_mesh, put_batch, put_replicated
from fgt_tpu.train import losses
from fgt_tpu.train.fgt_step import (FGTLossWeights, GANTrainState,
                                    make_fgt_train_step, norm_flows_nhwc)
from fgt_tpu.train.lafc_step import make_lafc_train_step
from fgt_tpu.train.schedules import make_adam, warmup_step_decay


# ---------------- losses ----------------

def test_l1_normalized_matches_reference_formula():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 8, 2).astype(np.float32))
    y = jnp.asarray(rng.rand(2, 8, 8, 2).astype(np.float32))
    m = jnp.asarray((rng.rand(2, 8, 8, 1) > 0.5).astype(np.float32))
    val = losses.l1_normalized(x, y, m)
    expect = np.mean(np.abs(np.asarray(x * m) - np.asarray(y * m))) / \
        np.mean(np.asarray(m))
    np.testing.assert_allclose(float(val), expect, rtol=1e-6)


def test_adversarial_hinge():
    logits = jnp.asarray([[2.0], [-2.0]])
    # D on real: relu(1 - x) -> [0, 3] mean 1.5
    assert float(losses.adversarial_loss(logits, True, True)) == 1.5
    # D on fake: relu(1 + x) -> [3, 0] mean 1.5
    assert float(losses.adversarial_loss(logits, False, True)) == 1.5
    # G: -mean(x) = 0
    assert float(losses.adversarial_loss(logits, True, False)) == 0.0


def test_smoothness_prefers_constant_flow():
    # zero-padding creates border deltas even for constant flow (the
    # reference behaves identically and discards its boundary mask), so we
    # assert ordering rather than an absolute zero.
    m = jnp.ones((1, 16, 16, 1))
    const = jnp.ones((1, 16, 16, 2))
    noisy = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 2)
                        .astype(np.float32))
    assert (float(losses.smoothness_loss(const, m))
            < float(losses.smoothness_loss(noisy, m)))
    assert (float(losses.second_order_loss(const, m))
            < float(losses.second_order_loss(noisy, m)))


def test_ternary_loss_zero_when_warp_matches():
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    flow = jnp.zeros((1, 16, 16, 2))
    m = jnp.ones((1, 16, 16, 1))
    val = losses.ternary_loss(flow, flow, m, frame, frame)
    assert float(val) < 1e-6


def test_edge_accuracy_perfect():
    e = jnp.zeros((1, 8, 8, 1)).at[0, 2:4, 2:4].set(1.0)
    p, r = losses.edge_accuracy(e, e)
    assert float(p) == pytest.approx(1.0) and float(r) == pytest.approx(1.0)


def test_norm_flows_signed_max():
    f = np.zeros((1, 1, 2, 2, 2), np.float32)
    f[..., 0] = [[1.0, 2.0], [3.0, 4.0]]
    f[..., 1] = -1.0
    out = np.asarray(norm_flows_nhwc(jnp.asarray(f)))
    assert out[..., 0].max() == pytest.approx(1.0)
    # channel 1 max is -1 -> division by a negative max flips sign (quirk)
    assert out[..., 1].max() == pytest.approx(1.0)


# ---------------- schedules ----------------

def test_warmup_and_decay():
    sched = warmup_step_decay(1e-4, decay_interval=100, gamma=0.1,
                              warmup=10, world_size=1)
    assert float(sched(0)) == pytest.approx(1e-5)
    assert float(sched(50)) == pytest.approx(1e-4)
    assert float(sched(150)) == pytest.approx(1e-5)


# ---------------- LAFC step ----------------

LAFC_CFG = {"num_flows": 3, "cnum": 8, "in_channel": 3, "PASSMASK": 1,
            "use_residual": 1, "resBlocks": 0, "use_bias": 1,
            "conv_type": "vanilla"}


def _lafc_batch(b=2, t=3, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "flows": rng.randn(b, t, h, w, 2).astype(np.float32),
        "diffused_flows": rng.randn(b, t, h, w, 2).astype(np.float32),
        "masks": (rng.rand(b, t, h, w, 1) > 0.6).astype(np.float32),
        "edges": (rng.rand(b, h, w, 1) > 0.9).astype(np.float32),
        "current_frame": rng.rand(b, h, w, 3).astype(np.float32),
        "shift_frame": rng.rand(b, h, w, 3).astype(np.float32),
    }


def _init_lafc():
    model = LAFCModel(config=LAFC_CFG)
    b = _lafc_batch()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(b["flows"]),
                        jnp.asarray(b["masks"]))
    return model, params


@pytest.mark.heavy
def test_lafc_train_step_reduces_loss():
    model, params = _init_lafc()
    tx = make_adam(lambda s: 1e-3)
    step = make_lafc_train_step(model.apply, tx)
    opt_state = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in _lafc_batch().items()}
    first = None
    for i in range(5):
        params, opt_state, metrics = step(params, opt_state, batch)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.heavy
def test_lafc_step_dp_equivalence():
    """Gradient math on an 8-device dp mesh must equal single-device."""
    model, params = _init_lafc()
    tx = make_adam(lambda s: 1e-3)
    step = make_lafc_train_step(model.apply, tx)
    batch_np = _lafc_batch(b=8)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    p1, o1, m1 = step(params, tx.init(params), batch)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    params_r = put_replicated(mesh, params)
    opt_r = put_replicated(mesh, tx.init(params))
    batch_s = put_batch(mesh, {k: jnp.asarray(v) for k, v in batch_np.items()})
    p8, o8, m8 = step(params_r, opt_r, batch_s)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# ---------------- FGT GAN step ----------------

FGT_CFG_SMALL = FGTConfig(
    cnum=8, flow_cnum=8, frame_hidden=32, flow_hidden=16, num_blocks=2,
    num_heads=4, mlp_ratio=2, tw=2, sw=4, gd=2, input_resolution=(32, 32))


def _fgt_batch(b=2, t=2, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "frames": (rng.rand(b, t, h, w, 3).astype(np.float32) * 2 - 1),
        "masks": (rng.rand(b, t, h, w, 1) > 0.7).astype(np.float32),
        "flows": rng.randn(b, t, h, w, 2).astype(np.float32),
    }


def _init_fgt_gan():
    gen = FGT(FGT_CFG_SMALL)
    disc = TemporalPatchGAN(in_channels=3, dist_cnum=8)
    b = _fgt_batch()
    g_params = gen.init(jax.random.PRNGKey(0), jnp.asarray(b["frames"]),
                        jnp.asarray(b["flows"]), jnp.asarray(b["masks"]))
    d_vars = disc.init(jax.random.PRNGKey(1), jnp.asarray(b["frames"]))

    def g_apply(params, frames, flows, masks):
        return gen.apply(params, frames, flows, masks)

    def d_apply(variables, video, sn_update):
        if sn_update:
            out, mut = disc.apply(variables, video, sn_update=True,
                                  mutable=["spectral"])
            return out, mut["spectral"]
        return disc.apply(variables, video), variables["spectral"]

    return g_apply, d_apply, g_params, d_vars


@pytest.mark.heavy
def test_fgt_gan_step_runs_and_updates():
    g_apply, d_apply, g_params, d_vars = _init_fgt_gan()
    g_tx = make_adam(lambda s: 1e-4)
    d_tx = make_adam(lambda s: 1e-4)
    step = make_fgt_train_step(g_apply, d_apply, None, g_tx, d_tx)
    state = GANTrainState(
        g_params=g_params, d_params=d_vars["params"],
        d_spectral=d_vars["spectral"], g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_vars["params"]), step=jnp.zeros((), jnp.int32))
    batch = {k: jnp.asarray(v) for k, v in _fgt_batch().items()}
    before = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    for _ in range(2):
        state, metrics = step(state, batch, None)
    after = jax.tree_util.tree_leaves(state.g_params)[0]
    assert np.abs(np.asarray(after) - np.asarray(before)).max() > 0
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 2


@pytest.mark.heavy
def test_fgt_gan_step_dp_mesh():
    g_apply, d_apply, g_params, d_vars = _init_fgt_gan()
    g_tx = make_adam(lambda s: 1e-4)
    d_tx = make_adam(lambda s: 1e-4)
    step = make_fgt_train_step(g_apply, d_apply, None, g_tx, d_tx)
    mesh = make_mesh()
    state = GANTrainState(
        g_params=g_params, d_params=d_vars["params"],
        d_spectral=d_vars["spectral"], g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_vars["params"]), step=jnp.zeros((), jnp.int32))
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())), state)
    batch = put_batch(mesh, {k: jnp.asarray(v)
                             for k, v in _fgt_batch(b=8).items()})
    state, metrics = step(state, batch, None)
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["dis_loss"]))
