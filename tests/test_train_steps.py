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
    # donate=False: params are reused for the replicated-vs-mesh comparison
    step = make_lafc_train_step(model.apply, tx, donate=False)
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


# ---------------- mixed precision (bf16 compute) ----------------


@pytest.mark.heavy
def test_lafc_step_bf16_compute_learns_params_stay_f32():
    """compute_dtype=bf16 runs the model in reduced precision but params,
    optimizer state and losses remain f32; loss still decreases and stays
    close in direction to the f32 trajectory."""
    model, params = _init_lafc()
    tx = make_adam(lambda s: 1e-3)
    step = make_lafc_train_step(model.apply, tx,
                                compute_dtype=jnp.bfloat16)
    opt_state = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in _lafc_batch().items()}
    first = None
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, batch)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
    assert metrics["loss"].dtype == jnp.float32


@pytest.mark.heavy
def test_fgt_gan_step_bf16_compute():
    g_apply, d_apply, g_params, d_vars = _init_fgt_gan()
    g_tx = make_adam(lambda s: 1e-4)
    d_tx = make_adam(lambda s: 1e-4)
    step = make_fgt_train_step(g_apply, d_apply, None, g_tx, d_tx,
                               compute_dtype=jnp.bfloat16)
    state = GANTrainState(
        g_params=g_params, d_params=d_vars["params"],
        d_spectral=d_vars["spectral"], g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_vars["params"]), step=jnp.zeros((), jnp.int32))
    batch = {k: jnp.asarray(v) for k, v in _fgt_batch().items()}
    for _ in range(2):
        state, metrics = step(state, batch, None)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    for leaf in jax.tree_util.tree_leaves(state.g_params):
        assert leaf.dtype == jnp.float32
    # D stays f32 (spectral power-iteration state untouched by the cast)
    for leaf in jax.tree_util.tree_leaves(state.d_spectral):
        assert leaf.dtype == jnp.float32


@pytest.mark.heavy
def test_fgt_gan_step_single_forward_equivalence():
    """The production step runs ONE generator forward (jax.vjp residual
    reuse). It must match the naive two-forward formulation (fake for the
    D update recomputed independently of the G grad) — same D-first /
    G-vs-updated-D ordering as the reference (network.py:133-157)."""
    import optax

    from fgt_tpu.train import losses as L
    from fgt_tpu.train.fgt_step import FGTLossWeights, norm_flows_nhwc

    g_apply, d_apply, g_params, d_vars = _init_fgt_gan()
    g_tx = make_adam(lambda s: 1e-4)
    d_tx = make_adam(lambda s: 1e-4)
    w = FGTLossWeights()

    def two_pass_step(state, batch):
        frames, masks = batch["frames"], batch["masks"]
        flows = norm_flows_nhwc(batch["flows"])
        masked = frames * (1 - masks)

        def d_loss_fn(d_params, d_spectral, real, fake):
            lr_, spec = d_apply({"params": d_params, "spectral": d_spectral},
                                real, sn_update=True)
            loss_r = L.adversarial_loss(lr_, True, True, w.gan_kind)
            lf_, spec = d_apply({"params": d_params, "spectral": spec},
                                jax.lax.stop_gradient(fake), sn_update=True)
            loss_f = L.adversarial_loss(lf_, False, True, w.gan_kind)
            return (loss_r + loss_f) / 2.0, spec

        def g_loss_fn(g_params, d_params, spec):
            filled = g_apply(g_params, masked, flows, masks)
            comp = filled * masks + frames * (1 - masks)
            logits, _ = d_apply({"params": d_params, "spectral": spec},
                                comp, sn_update=False)
            gan = L.adversarial_loss(logits, True, False, w.gan_kind)
            l1v = L.l1_normalized(filled, frames, 1 - masks)
            l1m = L.l1_normalized(filled, frames, masks)
            return l1v * w.L1M + l1m * w.L1V + gan * w.adv

        filled = g_apply(state.g_params, masked, flows, masks)
        fake = jax.lax.stop_gradient(filled * masks + frames * (1 - masks))
        (dl, spec), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, state.d_spectral, frames, fake)
        d_up, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_up)
        gl, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params,
                                                    d_params, spec)
        g_up, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_up)
        return GANTrainState(g_params, d_params, spec, g_opt, d_opt,
                             state.step + 1), dl, gl

    # donate=False: state0 is fed to both formulations
    step = make_fgt_train_step(g_apply, d_apply, None, g_tx, d_tx, w,
                               donate=False)
    state0 = GANTrainState(
        g_params=g_params, d_params=d_vars["params"],
        d_spectral=d_vars["spectral"], g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_vars["params"]), step=jnp.zeros((), jnp.int32))
    batch = {k: jnp.asarray(v) for k, v in _fgt_batch().items()}

    s1, m = step(state0, batch, None)
    s2, dl2, gl2 = jax.jit(two_pass_step)(state0, batch)

    assert np.allclose(float(m["dis_loss"]), float(dl2), rtol=1e-5)
    assert np.allclose(float(m["gen_loss"]), float(gl2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                    jax.tree_util.tree_leaves(s2.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
