"""Tensor parallelism: Megatron-style head/hidden sharding of FGT.

The reference has no TP at all (SURVEY.md §2.4 — batch DDP is its only
scaling axis), so these tests pin a beyond-reference capability: param
shardings from ``fgt_tpu.parallel.partition`` must (a) actually split
the attention/FFN weights over the tp mesh axis, (b) produce forwards
identical to the replicated model, and (c) run the full GAN train step
on a (dp, tp) mesh with finite losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgt_tpu.models.fgt import FGT, FGTConfig
from fgt_tpu.parallel.mesh import make_mesh, put_batch, put_replicated
from fgt_tpu.parallel.partition import (FGT_TP_RULES, partition_specs,
                                        put_partitioned, tp_param_fraction)

pytestmark = pytest.mark.heavy  # jit-compiles the tiny FGT several times


def tiny_cfg():
    # mlp_ratio=4 -> fusion hidden 49*4=196, divisible by tp in {2, 4}
    return FGTConfig(cnum=8, flow_cnum=8, frame_hidden=32, flow_hidden=16,
                     num_blocks=4, num_heads=4, mlp_ratio=4, tw=2, sw=4,
                     gd=2, input_resolution=(32, 32))


@pytest.fixture(scope="module")
def fgt_setup():
    cfg = tiny_cfg()
    model = FGT(cfg)
    rng = np.random.RandomState(0)
    b, t, h, w = 8, 2, 32, 32  # b divisible by every dp size used below
    batch = {
        "frames": jnp.asarray(rng.rand(b, t, h, w, 3) * 2 - 1,
                              jnp.float32),
        "flows": jnp.asarray(rng.randn(b, t, h, w, 2), jnp.float32),
        "masks": jnp.asarray((rng.rand(b, t, h, w, 1) > 0.7),
                             jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["frames"],
                        batch["flows"], batch["masks"])
    return model, params, batch


def test_rules_shard_attention_and_ffn(fgt_setup):
    _, params, _ = fgt_setup
    mesh = make_mesh(tp=4)
    specs = partition_specs(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_path = {"/".join(str(getattr(p, "key", p)) for p in path): s
               for path, s in flat}
    qk = [s for p, s in by_path.items()
          if p.endswith("attention/query/kernel")]
    assert qk and all(tuple(s) == (None, "tp") for s in qk)
    ffn2 = [s for p, s in by_path.items() if p.endswith("ffn/conv2/kernel")]
    assert ffn2 and all(tuple(s) == ("tp", None) for s in ffn2)
    # conv weights stay replicated
    enc = [s for p, s in by_path.items()
           if "frame_encoder" in p and p.endswith("kernel")]
    assert enc and all(tuple(s) == () for s in enc)
    # a meaningful fraction of the transformer weights is actually sharded
    assert tp_param_fraction(mesh, params) > 0.3


def test_indivisible_shapes_fall_back_to_replication(fgt_setup):
    _, params, _ = fgt_setup
    mesh = make_mesh(tp=8)  # d_model 32 % 8 == 0, but hidden 196 % 8 != 0
    specs = partition_specs(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    hit = 0
    for path, s in flat:
        p = "/".join(str(getattr(pp, "key", pp)) for pp in path)
        if p.endswith("ffn/conv1/kernel"):  # (32, 196): 196 % 8 != 0
            assert tuple(s) == ()
            hit += 1
    assert hit > 0


def test_tp_forward_matches_replicated(fgt_setup):
    model, params, batch = fgt_setup
    mesh = make_mesh(dp=2, tp=4)

    def fwd(p, b):
        return model.apply(p, b["frames"], b["flows"], b["masks"])

    ref = jax.jit(fwd)(params, batch)

    p_tp = put_partitioned(mesh, params)
    # the q/k/v kernels must really be split over tp
    leaf = p_tp["params"]["first_t_transformer"]["attention"]["query"][
        "kernel"]
    shard_shapes = {tuple(s.data.shape) for s in leaf.addressable_shards}
    assert shard_shapes == {(32, 8)}, shard_shapes
    b_tp = put_batch(mesh, batch)
    out = jax.jit(fwd)(p_tp, b_tp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_gan_train_step_on_dp_tp_mesh(fgt_setup):
    from fgt_tpu.models.discriminator import TemporalPatchGAN
    from fgt_tpu.train.fgt_step import GANTrainState, make_fgt_train_step
    from fgt_tpu.train.schedules import make_adam

    model, params, batch = fgt_setup
    disc = TemporalPatchGAN(in_channels=3, dist_cnum=8)
    d_vars = disc.init(jax.random.PRNGKey(1), batch["frames"])

    def g_apply(p, frames, flows, masks):
        return model.apply(p, frames, flows, masks)

    def d_apply(variables, video, sn_update):
        if sn_update:
            out, mut = disc.apply(variables, video, sn_update=True,
                                  mutable=["spectral"])
            return out, mut["spectral"]
        return disc.apply(variables, video), variables["spectral"]

    g_tx, d_tx = make_adam(lambda s: 1e-4), make_adam(lambda s: 1e-4)
    # donate=False: params/d_vars feed both the dp and dp x tp runs
    step = make_fgt_train_step(g_apply, d_apply, None, g_tx, d_tx,
                               donate=False)

    def run(mesh, tp: bool):
        state = GANTrainState(
            g_params=params, d_params=d_vars["params"],
            d_spectral=d_vars["spectral"], g_opt=g_tx.init(params),
            d_opt=d_tx.init(d_vars["params"]),
            step=jnp.zeros((), jnp.int32))
        if tp:
            # same suffix rules partition params AND the Adam mu/nu trees
            state = state._replace(
                g_params=put_partitioned(mesh, state.g_params),
                g_opt=put_partitioned(mesh, state.g_opt),
                d_params=put_replicated(mesh, state.d_params),
                d_spectral=put_replicated(mesh, state.d_spectral),
                d_opt=put_replicated(mesh, state.d_opt),
                step=put_replicated(mesh, state.step))
        else:
            state = put_replicated(mesh, state)
        new_state, metrics = step(state, put_batch(mesh, batch), None)
        return new_state, {k: float(v) for k, v in metrics.items()}

    _, ref = run(make_mesh(dp=8, tp=1), tp=False)
    state_tp, got = run(make_mesh(dp=4, tp=2), tp=True)
    assert np.isfinite(got["gen_loss"]) and np.isfinite(got["dis_loss"])
    # same data, same math, different layout: losses must agree closely
    np.testing.assert_allclose(got["gen_loss"], ref["gen_loss"], rtol=1e-4)
    np.testing.assert_allclose(got["dis_loss"], ref["dis_loss"], rtol=1e-4)
    # updated generator params keep their tp sharding (no silent gather)
    leaf = state_tp.g_params["params"]["first_t_transformer"]["attention"][
        "query"]["kernel"]
    shapes = {tuple(s.data.shape) for s in leaf.addressable_shards}
    assert shapes == {(32, 16)}, shapes
