import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgt_tpu.models.discriminator import TemporalPatchGAN
from fgt_tpu.models.fgt import FGT, FGTConfig
from fgt_tpu.models.lafc import LAFCConfig, Model as LAFCModel
from fgt_tpu.models.lafc_single import Model as LAFCSingleModel


SMALL_FGT = FGTConfig(
    cnum=16, flow_cnum=16, frame_hidden=64, flow_hidden=32, num_blocks=4,
    num_heads=4, mlp_ratio=2, tw=2, sw=4, gd=2, input_resolution=(48, 48))


@pytest.mark.heavy
def test_fgt_forward_shapes():
    b, t, h, w = 1, 3, 48, 48
    frames = jnp.zeros((b, t, h, w, 3))
    flows = jnp.zeros((b, t, h, w, 2))
    masks = jnp.zeros((b, t, h, w, 1))
    model = FGT(SMALL_FGT)
    params = model.init(jax.random.PRNGKey(0), frames, flows, masks)
    out = model.apply(params, frames, flows, masks)
    assert out.shape == (b, t, h, w, 3)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh range


@pytest.mark.heavy
def test_fgt_nondivisible_resolution():
    # 60x76 -> token grid not divisible by windows: pad paths must work
    b, t, h, w = 1, 2, 60, 76
    frames = jnp.zeros((b, t, h, w, 3))
    flows = jnp.zeros((b, t, h, w, 2))
    masks = jnp.zeros((b, t, h, w, 1))
    model = FGT(SMALL_FGT)
    params = model.init(jax.random.PRNGKey(0), frames, flows, masks)
    out = model.apply(params, frames, flows, masks)
    assert out.shape == (b, t, h, w, 3)


def test_fgt_param_count_at_reference_scale():
    # reference-scale config should build (no forward; just param shapes)
    cfg = FGTConfig()
    model = FGT(cfg)
    frames = jnp.zeros((1, 2, 240, 432, 3))
    flows = jnp.zeros((1, 2, 240, 432, 2))
    masks = jnp.zeros((1, 2, 240, 432, 1))
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), frames, flows, masks))
    n = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    # reference FGT is ~40-60M params (8 blocks, hidden 512, mlp_ratio 40)
    assert 20e6 < n < 120e6


def test_discriminator_shapes():
    x = jnp.zeros((2, 5, 64, 64, 3))
    d = TemporalPatchGAN(in_channels=3, dist_cnum=8)
    variables = d.init(jax.random.PRNGKey(0), x)
    y = d.apply(variables, x)
    assert y.shape[0] == 2 and y.shape[1] == 5  # stride (1,2,2) keeps T
    assert y.shape[2] == 1 and y.shape[3] == 1  # 64 / 2^6 = 1
    # spectral state exists for the first five convs
    assert "spectral" in variables
    assert len(variables["spectral"]) == 5


def test_discriminator_spectral_update_changes_state():
    x = jnp.asarray(np.random.randn(1, 3, 32, 32, 3).astype(np.float32))
    d = TemporalPatchGAN(in_channels=3, dist_cnum=8)
    variables = d.init(jax.random.PRNGKey(0), x)
    _, mutated = d.apply(variables, x, sn_update=True, mutable=["spectral"])
    before = jax.tree_util.tree_leaves(variables["spectral"])
    after = jax.tree_util.tree_leaves(mutated["spectral"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-7
               for a, b in zip(after, before))


def test_lafc_forward_shapes():
    cfg = {"num_flows": 3, "cnum": 16, "in_channel": 3, "PASSMASK": 1,
           "use_residual": 1, "resBlocks": 1, "use_bias": 1,
           "conv_type": "vanilla", "init_weights": 1}
    m = LAFCModel(config=cfg)
    flows = jnp.zeros((2, 3, 64, 64, 2))
    masks = jnp.zeros((2, 3, 64, 64, 1))
    params = m.init(jax.random.PRNGKey(0), flows, masks)
    flow, edge = m.apply(params, flows, masks)
    assert flow.shape == (2, 64, 64, 2)
    assert edge.shape == (2, 64, 64, 1)
    e = np.asarray(edge)
    assert e.min() >= 0 and e.max() <= 1


def test_lafc_single_forward_shapes():
    cfg = {"num_flows": 1, "cnum": 16, "in_channel": 3, "PASSMASK": 1,
           "use_residual": 1, "resBlocks": 1, "use_bias": 1,
           "conv_type": "vanilla"}
    m = LAFCSingleModel(config=cfg)
    flow = jnp.zeros((2, 32, 32, 2))
    mask = jnp.zeros((2, 32, 32, 1))
    params = m.init(jax.random.PRNGKey(0), flow, mask)
    out, edge = m.apply(params, flow, mask)
    assert out.shape == (2, 32, 32, 2)
    assert edge.shape == (2, 32, 32, 1)


def test_lafc_gated_conv_type():
    cfg = {"num_flows": 3, "cnum": 8, "in_channel": 3, "PASSMASK": 1,
           "use_residual": 1, "resBlocks": 0, "use_bias": 1,
           "conv_type": "gated"}
    m = LAFCModel(config=cfg)
    flows = jnp.zeros((1, 3, 32, 32, 2))
    masks = jnp.zeros((1, 3, 32, 32, 1))
    params = m.init(jax.random.PRNGKey(0), flows, masks)
    flow, edge = m.apply(params, flows, masks)
    assert flow.shape == (1, 32, 32, 2)
