"""Legacy block library (ASPP, gated convs) vs torch reference math.

Pins the behavioral contract of FGT/models/utils/util.py:125-329 for the
flax ports in fgt_tpu/ops/legacy_blocks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fgt_tpu.ops.legacy_blocks import (ASPP, GatedConv2dWithActivation,
                                       GatedConv3d, GatedDeConv2dWithActivation,
                                       GatedDeconv3d, trunc_normal_init)


def test_aspp_shapes_and_branch_structure():
    m = ASPP(out_channels=16, rates=(1, 2, 4, 8))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 20, 8),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 16, 20, 16)  # dilated convs keep H, W
    # four branches of out/4 channels each
    assert sorted(params["params"].keys()) == [
        "conv00", "conv01", "conv02", "conv03"]
    assert params["params"]["conv00"]["kernel"].shape == (3, 3, 8, 4)


def test_gated_conv2d_matches_torch_math():
    rng = np.random.RandomState(1)
    x = rng.rand(1, 10, 12, 3).astype(np.float32)
    m = GatedConv2dWithActivation(6, kernel_size=3, padding=1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(params, jnp.asarray(x)))

    # same math in torch: leaky(conv(x)) * sigmoid(mask_conv(x))
    kw = np.asarray(params["params"]["conv"]["kernel"])      # HWIO
    km = np.asarray(params["params"]["mask_conv"]["kernel"])
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    f = F.conv2d(tx, torch.from_numpy(kw.transpose(3, 2, 0, 1)),
                 torch.from_numpy(np.asarray(params["params"]["conv"]["bias"])),
                 padding=1)
    g = F.conv2d(tx, torch.from_numpy(km.transpose(3, 2, 0, 1)),
                 torch.from_numpy(
                     np.asarray(params["params"]["mask_conv"]["bias"])),
                 padding=1)
    want = (F.leaky_relu(f, 0.2) * torch.sigmoid(g)).numpy()
    np.testing.assert_allclose(y.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_gated_deconv2d_upsamples():
    x = jnp.asarray(np.random.RandomState(2).rand(1, 8, 8, 4), jnp.float32)
    m = GatedDeConv2dWithActivation(2, 6, kernel_size=3, padding=1)
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (1, 16, 16, 6)


def test_gated_conv2d_spectral_norm_state():
    x = jnp.asarray(np.random.RandomState(3).rand(1, 8, 8, 4), jnp.float32)
    m = GatedConv2dWithActivation(6, kernel_size=3, padding=1,
                                  spectral_norm=True)
    variables = m.init(jax.random.PRNGKey(0), x)
    assert "spectral" in variables  # u/v power-iteration buffers exist
    y, mut = m.apply(variables, x, True, mutable=["spectral"])
    assert y.shape == (1, 8, 8, 6)
    # power iteration actually moved the u vector
    u0 = np.asarray(variables["spectral"]["conv"]["u"])
    u1 = np.asarray(mut["spectral"]["conv"]["u"])
    assert np.abs(u0 - u1).max() > 0


def test_gated_conv3d_and_deconv3d():
    x = jnp.asarray(np.random.RandomState(4).rand(1, 3, 8, 8, 4),
                    jnp.float32)
    m = GatedConv3d(6, kernel_size=3, padding=1)
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (1, 3, 8, 8, 6)

    d = GatedDeconv3d(2, 6, kernel_size=3, padding=1)
    dp = d.init(jax.random.PRNGKey(0), x)
    # temporal axis is NOT scaled (reference scales only H, W)
    assert d.apply(dp, x).shape == (1, 3, 16, 16, 6)


def test_trunc_normal_init_bounds():
    init = trunc_normal_init(std=0.5, a=-1.0, b=1.0)
    v = np.asarray(init(jax.random.PRNGKey(0), (2000,)))
    assert v.min() >= -1.0 and v.max() <= 1.0
    assert 0.3 < v.std() < 0.6
