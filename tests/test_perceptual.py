"""VGG19 perceptual/style losses: trunk shape, loss semantics, converter."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from fgt_tpu.train.perceptual import (VGG19Features,
                                      convert_vgg19_checkpoint,
                                      perceptual_loss, style_loss)

pytestmark = pytest.mark.heavy  # VGG19 compile bound


def _setup():
    model = VGG19Features()
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_vgg_taps_shapes():
    model, params = _setup()
    taps = model.apply(params, jnp.zeros((2, 64, 64, 3)))
    assert [t.shape for t in taps] == [
        (2, 64, 64, 64), (2, 32, 32, 128), (2, 16, 16, 256),
        (2, 8, 8, 512), (2, 4, 4, 512)]


def test_losses_zero_on_identical_and_positive_otherwise():
    model, params = _setup()
    apply_fn = lambda p, x: model.apply(p, x)  # noqa: E731
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    assert float(perceptual_loss(apply_fn, params, a, a)) < 1e-6
    assert float(style_loss(apply_fn, params, a, a)) < 1e-6
    assert float(perceptual_loss(apply_fn, params, a, b)) > 0
    assert float(style_loss(apply_fn, params, a, b)) > 0


def test_vgg_converter_roundtrip():
    model, params = _setup()
    # synthetic torchvision-style features state_dict
    torch_ids = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    rng = np.random.RandomState(1)
    state = {}
    widths = [64, 64, 128, 128] + [256] * 4 + [512] * 8
    in_w = [3, 64, 64, 128, 128] + [256] * 4 + [512] * 7
    for i, tid in enumerate(torch_ids):
        state[f"{tid}.weight"] = rng.randn(
            widths[i], in_w[i], 3, 3).astype(np.float32) * 0.01
        state[f"{tid}.bias"] = np.zeros(widths[i], np.float32)
    out = convert_vgg19_checkpoint(state, params)
    got = np.asarray(out["params"]["conv3"]["kernel"])
    want = state["7.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want)
    taps = model.apply(out, jnp.ones((1, 64, 64, 3)) * 0.5)
    assert np.isfinite(np.asarray(taps[-1])).all()
