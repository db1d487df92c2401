import jax.numpy as jnp
import numpy as np

from fgt_tpu.core import warp


def test_image_warp_zero_flow_identity():
    img = jnp.asarray(np.random.rand(2, 16, 20, 3).astype(np.float32))
    flow = jnp.zeros((2, 16, 20, 2), dtype=jnp.float32)
    out = warp.image_warp(img, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_image_warp_integer_shift():
    img = np.zeros((1, 8, 8, 1), dtype=np.float32)
    img[0, 3, 4, 0] = 1.0
    # flow u=+1: out[y, x] = img[y, x+1] -> the bright pixel moves left
    flow = np.zeros((1, 8, 8, 2), dtype=np.float32)
    flow[..., 0] = 1.0
    out = np.asarray(warp.image_warp(jnp.asarray(img), jnp.asarray(flow)))
    assert out[0, 3, 3, 0] == 1.0
    assert out[0, 3, 4, 0] == 0.0


def test_image_warp_out_of_bounds_zero():
    img = jnp.ones((1, 8, 8, 1), dtype=jnp.float32)
    flow = jnp.full((1, 8, 8, 2), 100.0, dtype=jnp.float32)
    out = np.asarray(warp.image_warp(img, flow))
    np.testing.assert_allclose(out, 0.0)


def test_bilinear_sampler_midpoint():
    img = np.zeros((1, 4, 4, 1), dtype=np.float32)
    img[0, 1, 1, 0] = 1.0
    img[0, 1, 2, 0] = 3.0
    coords = jnp.asarray([[[1.5, 1.0]]], dtype=jnp.float32)  # (x, y)
    out = np.asarray(warp.bilinear_sampler(jnp.asarray(img), coords))
    np.testing.assert_allclose(out[0, 0, 0], 2.0, atol=1e-6)


def test_reverse_flow_of_uniform_shift():
    # a uniform shift's inverse is (approximately) the negative shift
    flow = np.zeros((1, 16, 16, 2), dtype=np.float32)
    flow[..., 0] = 2.0
    rev = np.asarray(warp.reverse_flow(jnp.asarray(flow)))
    interior = rev[0, 4:12, 4:12]
    np.testing.assert_allclose(interior[..., 0], -2.0, atol=1e-3)
    np.testing.assert_allclose(interior[..., 1], 0.0, atol=1e-3)
