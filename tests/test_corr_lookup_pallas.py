"""Pallas corr-pyramid lookup vs the XLA one-hot einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgt_tpu.models.raft import lookup_corr_pyramid
from fgt_tpu.ops.corr_lookup_pallas import lookup_corr_pyramid_pallas


def _data(B=2, H=12, W=20, levels=4, seed=0):
    rng = np.random.RandomState(seed)
    N = B * H * W
    pyr = [jnp.asarray(rng.randn(N, max(H // 2 ** i, 1),
                                 max(W // 2 ** i, 1)).astype(np.float32))
           for i in range(levels)]
    # coords deliberately run outside the volume to hit zero-padding
    coords = jnp.asarray(
        (rng.rand(B, H, W, 2) * [[W + 6, H + 6]] - 3).astype(np.float32))
    return pyr, coords


def test_matches_xla_lookup_bitexact():
    pyr, coords = _data()
    ref = np.asarray(lookup_corr_pyramid(pyr, coords, 4))
    got = np.asarray(lookup_corr_pyramid_pallas(pyr, coords, 4))
    np.testing.assert_array_equal(got, ref)


def test_non_divisible_n_is_padded():
    # B*H*W = 1*5*7 = 35, far from the 64-pixel block size
    pyr, coords = _data(B=1, H=5, W=7, levels=2, seed=1)
    ref = np.asarray(lookup_corr_pyramid(pyr, coords, 2))
    got = np.asarray(lookup_corr_pyramid_pallas(pyr, coords, 2))
    np.testing.assert_array_equal(got, ref)


def test_integer_coords_hit_exact_values():
    rng = np.random.RandomState(2)
    B, H, W = 1, 8, 16
    N = B * H * W
    vol = jnp.asarray(rng.randn(N, H, W).astype(np.float32))
    coords = jnp.asarray(
        np.stack(np.meshgrid(np.arange(W), np.arange(H), indexing="xy"),
                 -1)[None].astype(np.float32))
    out = np.asarray(lookup_corr_pyramid_pallas([vol], coords, 1))
    # center tap (dx=0, dy=0) of pixel (y, x) is vol[n, y, x]
    center = out.reshape(N, 3, 3)[:, 1, 1]
    want = np.asarray(vol)[np.arange(N),
                           np.repeat(np.arange(H), W),
                           np.tile(np.arange(W), H)]
    np.testing.assert_allclose(center, want, rtol=1e-6)


@pytest.mark.heavy
def test_raft_forward_with_pallas_lookup_matches():
    from fgt_tpu.models.raft import RAFT, RAFTConfig

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    b = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    m1 = RAFT(RAFTConfig(iters=3))
    m2 = RAFT(RAFTConfig(iters=3, pallas_lookup=True))
    v = jax.jit(lambda: m1.init(jax.random.PRNGKey(0), a, b, iters=1))()
    f1 = m1.apply(v, a, b, iters=3, test_mode=True)[1]
    f2 = m2.apply(v, a, b, iters=3, test_mode=True)[1]
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               atol=1e-4, rtol=1e-4)
