import jax
import pytest
import jax.numpy as jnp
import numpy as np

from fgt_tpu.models.raft import (RAFT, RAFTConfig, build_corr_pyramid,
                                 coords_grid, lookup_corr_pyramid,
                                 upsample_flow_convex)


def test_coords_grid():
    g = np.asarray(coords_grid(2, 3, 4))
    assert g.shape == (2, 3, 4, 2)
    assert g[0, 1, 2, 0] == 2  # x
    assert g[0, 1, 2, 1] == 1  # y


def test_corr_pyramid_shapes_and_self_similarity():
    B, H, W, C = 1, 8, 8, 16
    f = np.random.randn(B, H, W, C).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f), jnp.asarray(f), num_levels=3)
    assert pyr[0].shape == (B * H * W, H, W)
    assert pyr[1].shape == (B * H * W, H // 2, W // 2)
    # self-correlation at matching location should be the max for most pixels
    c0 = np.asarray(pyr[0]).reshape(H * W, H * W)
    diag_is_max = (c0.argmax(axis=1) == np.arange(H * W)).mean()
    assert diag_is_max > 0.9


def test_lookup_at_identity_coords():
    B, H, W, C = 1, 8, 8, 4
    f = np.random.randn(B, H, W, C).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f), jnp.asarray(f), num_levels=2)
    coords = coords_grid(B, H, W)
    out = lookup_corr_pyramid(pyr, coords, radius=1)
    assert out.shape == (B, H, W, 2 * 9)
    # center tap of level 0 equals corr at the pixel's own location
    c0 = np.asarray(pyr[0]).reshape(H, W, H, W)
    centers = np.asarray(out)[0, :, :, 4]  # middle of 3x3 at level 0
    expected = np.array([[c0[y, x, y, x] for x in range(W)] for y in range(H)])
    np.testing.assert_allclose(centers, expected, atol=1e-5)


def test_upsample_flow_convex_shapes():
    B, H, W = 1, 4, 5
    flow = jnp.asarray(np.random.randn(B, H, W, 2).astype(np.float32))
    # uniform mask -> convex average of 8*flow neighborhood
    mask = jnp.zeros((B, H, W, 576))
    up = upsample_flow_convex(flow, mask)
    assert up.shape == (B, 8 * H, 8 * W, 2)
    # constant flow stays constant (x8)
    cflow = jnp.ones((B, H, W, 2))
    up_c = np.asarray(upsample_flow_convex(cflow, mask))
    interior = up_c[:, 8:-8, 8:-8]
    np.testing.assert_allclose(interior, 8.0, atol=1e-5)


@pytest.mark.heavy
def test_raft_forward_smoke():
    cfg = RAFTConfig(iters=2)
    model = RAFT(cfg)
    img = np.random.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)
    img2 = np.roll(img, 2, axis=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                           jnp.asarray(img2), iters=1)
    lr, up = model.apply(variables, jnp.asarray(img), jnp.asarray(img2),
                         iters=2)
    assert lr.shape == (1, 8, 8, 2)
    assert up.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(up)).all()


@pytest.mark.heavy
def test_lookup_matches_scalar_tap_reference():
    """The banded/one-hot lookup must be bit-equal to the naive 4-corner
    scalar-gather formulation (which mirrors torch grid_sample zeros
    semantics), including coords far outside the volume."""
    from fgt_tpu.models.raft import _bilinear_volume_sample

    def scalar_lookup(pyramid, coords, radius):
        B, H, W, _ = coords.shape
        N = B * H * W
        k = 2 * radius + 1
        d = jnp.arange(-radius, radius + 1, dtype=coords.dtype)
        dg = jnp.stack(jnp.meshgrid(d, d, indexing="ij"), axis=-1)
        dx = dg[..., 0].reshape(-1)
        dy = dg[..., 1].reshape(-1)
        flat = coords.reshape(N, 2)
        outs = []
        for i, corr in enumerate(pyramid):
            cx = flat[:, 0:1] / (2 ** i) + dx[None, :]
            cy = flat[:, 1:2] / (2 ** i) + dy[None, :]
            outs.append(_bilinear_volume_sample(corr, cx, cy))
        return jnp.concatenate(outs, axis=-1).reshape(
            B, H, W, len(pyramid) * k * k)

    rng = np.random.RandomState(7)
    B, H, W, C = 2, 12, 20, 8
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2, num_levels=4)
    coords = jnp.asarray(
        (rng.rand(B, H, W, 2).astype(np.float32) * 60 - 15))
    for radius in (1, 4):
        want = np.asarray(scalar_lookup(pyr, coords, radius))
        got = np.asarray(lookup_corr_pyramid(pyr, coords, radius))
        np.testing.assert_allclose(got, want, atol=1e-6)
