import functools
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


def test_encode_refine_matches_call():
    """The shared-encoding split (encode all frames once; refine over
    gathered features — the pipeline's video path) must reproduce the
    fused __call__ pairwise forward."""
    cfg = RAFTConfig(iters=2)
    model = RAFT(cfg)
    rng = np.random.RandomState(3)
    video = rng.randint(0, 255, (3, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(video[:1]),
                           jnp.asarray(video[1:2]), iters=1)
    lr_ref, up_ref = model.apply(variables, jnp.asarray(video[:2]),
                                 jnp.asarray(video[1:]), iters=2)

    fmap, net, inp = model.apply(variables, jnp.asarray(video),
                                 method="encode")
    lr, up = model.apply(variables, fmap[:2], fmap[1:], net[:2], inp[:2],
                         iters=2, method="refine")
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lr_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(up), np.asarray(up_ref),
                               rtol=1e-5, atol=1e-4)


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


@pytest.mark.heavy
def test_raft_small_forward():
    """--small variant (reference raft.py:29-58): bottleneck encoders,
    plain ConvGRU, bilinear x8 upsampling."""
    from fgt_tpu.models.raft import RAFT, RAFTConfig

    cfg = RAFTConfig(iters=2, small=True)
    assert cfg.hidden_dim == 96 and cfg.corr_radius == 3
    model = RAFT(cfg)
    a = jnp.zeros((1, 64, 96, 3))
    variables = jax.jit(functools.partial(model.init, iters=1))(
        jax.random.PRNGKey(0), a, a)
    rng = np.random.RandomState(0)
    i1 = jnp.asarray(rng.rand(1, 64, 96, 3) * 255)
    i2 = jnp.asarray(rng.rand(1, 64, 96, 3) * 255)
    low, up = model.apply(variables, i1, i2, iters=2, test_mode=True)
    assert low.shape == (1, 8, 12, 2)
    assert up.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(up)).all()


def test_alternate_corr_matches_pyramid():
    """The memory-efficient on-the-fly correlation must reproduce the
    all-pairs pyramid lookup (they are algebraically identical: avg_pool
    is linear, so pooling corr == correlating pooled features)."""
    from fgt_tpu.models.raft import (build_corr_pyramid, build_fmap_pyramid,
                                     lookup_corr_alternate,
                                     lookup_corr_pyramid)

    rng = np.random.RandomState(0)
    B, H, W, C = 2, 16, 24, 32
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    coords = jnp.asarray(
        rng.rand(B, H, W, 2).astype(np.float32)
        * np.asarray([W - 1, H - 1], np.float32))

    pyr = build_corr_pyramid(f1, f2, 4)
    want = np.asarray(lookup_corr_pyramid(pyr, coords, radius=4))

    fpyr = build_fmap_pyramid(f2, 4)
    got = np.asarray(lookup_corr_alternate(f1, fpyr, coords, radius=4,
                                           chunk=128))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


@pytest.mark.heavy
def test_raft_alternate_corr_end_to_end():
    """RAFT(alternate_corr=True) matches RAFT(False) with identical
    weights."""
    from fgt_tpu.models.raft import RAFT, RAFTConfig

    rng = np.random.RandomState(1)
    i1 = jnp.asarray(rng.rand(1, 32, 48, 3) * 255)
    i2 = jnp.asarray(rng.rand(1, 32, 48, 3) * 255)
    base = RAFT(RAFTConfig(iters=2))
    variables = jax.jit(functools.partial(base.init, iters=1))(
        jax.random.PRNGKey(0), i1, i2)
    _, up_a = base.apply(variables, i1, i2, iters=2, test_mode=True)
    alt = RAFT(RAFTConfig(iters=2, alternate_corr=True, corr_chunk=16))
    _, up_b = alt.apply(variables, i1, i2, iters=2, test_mode=True)
    np.testing.assert_allclose(np.asarray(up_a), np.asarray(up_b),
                               atol=1e-3, rtol=1e-3)
