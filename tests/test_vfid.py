"""VFID metric: I3D trunk shapes, Frechet distance math, converter
round-trip on a synthetic torch-style state_dict."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from fgt_tpu.core.vfid import (I3D, VFIDScorer, convert_i3d_checkpoint,
                               feature_stats, frechet_distance, vfid)

pytestmark = pytest.mark.heavy  # jit-compile heavy (minutes on a 1-core host)


def test_i3d_feature_shape():
    model = I3D()
    x = jnp.zeros((2, 16, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (2, 1024)


def test_frechet_distance_properties():
    rng = np.random.RandomState(0)
    a = rng.randn(200, 8)
    b = rng.randn(200, 8) + 3.0
    mu_a, cov_a = feature_stats(a)
    mu_b, cov_b = feature_stats(b)
    assert frechet_distance(mu_a, cov_a, mu_a, cov_a) < 1e-6
    d = frechet_distance(mu_a, cov_a, mu_b, cov_b)
    assert d > 8 * 9 * 0.9  # ~ ||3||^2 * dim

def test_vfid_scorer_orders_similarity():
    rng = np.random.RandomState(0)
    real = [rng.rand(8, 64, 64, 3) * 255 for _ in range(3)]
    close = [r + rng.randn(*r.shape) * 2 for r in real]
    far = [rng.rand(8, 64, 64, 3) * 255 for _ in range(3)]
    scorer = VFIDScorer(clip_len=8)
    d_close = vfid(real, close, scorer.variables)
    d_far = vfid(real, far, scorer.variables)
    assert d_close < d_far


def test_i3d_converter_maps_all_units():
    model = I3D()
    x = jnp.zeros((1, 9, 32, 32, 3))
    template = model.init(jax.random.PRNGKey(0), x)

    # synthetic pytorch-i3d style state_dict
    state = {}

    def fill_unit(prefix, params_unit):
        k = params_unit["conv3d"]["kernel"]  # [T,H,W,I,O]
        t, h, w, i, o = k.shape
        rng = np.random.RandomState(len(prefix))
        state[f"{prefix}.conv3d.weight"] = (
            rng.randn(o, i, t, h, w).astype(np.float32)
            / np.sqrt(i * t * h * w))
        state[f"{prefix}.bn.weight"] = np.full((o,), 2.0, np.float32)
        state[f"{prefix}.bn.bias"] = np.full((o,), 0.5, np.float32)
        state[f"{prefix}.bn.running_mean"] = np.zeros((o,), np.float32)
        state[f"{prefix}.bn.running_var"] = np.ones((o,), np.float32)

    for name, unit in template["params"].items():
        if name.startswith("Conv3d"):
            fill_unit(name, unit)
        else:
            for br in unit:
                fill_unit(f"{name}.{br}", unit[br])

    out = convert_i3d_checkpoint(state, template)
    w = out["params"]["Mixed_3b"]["b0"]["conv3d"]["kernel"]
    ref = state["Mixed_3b.b0.conv3d.weight"].transpose(2, 3, 4, 1, 0)
    np.testing.assert_allclose(np.asarray(w), ref)
    assert float(out["params"]["Conv3d_2b_1x1"]["bn"]["scale"][0]) == 2.0
    assert float(out["batch_stats"]["Mixed_5c"]["b3b"]["bn"]["var"][0]) == 1.0
    # converted weights actually run
    feats = model.apply(out, x)
    assert np.isfinite(np.asarray(feats)).all()


def test_vfid_features_cover_tail_frames():
    """A 24-frame video at clip_len=16 must feature the tail (advisor
    finding r1: the last clip starts at t-clip_len)."""
    from fgt_tpu.core.vfid import VFIDScorer

    scorer = VFIDScorer(clip_len=8)
    rng = np.random.RandomState(0)
    vid = rng.randint(0, 255, (12, 32, 32, 3), np.uint8)
    f = scorer._features(vid)
    assert f.shape[0] == 2  # clips [0:8] and [4:12]
    f2 = scorer._features(vid[:8])
    assert f2.shape[0] == 1
    f3 = scorer._features(vid[:5])  # shorter than clip_len: tiled
    assert f3.shape[0] == 1
