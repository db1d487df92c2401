"""TPU (scan) flowNN directional pass vs the numpy reference pass."""

import numpy as np

from fgt_tpu.pipeline.propagation import PropagationConfig, _directional_pass
from fgt_tpu.pipeline.propagation_tpu import directional_pass_tpu


def _data(seed=0, H=36, W=48, N=6, flow_scale=2.0):
    r = np.random.RandomState(seed)
    mask = np.zeros((H, W, N), bool)
    mask[10:22, 14:30, :] = True
    ff = r.randn(H, W, 2, N - 1).astype(np.float32) * flow_scale
    fb = r.randn(H, W, 2, N - 1).astype(np.float32) * flow_scale
    return mask, ff, fb


def _compare(forward):
    mask, ff, fb = _data()
    cfg = PropagationConfig()
    follow, check = (fb, ff) if forward else (ff, fb)
    want = _directional_pass(mask, follow, check, mask.shape[2],
                             forward=forward, cfg=cfg)
    got = directional_pass_tpu(mask, follow, check, mask.shape[2],
                               forward=forward, cfg=cfg)
    names = ("have", "nn_x", "nn_y", "nn_t", "cons")
    for name, a, b in zip(names, want, got):
        if name == "have":
            np.testing.assert_array_equal(b, a)
        elif name == "nn_t":
            np.testing.assert_array_equal(b, a)
        else:
            np.testing.assert_allclose(b, a, atol=1e-4, err_msg=name)


def test_forward_pass_matches_numpy():
    _compare(forward=True)


def test_backward_pass_matches_numpy():
    _compare(forward=False)


def test_smooth_flow_chains_propagate():
    """With near-zero flows every hole pixel chains to the first/last
    frame on both passes."""
    H, W, N = 24, 24, 5
    mask = np.zeros((H, W, N), bool)
    mask[8:16, 8:16, :] = True
    ff = np.zeros((H, W, 2, N - 1), np.float32)
    fb = np.zeros((H, W, 2, N - 1), np.float32)
    cfg = PropagationConfig()
    have, nx, ny, nt, cons = directional_pass_tpu(mask, fb, ff, N,
                                                  forward=True, cfg=cfg)
    # zero flow: the hole never escapes itself -> no chains anywhere
    assert not have.any()
    # constant cycle-consistent flow strong enough to exit the hole in one
    # hop: follow flow +10, opposite flow -10 closes the cycle
    fb[:] = 10.0
    ff[:] = -10.0
    have, nx, ny, nt, cons = directional_pass_tpu(mask, fb, ff, N,
                                                  forward=True, cfg=cfg)
    want = _directional_pass(mask, fb, ff, N, forward=True,
                             cfg=cfg)
    np.testing.assert_array_equal(have, want[0])
    assert have[:, :, 1:].sum() > 0
