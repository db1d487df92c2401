"""Device (CG) regionfill vs the host scipy direct solve.

The device solver must reproduce the reference diffusion contract
(tool/utils/region_fill.py:7-126 via tool/video_inpainting.py:44-52):
exact restore outside the hole, Laplace solution inside, border pixels
with reduced neighbor counts.
"""

import numpy as np
import pytest

from fgt_tpu.core.region_fill import regionfill

pytestmark = pytest.mark.unit


def _host_diffuse(flow, mask):
    out = np.zeros_like(flow, dtype=np.float64)
    for c in range(flow.shape[-1]):
        out[..., c] = regionfill(flow[..., c], mask)
    return out.astype(np.float32)


def _rand_flow(rng, h, w, c=2, smooth=True):
    f = rng.randn(h, w, c).astype(np.float32)
    if smooth:
        import cv2

        f = cv2.blur(f, (7, 7))
    return f


def test_matches_scipy_interior_hole():
    from fgt_tpu.ops.diffusion_tpu import diffuse_flows_device

    rng = np.random.RandomState(0)
    h, w = 96, 128
    flows, masks = [], []
    for t in range(3):
        flow = _rand_flow(rng, h, w)
        mask = np.zeros((h, w), np.float32)
        mask[20 + t:60 + t, 30:90] = 1
        flows.append(flow)
        masks.append(mask)
    flows = np.stack(flows)
    masks = np.stack(masks)

    got = np.asarray(diffuse_flows_device(flows, masks))
    want = np.stack([_host_diffuse(flows[i], masks[i])
                     for i in range(3)])
    # outside the hole: exact restore
    outside = masks == 0
    np.testing.assert_array_equal(got[outside], flows[outside])
    # inside: f32 CG vs f64 direct solve
    assert np.abs(got - want).max() < 2e-4, np.abs(got - want).max()


def test_matches_scipy_border_and_corner_holes():
    """Holes touching image borders exercise the reduced neighbor counts
    (3 at edges, 2 at corners) and Neumann truncation."""
    from fgt_tpu.ops.diffusion_tpu import diffuse_flows_device

    rng = np.random.RandomState(1)
    h, w = 80, 100
    flow = _rand_flow(rng, h, w)
    mask = np.zeros((h, w), np.float32)
    mask[0:30, 0:25] = 1      # corner hole
    mask[60:80, 40:70] = 1    # bottom-edge hole
    got = np.asarray(diffuse_flows_device(flow[None], mask[None]))[0]
    want = _host_diffuse(flow, mask)
    assert np.abs(got - want).max() < 2e-4, np.abs(got - want).max()


def test_empty_and_mixed_masks():
    """Planes with no hole must pass through exactly (and not stall the
    batched CG for the planes that do have holes)."""
    from fgt_tpu.ops.diffusion_tpu import diffuse_flows_device

    rng = np.random.RandomState(2)
    h, w = 64, 96
    flows = np.stack([_rand_flow(rng, h, w) for _ in range(2)])
    masks = np.zeros((2, h, w), np.float32)
    masks[1, 10:40, 20:60] = 1
    got = np.asarray(diffuse_flows_device(flows, masks))
    np.testing.assert_array_equal(got[0], flows[0])
    want = _host_diffuse(flows[1], masks[1])
    assert np.abs(got[1] - want).max() < 2e-4


def test_mask_channel_dim_accepted():
    from fgt_tpu.ops.diffusion_tpu import diffuse_flows_device

    rng = np.random.RandomState(3)
    flow = _rand_flow(rng, 48, 64)[None]
    mask = np.zeros((1, 48, 64, 1), np.float32)
    mask[0, 10:30, 20:40, 0] = 1
    a = np.asarray(diffuse_flows_device(flow, mask))
    b = np.asarray(diffuse_flows_device(flow, mask[..., 0]))
    np.testing.assert_array_equal(a, b)


def test_hole_values_ignored():
    """The solve must not depend on the input values inside the hole
    (the reference solves the Dirichlet problem from perimeter values)."""
    from fgt_tpu.ops.diffusion_tpu import diffuse_flows_device

    rng = np.random.RandomState(4)
    flow = _rand_flow(rng, 48, 64)[None]
    mask = np.zeros((1, 48, 64), np.float32)
    mask[0, 12:30, 16:44] = 1
    poisoned = flow.copy()
    poisoned[0, 12:30, 16:44] = 1e6
    a = np.asarray(diffuse_flows_device(flow, mask))
    b = np.asarray(diffuse_flows_device(poisoned, mask))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_f16_wire_input_one_ulp():
    """With f16-quantized inputs (the pipeline's wire dtype) the device
    solve matches the exact host solve of the same quantized field to
    ~1 f16 ulp after the wire cast — the whole backend swap is invisible
    at the LAFC input (pipeline Models.diffuse_fn contract)."""
    import cv2

    from fgt_tpu.ops.diffusion_tpu import diffuse_flows_device

    rng = np.random.RandomState(5)
    t, h, w = 4, 64, 64
    flows = cv2.blur(rng.randn(h, w, 2).astype(np.float32),
                     (7, 7))[None].repeat(t, 0)
    flows += 0.01 * rng.randn(t, h, w, 2).astype(np.float32)
    masks = np.zeros((t, h, w), np.float32)
    masks[:, 20:40, 24:44] = 1
    f16 = flows.astype(np.float16)
    host = np.stack([_host_diffuse(f16[i].astype(np.float32), masks[i])
                     for i in range(t)])
    dev = np.asarray(diffuse_flows_device(f16, masks))
    d = np.abs(dev.astype(np.float16).astype(np.float32)
               - host.astype(np.float16).astype(np.float32))
    assert d.max() < 2e-4, d.max()
