"""Bounds for the f16 wire format used on host<->device flow transfers.

Advisor r2: f16's 2^-11 RELATIVE error means the absolute wire error grows
with flow magnitude — ~0.02 px at DAVIS-scale flows but ~0.2-0.4 px at
outpainting-scale flows (hundreds of px at 864x480). These tests pin that
bound quantitatively, and verify the --wire_f32 escape hatch keeps the wire
exact independently of the bf16 compute dtype.
"""

import numpy as np
import pytest


def _roundtrip_err(magnitude: float, n: int = 4096, seed: int = 0):
    rng = np.random.RandomState(seed)
    flows = (rng.rand(n, 2).astype(np.float32) * 2 - 1) * magnitude
    wired = flows.astype(np.float16).astype(np.float32)
    return np.abs(wired - flows)


@pytest.mark.parametrize("magnitude,bound_px", [
    (30.0, 0.02),     # DAVIS object-removal scale
    (120.0, 0.08),    # large camera motion
    (800.0, 0.5),     # outpainting-scale at 864x480 canvases
])
def test_f16_wire_error_scales_with_magnitude(magnitude, bound_px):
    err = _roundtrip_err(magnitude)
    # worst-case f16 quantization step at |x| <= m is m * 2^-11
    assert err.max() <= magnitude * 2 ** -11 + 1e-6
    assert err.max() <= bound_px


def test_f16_wire_relative_error_is_bounded():
    err = _roundtrip_err(500.0)
    flows = (np.random.RandomState(0).rand(4096, 2).astype(np.float32)
             * 2 - 1) * 500.0
    rel = err / np.maximum(np.abs(flows), 1e-3)
    assert rel.max() <= 2 ** -11 + 1e-7


def test_wire_dtype_selection():
    import jax.numpy as jnp

    from fgt_tpu.pipeline.video_inpainting import build_parser, wire_dtypes

    # default CLI: bf16 compute -> f16 wire
    args = build_parser().parse_args([])
    assert args.bf16 and not args.wire_f32
    assert wire_dtypes(args.bf16, args.wire_f32) == (jnp.float16, np.float16)
    # --wire_f32 keeps the wire exact under bf16 compute
    args = build_parser().parse_args(["--wire_f32"])
    assert wire_dtypes(args.bf16, args.wire_f32) == (jnp.float32, np.float32)
    # --f32 compute implies f32 wire
    args = build_parser().parse_args(["--f32"])
    assert wire_dtypes(args.bf16, args.wire_f32) == (jnp.float32, np.float32)
