"""Middlebury .flo optical-flow file I/O.

File contract matches the reference's cvbase / RAFT readers
(reference: RAFT/utils/frame_utils.py:12-36, writeFlow at :85-101):
a little-endian float32 magic ``202021.25``, int32 width, int32 height,
then ``H*W*2`` float32 values interleaved as (u, v) per pixel.
"""

from __future__ import annotations

import numpy as np

_TAG_FLOAT = 202021.25


def read_flow(path: str) -> np.ndarray:
    """Read a .flo file into an ``[H, W, 2]`` float32 array."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or abs(float(magic[0]) - _TAG_FLOAT) > 1e-3:
            raise ValueError(f"{path}: invalid .flo magic {magic!r}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
        if data.size != 2 * w * h:
            raise ValueError(f"{path}: truncated .flo ({data.size} values, want {2*w*h})")
    return data.reshape(h, w, 2)


def write_flow(flow: np.ndarray, path: str) -> None:
    """Write an ``[H, W, 2]`` array to a .flo file."""
    flow = np.asarray(flow, dtype=np.float32)
    if flow.ndim != 3 or flow.shape[2] != 2:
        raise ValueError(f"flow must be [H, W, 2], got {flow.shape}")
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.array([_TAG_FLOAT], dtype=np.float32).tofile(f)
        np.array([w, h], dtype=np.int32).tofile(f)
        flow.tofile(f)
