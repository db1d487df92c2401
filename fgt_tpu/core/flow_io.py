"""Optical-flow / aux-image file I/O.

File contracts match the reference's cvbase / RAFT readers
(reference: RAFT/utils/frame_utils.py:12-121):

* ``.flo``  — little-endian float32 magic ``202021.25``, int32 width,
  int32 height, then ``H*W*2`` float32 (u, v) per pixel (:12-36, :85-101)
* ``.pfm``  — Sintel disparity trees (:33-67): PF/Pf header, dims line,
  scale line (sign = endianness), rows bottom-up
* ``.png`` (KITTI) — uint16 BGR, flow = (value - 2^15) / 64, third
  channel = validity (:103-121)
* ``.ppm/.pgm`` — plain binary netpbm frames (read via imageio)

``read_gen`` dispatches on extension like the reference's
``frame_utils.read_gen`` so Sintel/KITTI trees load unchanged.
"""

from __future__ import annotations

import re

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


def read_pfm(path: str) -> np.ndarray:
    """Read a PFM image (reference frame_utils.py:33-67): returns
    [H, W] or [H, W, 3] float32, top-down row order."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"{path}: not a PFM file (header {header!r})")
        dim = re.match(rb"^(\d+)\s(\d+)\s*$", f.readline())
        if not dim:
            raise ValueError(f"{path}: malformed PFM header")
        w, h = map(int, dim.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    return np.flipud(data.reshape(shape)).astype(np.float32)


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    """Write a PFM image (little-endian, bottom-up rows)."""
    image = np.asarray(image, np.float32)
    if image.ndim == 3 and image.shape[2] == 3:
        header = b"PF"
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        header = b"Pf"
        image = image.reshape(image.shape[:2])
    else:
        raise ValueError(f"PFM needs [H,W] or [H,W,3], got {image.shape}")
    with open(path, "wb") as f:
        f.write(header + b"\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        f.write(f"{-abs(scale)}\n".encode())
        np.flipud(image).astype("<f").tofile(f)


def read_flow_kitti(path: str):
    """KITTI uint16 PNG flow (reference frame_utils.py:103-108).
    Returns (flow [H, W, 2], valid [H, W])."""
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[:, :, ::-1].astype(np.float32)
    flow, valid = raw[:, :, :2], raw[:, :, 2]
    return (flow - 2 ** 15) / 64.0, valid


def write_flow_kitti(path: str, flow: np.ndarray) -> None:
    import cv2

    uv = 64.0 * np.asarray(flow, np.float32) + 2 ** 15
    valid = np.ones(uv.shape[:2] + (1,), np.float32)
    out = np.concatenate([uv, valid], axis=-1).astype(np.uint16)
    cv2.imwrite(path, out[..., ::-1])


def read_gen(path: str):
    """Extension-dispatched reader (reference frame_utils.read_gen):
    images -> [H, W, C] arrays, .flo -> flow, .pfm -> data."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext in ("png", "jpeg", "jpg", "ppm", "pgm", "bmp"):
        import imageio.v2 as imageio

        return np.asarray(imageio.imread(path))
    if ext == "flo":
        return read_flow(path)
    if ext == "pfm":
        # reference frame_utils.read_gen:131-136 — Sintel flow PFMs carry
        # a junk third channel, dropped here; 2D PFMs return raw [H, W]
        data = read_pfm(path).astype(np.float32)
        return data if data.ndim == 2 else data[..., :-1]
    if ext in ("bin", "raw"):
        return np.load(path)
    raise ValueError(f"unsupported extension: {path}")
