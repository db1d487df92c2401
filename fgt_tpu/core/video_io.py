"""Video file I/O with backend fallback.

The reference writes result.mp4 via imageio+ffmpeg
(tool/video_inpainting.py:746-748). imageio's ffmpeg backend may be absent
in hermetic environments, so we fall back to OpenCV's VideoWriter (mp4v),
which covers the same contract (30 fps RGB mp4).
"""

from __future__ import annotations

import numpy as np


def write_video(path: str, frames, fps: int = 30, quality: int = 8) -> None:
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    try:
        import imageio

        imageio.mimwrite(path, frames, fps=fps, quality=quality)
        return
    except Exception:
        pass
    import cv2

    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
    if not writer.isOpened():
        raise IOError(f"no video backend available for {path}")
    for f in frames:
        writer.write(f[:, :, ::-1])  # RGB -> BGR
    writer.release()


def read_video(path: str) -> list[np.ndarray]:
    try:
        import imageio

        return [np.asarray(f) for f in imageio.mimread(path, memtest=False)]
    except Exception:
        pass
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        frames.append(fr[:, :, ::-1].copy())
    cap.release()
    return frames
