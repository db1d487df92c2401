"""Dataset-prep reader library (FVI heritage).

Behavioral parity with the reference's aux reader zoo
(``FGT/data/util/readers.py:20-527``): directory-backed frame/mask
readers with sampling and max-length truncation, bbox extraction from
masks, bbox-list mask generation, side-by-side comparison canvases, and
frame/video writers. Re-designed on numpy + cv2 (the reference uses PIL
objects); every reader yields HxWxC uint8 RGB arrays (masks HxW, 255 =
hole), which is what the pipeline and metrics consume directly.
"""

from __future__ import annotations

import glob as _glob
import logging
import os

import cv2
import numpy as np

logger = logging.getLogger("fgt_tpu")

DEFAULT_FPS = 6
MAX_LENGTH = 60


class Reader:
    """Directory-backed sequence with ``[::sample_period][:max_length]``
    truncation, list/iterator protocol, and per-file save
    (reference readers.py:92-160)."""

    def __init__(self, dir_name: str | None, read: bool = True,
                 max_length: int | None = None, sample_period: int = 1):
        self.dir_name = dir_name
        self.max_length = max_length
        self.sample_period = sample_period
        self.filenames: list[str] = []
        self.files: list = []
        if read and dir_name:
            if os.path.exists(dir_name):
                names = sorted(_glob.glob(os.path.join(dir_name, "*")))
                names = [f for f in names if os.path.isfile(f)]
                self.filenames = names[::sample_period][:max_length]
                self.files = [self.read_file(f) for f in self.filenames]
            else:
                logger.warning("Directory %s not exists!", dir_name)

    def append(self, file_):
        self.files.append(file_)

    def set_files(self, files):
        self.files = list(files)

    def read_file(self, filename):
        raise NotImplementedError

    def _save_file(self, output_dir, i, file_):
        raise NotImplementedError

    def save_files(self, output_dir):
        os.makedirs(output_dir, exist_ok=True)
        for i, f in enumerate(self.files):
            self._save_file(output_dir, i, f)

    def __iter__(self):
        return iter(self.files)

    def __getitem__(self, key):
        return self.files[key]

    def __len__(self):
        return len(self.files)


class FrameReader(Reader):
    """RGB uint8 frames, optional (w, h) resize and scale
    (reference readers.py:162-207)."""

    def __init__(self, dir_name, resize=None, read=True,
                 max_length=MAX_LENGTH, scale: float = 1,
                 sample_period: int = 1):
        self.resize = resize
        self.scale = scale
        super().__init__(dir_name, read, max_length, sample_period)

    def read_file(self, filename):
        img = cv2.imread(filename, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"unreadable frame: {filename}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        size = self.resize if self.resize is not None else (w, h)
        tw, th = int(size[0] * self.scale), int(size[1] * self.scale)
        if (tw, th) != (w, h):
            img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
        return img

    def _save_file(self, output_dir, i, file_):
        if len(self.filenames) == len(self.files):
            name = os.path.basename(sorted(self.filenames)[i])
            name = os.path.splitext(name)[0] + ".png"
        else:
            name = f"frame_{i:04}.png"
        cv2.imwrite(os.path.join(output_dir, name),
                    cv2.cvtColor(file_, cv2.COLOR_RGB2BGR))

    def write_files_to_video(self, output_filename, fps: int = DEFAULT_FPS,
                             frame_num_when_repeat_list=(1,)):
        h, w = self.files[0].shape[:2]
        writer = cv2.VideoWriter(output_filename,
                                 cv2.VideoWriter_fourcc(*"MJPG"), fps,
                                 (w, h))
        for rep in frame_num_when_repeat_list:
            for frame in self.files:
                bgr = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
                for _ in range(rep):
                    writer.write(bgr)
        writer.release()


class SegmentationReader(FrameReader):
    """Binarizes segmentation PNGs into hole masks: any nonzero pixel ->
    255 (reference readers.py:289-307 thresholds at 1)."""

    def read_file(self, filename):
        img = cv2.imread(filename, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(f"unreadable segmentation: {filename}")
        return ((img > 0) * 255).astype(np.uint8)

    def _save_file(self, output_dir, i, file_):
        cv2.imwrite(os.path.join(output_dir, f"segm_{i:04}.png"), file_)


class MaskReader(Reader):
    """Grayscale masks (255 = hole) + bounding-box extraction via contours
    (reference readers.py:309-351; the reference inverts because its
    masks are 0 = hole PIL '1' images — ours are 255 = hole)."""

    def __init__(self, dir_name, read=True):
        super().__init__(dir_name, read=read)

    def read_file(self, filename):
        img = cv2.imread(filename, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(f"unreadable mask: {filename}")
        return img

    def _save_file(self, output_dir, i, file_):
        cv2.imwrite(os.path.join(output_dir, f"mask_{i:04}.png"), file_)

    def get_bboxes(self, i):
        mask = (np.asarray(self.files[i]) > 127).astype(np.uint8)
        contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_NONE)
        boxes = []
        for c in contours:
            x, y, w, h = cv2.boundingRect(c)
            boxes.append(((x, y), (x + w - 1, y + h - 1)))
        return boxes

    def get_bbox(self, i):
        boxes = self.get_bboxes(i)
        return boxes[0] if boxes else None


class MaskGenerator(Reader):
    """Rasterizes per-frame bbox lists into hole masks and (optionally)
    saves them (reference readers.py:353-391)."""

    def __init__(self, mask_output_dir, size, bboxeses, save_masks=True):
        self.bboxeses = bboxeses
        self.size = size  # (w, h)
        super().__init__(mask_output_dir, read=False)
        self.files = [self.generate_mask(i) for i in range(len(bboxeses))]
        if save_masks:
            self.save_files(mask_output_dir)

    def _save_file(self, output_dir, i, file_):
        cv2.imwrite(os.path.join(output_dir, f"mask_{i:04}.png"), file_)

    def get_bboxes(self, i):
        return self.bboxeses[i]

    def generate_mask(self, i):
        w, h = self.size
        mask = np.zeros((h, w), np.uint8)
        for (x0, y0), (x1, y1) in self.bboxeses[i]:
            mask[y0:y1 + 1, x0:x1 + 1] = 255
        return mask


class CompareFramesReader(Reader):
    """Side-by-side comparison canvases from N frame directories with
    column titles (reference readers.py:431-485 evaluation collage)."""

    def __init__(self, dir_names, col: int | None = None, names=(),
                 mask_dir=None):
        self.readers = [FrameReader(d) for d in dir_names]
        self.names = list(names) or [os.path.basename(d.rstrip("/"))
                                     for d in dir_names]
        self.col = col or len(self.readers)
        super().__init__(None, read=False)
        n = min(len(r) for r in self.readers)
        self.files = [self._canvas(i) for i in range(n)]

    def _canvas(self, i):
        tiles = []
        for name, reader in zip(self.names, self.readers):
            img = reader[i].copy()
            cv2.putText(img, name, (6, 18), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                        (255, 255, 0), 1, cv2.LINE_AA)
            tiles.append(img)
        rows = [np.concatenate(tiles[r:r + self.col], axis=1)
                for r in range(0, len(tiles), self.col)]
        width = max(r.shape[1] for r in rows)
        rows = [np.pad(r, ((0, 0), (0, width - r.shape[1]), (0, 0)))
                for r in rows]
        return np.concatenate(rows, axis=0)

    def _save_file(self, output_dir, i, file_):
        cv2.imwrite(os.path.join(output_dir, f"compare_{i:04}.png"),
                    cv2.cvtColor(file_, cv2.COLOR_RGB2BGR))


class BoundingBoxesListReader(Reader):
    """Reads per-frame bbox lists from ``*.txt`` files, one
    ``x0 y0 x1 y1`` per line (reference readers.py:487-500 pickle lists —
    plain text travels better)."""

    def __init__(self, dir_name, read=True, max_length=None,
                 sample_period=1):
        super().__init__(dir_name, read, max_length, sample_period)

    def read_file(self, filename):
        boxes = []
        with open(filename) as f:
            for line in f:
                vals = [int(v) for v in line.split()]
                if len(vals) == 4:
                    boxes.append(((vals[0], vals[1]), (vals[2], vals[3])))
        return boxes

    def _save_file(self, output_dir, i, file_):
        with open(os.path.join(output_dir, f"bboxes_{i:04}.txt"), "w") as f:
            for (x0, y0), (x1, y1) in file_:
                f.write(f"{x0} {y0} {x1} {y1}\n")


def save_frames_to_dir(frames, dirname):
    """reference readers.py:502-506."""
    reader = FrameReader(dirname, read=False)
    reader.set_files(frames)
    reader.save_files(dirname)
