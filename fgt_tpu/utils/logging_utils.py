"""Logging, timers, and run-dir management.

Replaces the reference's util.py logger/archival helpers
(FGT/utils/util.py:66-99) and adds a per-stage timing subsystem the
reference lacks (SURVEY.md §5 flags tracing as absent upstream).
"""

from __future__ import annotations

import json
import logging
import os
import time
from contextlib import contextmanager


def setup_logger(name: str = "fgt_tpu", log_dir: str | None = None,
                 level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
        datefmt="%y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        stamp = time.strftime("%y%m%d-%H%M%S")
        fh = logging.FileHandler(os.path.join(log_dir, f"run_{stamp}.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def archive_existing_dir(path: str) -> None:
    """Rename an existing output dir to ``<path>_archived_<ts>``
    (reference FGT/utils/util.py:66-74)."""
    if os.path.exists(path):
        stamp = time.strftime("%Y%m%d-%H%M%S")
        os.rename(path, f"{path}_archived_{stamp}")


class StageTimer:
    """Per-stage wall-clock accounting; dumps JSONL for the bench harness.

    Also tracks per-stage minor-page-fault deltas: on VM hosts whose
    first-touch page serving is slow (measured ~9 MB/s here), fault
    counts are the direct evidence when a CPU stage's wall time is
    dominated by memory growth rather than compute."""

    def __init__(self):
        self.times: dict[str, float] = {}
        self.faults: dict[str, int] = {}

    @contextmanager
    def stage(self, name: str):
        import resource

        from fgt_tpu.utils.costs import LEDGER

        prev = LEDGER.stage
        LEDGER.stage = name
        f0 = resource.getrusage(resource.RUSAGE_SELF).ru_minflt
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0)
            self.faults[name] = self.faults.get(name, 0) + (
                resource.getrusage(resource.RUSAGE_SELF).ru_minflt - f0)
            LEDGER.stage = prev

    def total(self) -> float:
        return sum(self.times.values())

    def report(self, n_frames: int | None = None) -> str:
        parts = [f"{k}: {v:.2f}s" for k, v in self.times.items()]
        msg = " | ".join(parts) + f" | total: {self.total():.2f}s"
        if n_frames:
            msg += f" | {n_frames / max(self.total(), 1e-9):.2f} frames/s"
        return msg

    def dump(self, path: str, **extra) -> None:
        rec = {"stages": self.times, "total": self.total(),
               "minor_faults": self.faults, **extra}
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
