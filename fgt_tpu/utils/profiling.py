"""Profiling subsystem: jax.profiler traces + named annotations.

The reference has no tracing at all (SURVEY.md §5 — wall-clock prints
only). Here every pipeline stage already reports wall time via StageTimer;
this module adds on-demand XLA/TPU traces viewable in TensorBoard or
Perfetto.

Usage:
    with maybe_trace("/tmp/fgt_trace", enabled=args.profile):
        ... run stages ...

    with annotate("s6_fgt"):          # named region inside a trace
        ...
"""

from __future__ import annotations

import contextlib
import logging
import os

logger = logging.getLogger("fgt_tpu")


@contextlib.contextmanager
def maybe_trace(log_dir: str | None, enabled: bool = True):
    """jax.profiler.trace context; no-op when disabled or unavailable."""
    if not (enabled and log_dir):
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    try:
        with jax.profiler.trace(log_dir):
            logger.info("profiler trace -> %s", log_dir)
            yield
    except Exception as e:  # tunnel/backend may not support profiling
        logger.warning("profiler unavailable (%s); continuing untraced", e)
        yield


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
