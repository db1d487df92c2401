"""Host-memory tuning for slow-first-touch VM hosts.

On this class of VM the host serves newly-faulted guest pages at
~9 MB/s (measured: first 200 MB ``np.ones`` takes ~22 s, reuse runs at
GB/s). Large numpy/PJRT temporaries default to per-allocation ``mmap``
in glibc, so every sizeable transient can fault fresh pages and pay
that cost repeatedly. ``retain_heap()`` switches glibc to a grow-once
sbrk heap (``M_MMAP_MAX=0``) that is never trimmed
(``M_TRIM_THRESHOLD=INT_MAX``): the fault cost is paid once at the peak
working set and all later allocations recycle resident pages (measured
~4x on a varied-size alloc churn loop).

This is a host-side throughput fix only — device/TPU memory is
unaffected. Safe no-op on non-glibc platforms.
"""

from __future__ import annotations

import ctypes
import logging

logger = logging.getLogger("fgt_tpu")

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_MAX = -4
_INT_MAX = 0x7FFFFFFF


def retain_heap() -> bool:
    """Keep every allocation on a never-trimmed brk heap. Idempotent."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6")
        ok = (libc.mallopt(_M_TRIM_THRESHOLD, _INT_MAX) == 1
              and libc.mallopt(_M_MMAP_MAX, 0) == 1)
        if ok:
            logger.debug("glibc heap retention enabled (mmap_max=0)")
        _done = ok
        return ok
    except Exception:  # pragma: no cover - non-glibc
        return False
