"""Allocator tuning for page-fault-expensive environments.

This sandbox (and many microVM/overcommitted cloud hosts) charges ~25us per
first-touch page fault.  glibc malloc services allocations >128 KiB with
mmap and munmaps them on free, so every large numpy temporary re-faults its
pages — measured here at ~80 MB/s effective, which would dominate all codec
kernels.  Raising M_MMAP_THRESHOLD keeps big buffers on the reusable heap:
pages are faulted once per worker process and then recycled.

Equivalent to exporting MALLOC_MMAP_THRESHOLD_=1073741824 before start;
done via mallopt(3) at import so Ray workers inherit it when they import
orc_ray, whatever their spawn environment.
"""

from __future__ import annotations

import sys

_M_MMAP_THRESHOLD = -3
_M_TRIM_THRESHOLD = -1


def tune_malloc() -> bool:
    if not sys.platform.startswith("linux"):
        return False
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        return True
    except Exception:
        return False


TUNED = tune_malloc()
