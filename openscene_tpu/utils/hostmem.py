"""Host allocator tuning for virtualized hosts with slow demand paging.

On the VM class this framework targets, first-touch page faults run at
~15-40 MB/s (measured) while warm memory moves at GB/s — glibc's default
mmap threshold makes every large NumPy temporary a fresh cold mapping, so
batch assembly was dominated by page faults rather than arithmetic.
Raising M_MMAP_THRESHOLD keeps freed large blocks on the heap (mapped and
warm) for reuse.  The trade-off is higher retained RSS, which is fine on
the 100GB+ hosts this runs on.
"""

from __future__ import annotations

import ctypes
import logging

log = logging.getLogger(__name__)

_done = False
_M_MMAP_THRESHOLD = -3  # glibc mallopt parameter id


def warm_malloc(threshold: int = 1 << 30) -> bool:
    """Route large allocations through the heap free-list (warm pages).

    Idempotent; returns True when the mallopt call succeeded (glibc only —
    silently a no-op elsewhere)."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, threshold))
        _done = ok
        return ok
    except OSError:  # non-glibc platform
        return False
