"""glibc malloc tuning for numpy-heavy Pandas-UDF workers.

Measured on this class of host (virtualized, no transparent hugepages):
first-touch page faults on fresh ``mmap``-backed arrays run at only
~200 MB/s, while reusing heap pages runs at memory speed.  glibc mmaps
every allocation above 128 KiB and *unmaps it on free*, so each large
numpy temporary in a batched geometry kernel re-faults its pages — a
35 MB ``np.repeat`` result cost 160 ms cold vs 6 ms warm, and the
batched ST_Buffer union spent >80% of its wall time faulting.

Raising ``M_MMAP_THRESHOLD``/``M_TRIM_THRESHOLD`` keeps large blocks on
the main heap where freed pages are reused: the 500-row collection
buffer batch dropped 13.1 s -> 1.6 s warm (8x) with no algorithm
change.  Peak retention is bounded because the batch kernels chunk
their work (see ``geometry/ring_union.py`` / ``winding_batch.py``).

Called once per process at package import; each Spark Python worker is
its own process and imports the package when the UDF deserializes, so
executors get the tuning too.  No-op on non-glibc platforms and under
``SEDONA_DB_SPARK_NO_MALLOC_TUNE=1``.
"""

from __future__ import annotations

import ctypes
import os

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_malloc() -> bool:
    """Idempotently raise glibc's mmap/trim thresholds to 1 GiB."""
    global _done
    if _done or os.environ.get("SEDONA_DB_SPARK_NO_MALLOC_TUNE") == "1":
        return _done
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)) \
            and bool(libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30))
        _done = ok
    except (OSError, AttributeError):
        _done = False
    return _done
