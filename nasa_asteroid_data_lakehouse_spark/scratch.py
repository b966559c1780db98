"""Ephemeral scratch-space placement for replay/round-trip queries.

Replay-style queries (streaming drains, VersionedTable round-trips)
build their own scaffolding — micro-batch source files, streaming
checkpoints, sink directories, temporary table roots — use it for the
duration of one query, and delete it in a ``finally``.  That
scaffolding is pure scratch: it is never an input, never survives the
query, and its durability is irrelevant (a crashed replay re-runs from
the real parquet inputs).

Structured Streaming checkpoints, however, fsync every offset-log,
commit-log and state-store delta file.  On block devices with slow
sync latency those fsyncs dominate a multi-batch replay (measured at
sf0.1: the FULL OUTER join replay's drain phase halves, 11.6 s ->
6.0 s, when the checkpoint moves from a ~6 ms-fsync disk to tmpfs).
None of that I/O is the operator under measurement.

``scratch_dir`` therefore prefers a RAM-backed tmpfs (``/dev/shm``)
for this scaffolding, overridable with ``$NDL_SCRATCH_DIR`` (set it to
a durable path when a deployment wants replay checkpoints to survive a
driver crash mid-query), falling back to the system tempdir.  In a
production pipeline long-lived streams pass their own durable
``checkpointLocation`` explicitly — this helper is only for
query-scoped scratch that is removed when the query returns.
"""

from __future__ import annotations

import os
import tempfile


# tmpfs must hold a whole replay's scaffolding with headroom; container
# runtimes often cap /dev/shm at 64 MB, where a mid-query ENOSPC would
# be far worse than the fsync latency being avoided.
MIN_TMPFS_FREE_BYTES = 1 << 30


def scratch_base() -> str | None:
    """Preferred base directory for query-scoped scratch."""
    env = os.environ.get("NDL_SCRATCH_DIR")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        try:
            st = os.statvfs(shm)
            if st.f_bavail * st.f_frsize >= MIN_TMPFS_FREE_BYTES:
                return shm
        except OSError:
            pass
    return None  # tempfile's default


def scratch_dir(prefix: str) -> str:
    """mkdtemp in the preferred scratch base (see module docstring)."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_base())
