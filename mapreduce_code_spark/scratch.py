"""RAM-backed scratch directories for bounded streaming runs.

The registered streamed queries are CORRECTNESS vehicles: availableNow
/ foreachBatch runs whose checkpoints, state stores, and staging sinks
exist only to drive the real streaming engine through a bounded input —
the durable-checkpoint contract they exercise belongs, in production,
to a distributed filesystem, not to this host's root disk. Placing
them under /tmp (disk-backed) put dozens of small synchronous
create/fsync/rename commits inside the timed path of exactly those
queries — and the r16 probe (`tools/probe_streamed_window.py`)
reproduced the recurring driver-window flags with a single concurrent
small-file fsync writer: memory-sink streams inflated 2.0-2.4x, the
foreachBatch stream 1.5x, batch controls <=1.3x, run median unmoved —
the precise signature of the r14/r15 driver bench artifacts. The fix:
scratch space lives on /dev/shm (tmpfs) when available, so scaffold
commits are memory-speed and immune to whatever else the host is
fsyncing; /tmp remains the fallback.

Every directory handed out here is recorded and removed at process
exit (tmpfs pages are RAM — leaks would be worse than the /tmp debris
they replace: r15 left 211 orphaned checkpoint dirs under /tmp).
Callers whose results are consumed lazily (a returned DataFrame
reading a scratch parquet sink) rely on exactly this exit-time
cleanup; callers done with a dir sooner should `discard()` it.

``SPARK_GRAFT_DISK_LOCAL=1`` forces every scratch dir (and, via
``session.py``, ``spark.local.dir``) back onto the default disk temp
root — the knob for (a) blowup-tier probes whose staging/shuffle bytes
could pressure a 50%-of-RAM tmpfs, and (b) the A-leg of pre/post
probes reproducing the root-disk I/O mechanism this module exists to
remove (tools/probe_streamed_window.py).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_CREATED: list[str] = []
# dirs discard()ed early — re-swept at exit because Spark's state-store
# maintenance thread can recreate files under a checkpoint dir shortly
# AFTER a stateful availableNow query terminates (r16 advisor, low):
# anything recreated on tmpfs after the eager rmtree would otherwise be
# untracked RAM until process death.
_DISCARDED: list[str] = []


#: Minimum free bytes /dev/shm must have for a NEW scratch dir to land
#: on it (r17 verdict #2: the tmpfs default was a local-mode assumption
#: with no capacity guard — a blowup-tier run that forgot
#: SPARK_GRAFT_DISK_LOCAL=1 would spill shuffle bytes into RAM until
#: the host OOMed, because tmpfs pages ARE RAM). 8 GiB default,
#: overridable via SPARK_GRAFT_TMPFS_MIN_FREE_GB.
_DEFAULT_MIN_FREE_BYTES = 8 * 1024**3


def _min_free_bytes() -> int:
    gb = os.environ.get("SPARK_GRAFT_TMPFS_MIN_FREE_GB")
    if gb:
        try:
            return int(float(gb) * 1024**3)
        except ValueError:
            pass
    return _DEFAULT_MIN_FREE_BYTES


def _ram_base() -> str | None:
    if os.environ.get("SPARK_GRAFT_DISK_LOCAL"):
        return None
    base = "/dev/shm"
    if not (os.path.isdir(base) and os.access(base, os.W_OK)):
        return None
    # Capacity guard (r17 verdict #2): admission check at ALLOCATION
    # time — a new scratch dir only lands on tmpfs when the filesystem
    # still has headroom, otherwise it falls back to the default disk
    # temp root automatically (no manual opt-out needed). This is an
    # admission check, not a mid-run migration: a dir already handed
    # out (notably spark.local.dir, fixed at JVM start) stays where it
    # is, and a job whose spill GROWS past the headroom after admission
    # still fails with ENOSPC on tmpfs rather than OOMing the host —
    # tmpfs is capped at 50% of RAM by default, which is the actual
    # backstop. The guard's job is the common failure: STARTING a
    # large-scale run against an already-pressured tmpfs.
    try:
        st = os.statvfs(base)
    except OSError:
        return None
    if st.f_bavail * st.f_frsize < _min_free_bytes():
        return None
    return base


def scratch_dir(prefix: str) -> str:
    """A fresh private scratch directory — tmpfs-backed when the host
    has /dev/shm, else the default temp root — removed at process
    exit. Fresh per call: streaming file sources remember processed
    files in their checkpoint, so a REUSED checkpoint would make a
    second bounded run read "no new data" and return empty."""
    d = tempfile.mkdtemp(prefix=prefix, dir=_ram_base())
    _CREATED.append(d)
    return d


def discard(path: str) -> None:
    """Remove one scratch dir now (idempotent) — for callers that know
    the dir is dead before exit, e.g. a runner deleting its checkpoint
    as soon as the bounded query terminates. The path stays on the
    exit re-sweep list: state-store maintenance can recreate files
    under a just-terminated stream's checkpoint after this rmtree."""
    shutil.rmtree(path, ignore_errors=True)
    try:
        _CREATED.remove(path)
    except ValueError:
        pass
    else:
        _DISCARDED.append(path)


@atexit.register
def _cleanup() -> None:
    for d in (*_CREATED, *_DISCARDED):
        shutil.rmtree(d, ignore_errors=True)
    _CREATED.clear()
    _DISCARDED.clear()
