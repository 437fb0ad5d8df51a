"""Thread- and process-safe build-once discipline for derived /tmp
artifacts (text corpora, format twins, persisted ANN indexes, layout
materializations).

Every derived artifact in the engine is content-addressed (see
``fixture_cache_tag``) and gated on a ``_SUCCESS`` marker. The naive
check-then-build is racy under CONCURRENT queries sharing an artifact —
two callers both see the marker missing and both write (Spark's
mode("overwrite") makes this corrupting, not just wasteful: interleaved
delete/commit can leave a directory mixing both runs' part files under a
_SUCCESS marker). ``build_once`` closes both races:

* within a process, a per-path lock table serializes builders and
  re-checks the marker under the lock;
* across processes, an advisory ``flock`` on a sibling ``.lock`` file
  serializes builders machine-wide (the scope of /tmp artifacts). flock
  is released automatically when the holder dies, so a crashed builder
  never wedges the path — the next caller re-checks the marker and
  rebuilds.
"""

from __future__ import annotations

import fcntl
import os
import threading
from collections.abc import Callable
from contextlib import contextmanager

_LOCKS: dict[str, threading.Lock] = {}
_LOCKS_GUARD = threading.Lock()


def _lock_for(key: str) -> threading.Lock:
    with _LOCKS_GUARD:
        return _LOCKS.setdefault(key, threading.Lock())


@contextmanager
def pathlock(key: str):
    """Per-key critical section for builders whose check-then-act spans
    more than a marker file (e.g. catalog registration plus layout
    write) — thread-safe within the process AND flock-serialized across
    processes (same rationale as build_once: two processes running
    mode('overwrite') to one /tmp layout path can interleave
    delete/commit into a corrupt mixed directory). The lockfile lives in
    the temp root so it works for keys whose directory does not exist
    yet."""
    import hashlib
    import tempfile

    with _lock_for(key):
        lockpath = os.path.join(
            tempfile.gettempdir(),
            f"tp1_pathlock_{hashlib.md5(key.encode()).hexdigest()}.lock",
        )
        with open(lockpath, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)


def build_once(
    out: str, build: Callable[[], None], marker: str = "_SUCCESS"
) -> str:
    """Run ``build()`` exactly once for ``out`` (double-checked on the
    marker file under a per-path thread lock AND a cross-process flock)
    and return ``out``."""
    mark = os.path.join(out, marker)
    if os.path.exists(mark):
        return out
    with _lock_for(out):
        if os.path.exists(mark):
            return out
        parent = os.path.dirname(out.rstrip("/")) or "."
        os.makedirs(parent, exist_ok=True)
        lockpath = out.rstrip("/") + ".build_lock"
        with open(lockpath, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                if not os.path.exists(mark):
                    build()
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)
    return out
