"""Thread-safe build-once discipline for derived /tmp artifacts (text
corpora, format twins, persisted ANN indexes, layout materializations).

Every derived artifact in the engine is content-addressed (see
``fixture_cache_tag``) and gated on a ``_SUCCESS`` marker. The naive
check-then-build is racy under CONCURRENT queries sharing an artifact —
two sessions' threads both see the marker missing and both write (Spark's
mode("overwrite") makes this corrupting, not just wasteful). ``build_once``
serializes builders per output path with a process-wide lock table and
re-checks the marker under the lock, so N concurrent callers produce
exactly one build. Cross-PROCESS callers are already safe by idempotence +
content-addressing (each process builds the same bytes at the same path;
the marker lands last via Spark's commit protocol).
"""

from __future__ import annotations

import os
import threading
from collections.abc import Callable

_LOCKS: dict[str, threading.Lock] = {}
_LOCKS_GUARD = threading.Lock()


from contextlib import contextmanager


@contextmanager
def pathlock(key: str):
    """Per-key process-wide critical section for builders whose
    check-then-act spans more than a marker file (e.g. catalog
    registration plus layout write)."""
    with _LOCKS_GUARD:
        lock = _LOCKS.setdefault(key, threading.Lock())
    with lock:
        yield


def build_once(
    out: str, build: Callable[[], None], marker: str = "_SUCCESS"
) -> str:
    """Run ``build()`` exactly once per process for ``out`` (double-checked
    on the marker file under a per-path lock) and return ``out``."""
    mark = os.path.join(out, marker)
    if os.path.exists(mark):
        return out
    with _LOCKS_GUARD:
        lock = _LOCKS.setdefault(out, threading.Lock())
    with lock:
        if not os.path.exists(mark):
            build()
    return out
