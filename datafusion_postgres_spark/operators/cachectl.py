"""Cache lifecycle for operator-internal persisted frames.

Several operators cache an intermediate that feeds multiple branches of
the returned plan (sessionize's windowed events, substring dedup's
exploded window stream, minhash signatures, ...). The cache is
load-bearing — without it the expensive stage runs 2-3x — but a bare
``.cache()`` never releases: in a long-lived engine session repeated
invocations accumulate event-scale blocks in executor storage until
eviction pressure.

``release_on_gc(result, *deps)`` ties each cached dependency's lifetime
to the RETURNED frame's Python lifetime: when the caller drops the
result (or it goes out of scope), a ``weakref.finalize`` callback
unpersists the dependencies. CPython refcounting makes this prompt and
deterministic for the common call-use-drop pattern; correctness never
depends on it (an unpersisted frame recomputes). ``blocking=False`` so
release never stalls the caller's thread, and errors are swallowed —
at interpreter shutdown or after ``spark.stop()`` the JVM may already
be gone.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

# Strong refs to active finalizers (weakref.finalize self-registers in
# an internal registry, but keeping our own set makes the pending count
# observable for tests/audits).
_FINALIZERS: set = set()


def _unpersist_all(deps: tuple) -> None:
    for d in deps:
        try:
            d.unpersist(blocking=False)
        except Exception:
            pass  # session stopped / interpreter teardown


def release_on_gc(result: DataFrame, *deps: DataFrame) -> DataFrame:
    """Unpersist ``deps`` when ``result`` is garbage-collected; returns
    ``result`` unchanged so call sites stay one-line."""
    fin = weakref.finalize(result, _unpersist_all, tuple(deps))
    fin.atexit = False  # JVM is gone at interpreter exit anyway
    _FINALIZERS.add(fin)
    _FINALIZERS.difference_update(
        {f for f in _FINALIZERS if not f.alive})
    return result


def pending_release_count() -> int:
    """Number of operator results whose cached deps are still held —
    observable leak gauge for tests."""
    _FINALIZERS.difference_update(
        {f for f in _FINALIZERS if not f.alive})
    return len(_FINALIZERS)
