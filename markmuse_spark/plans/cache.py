"""Cache lifecycle for persisted intermediate frames.

Several operators persist a frame that MULTIPLE plan branches read
(Spark shares no subplans across self-joins, so a derived input would
recompute per branch — the round-2/3 measured lesson).  The results are
consumed lazily, so the operator itself has no post-action hook to
unpersist; one-shot jobs rely on LRU eviction and on Spark's
CacheManager deduplicating identical analyzed plans across repeated
builds.  A LONG-LIVED session running many distinct such queries,
though, accumulates entries — this module is the cleanup handle:

    from markmuse_spark.plans.cache import cache_scope
    with cache_scope():
        pairs = minhash_lsh_pairs(docs).collect()
    # every frame persisted inside the scope is now unpersisted

Operators call :func:`tracked_persist` instead of ``df.persist()``:
outside any scope it is exactly ``persist(MEMORY_AND_DISK)`` (today's
behavior); inside a scope the frame is registered and unpersisted at
scope exit.  Scopes nest (inner scopes release first) and are
thread-local, so concurrent sessions/threads cannot release each
other's caches.

CONTRACT — a scope must enclose both the persist AND every action that
consumes it: registration is with the innermost active scope, so a
frame persisted inside a nested helper scope is unpersisted at that
inner scope's exit, before any action the OUTER caller runs against it
(the action still succeeds — Spark recomputes an unpersisted frame —
but the persist bought nothing).  The operators in this package persist
and are consumed within one call, so wrapping the call site (as the
bench harness does per query) satisfies the contract; only a helper
that opens its own scope around a persist it returns lazily would
violate it.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_local = threading.local()


def tracked_persist(df: DataFrame, level=None) -> DataFrame:
    """``df.persist(level)`` + registration with the innermost active
    :func:`cache_scope` (no-op registration when no scope is active)."""
    from pyspark import StorageLevel

    df = df.persist(level if level is not None else StorageLevel.MEMORY_AND_DISK)
    scopes = getattr(_local, "scopes", None)
    if scopes:
        scopes[-1].append(df)
    return df


@contextmanager
def cache_scope():
    """Unpersist every frame :func:`tracked_persist`-ed inside the block
    at exit (blocking=False: executors drop blocks asynchronously).
    Yields the registration list for callers that want to inspect it."""
    scopes = getattr(_local, "scopes", None)
    if scopes is None:
        scopes = _local.scopes = []
    entry: list[DataFrame] = []
    scopes.append(entry)
    try:
        yield entry
    finally:
        scopes.pop()
        for df in entry:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped: nothing to release
