"""Session-scoped cache bookkeeping.

Multi-consumer queries (dedup_minhash_lsh, the clustering loop)
persist() intermediates that feed the lazy DataFrame they return, so
they cannot unpersist at build time — the data is read when the
caller finally materializes the result. Persisting without a release
path leaks executor memory when many queries run in one long-lived
session (exactly the 1000-executor service shape).

Contract: builders persist through `tracked_persist` (and register
checkpoint block ids through `track_rdd_ids`); whoever materializes
the result calls `release_cached(spark)` afterwards (bench.py does
this between headline queries; tests assert the persistent-RDD map is
empty after release). Release only touches what the framework
registered for the calling session — a caller's own persisted
DataFrames, or another consumer's in-flight caches in the same
process, are never swept (localCheckpoint truncates lineage, so
unpersisting someone else's checkpoint blocks would make their
DataFrame unrecomputable). The old whole-session sweep remains
available behind sweep_all=True for teardown paths.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.Lock()
# keyed by id(SparkSession): each session's tracked caches are
# independent, and concurrent builders in other sessions (or threads
# releasing for a different session) never interleave
_TRACKED: dict[int, list[DataFrame]] = {}
_TRACKED_RDD_IDS: dict[int, set[int]] = {}


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for later release."""
    df.persist()
    with _LOCK:
        _TRACKED.setdefault(id(df.sparkSession), []).append(df)
    return df


def track_rdd_ids(spark: SparkSession, ids: set[int]) -> None:
    """Register framework-created persistent RDD ids (localCheckpoint
    blocks, which DataFrame.unpersist cannot reach) for release."""
    with _LOCK:
        _TRACKED_RDD_IDS.setdefault(id(spark), set()).update(ids)


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every currently-persisted RDD (includes localCheckpoint
    block RDDs, which the SQL cache manager does not track)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.keySet().iterator()
    ids: set[int] = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def free_rdd_ids(spark: SparkSession, ids: set[int], blocking: bool = False) -> None:
    """Unpersist specific RDDs by id (e.g. a superseded iteration's
    localCheckpoint blocks)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(blocking)


def release_cached(
    spark: SparkSession | None = None, sweep_all: bool = False, include_rdd_ids: bool = True
) -> int:
    """Unpersist the framework-tracked DataFrames and checkpoint
    blocks. With a session, releases only that session's entries;
    without one, releases every session's tracked entries (teardown).
    sweep_all=True additionally unpersists EVERY persistent RDD in the
    session — only safe when the caller owns the whole session (e.g. a
    dedicated bench/test process). include_rdd_ids=False skips the
    registered checkpoint blocks: unpersisting a plain cache merely
    forces recompute, but freeing a localCheckpoint makes its
    DataFrame unrecomputable, so pre-emptive releases (the registry's
    build wrapper) must leave checkpoints for an explicit release.
    Returns the number of tracked DataFrames released."""
    with _LOCK:
        if spark is None:
            dfs = [df for lst in _TRACKED.values() for df in lst]
            rdd_ids: set[int] = set().union(*_TRACKED_RDD_IDS.values()) if _TRACKED_RDD_IDS else set()
            _TRACKED.clear()
            if include_rdd_ids:
                _TRACKED_RDD_IDS.clear()
            else:
                rdd_ids = set()
        else:
            dfs = _TRACKED.pop(id(spark), [])
            rdd_ids = _TRACKED_RDD_IDS.pop(id(spark), set()) if include_rdd_ids else set()
    n = len(dfs)
    for df in dfs:
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be stopped
    if spark is not None:
        try:
            free_rdd_ids(spark, rdd_ids)
            if sweep_all:
                free_rdd_ids(spark, persistent_rdd_ids(spark))
        except Exception:
            pass
    return n
