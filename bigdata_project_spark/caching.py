"""Session-scoped cache bookkeeping.

Multi-consumer queries (dedup_minhash_lsh, the clustering loop)
persist() intermediates that feed the lazy DataFrame they return, so
they cannot unpersist at build time — the data is read when the
caller finally materializes the result. Persisting without a release
path leaks executor memory when many queries run in one long-lived
session (exactly the 1000-executor service shape).

Contract: builders persist through `tracked_persist`; whoever
materializes the result calls `release_cached(spark)` afterwards
(bench.py does this between headline queries; tests assert the
persistent-RDD map is empty after release). `release_cached` also
sweeps localCheckpoint blocks, which DataFrame.unpersist cannot
reach.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for later release."""
    df.persist()
    _TRACKED.append(df)
    return df


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


def release_cached(spark: SparkSession | None = None) -> int:
    """Unpersist every tracked DataFrame; with a session, also sweep
    any remaining persistent RDDs (checkpoint blocks). Returns the
    number of tracked DataFrames released."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be stopped
    _TRACKED.clear()
    if spark is not None:
        try:
            free_rdd_ids(spark, persistent_rdd_ids(spark))
        except Exception:
            pass
    return n
