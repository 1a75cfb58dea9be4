"""Cross-micro-batch state carry for applyInPandasWithState.

`stream_stateful_max_jump`'s oracle check runs availableNow over one
file, so every user's rows arrive in a single ordered batch and the
state round-trip (n, frontier ts/event_id/value, best) is never
actually resumed. Here the events table is split into THREE
chronological parquet chunks delivered one-per-micro-batch
(maxFilesPerTrigger=1), so most users' histories span batches and the
frontier must be persisted and resumed for the answer to come out
right — a jump whose two events sit in different batches is only
found via the restored state. The final update per user must equal
the batch LAG-window answer on the full table.

This is the semantics that matters at scale: a production stream
never delivers a key's whole history in one batch.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F


def test_max_jump_state_carries_across_micro_batches(spark, sf_dir, tmp_path):
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bigdata_project_spark.streaming.pipeline import _max_jump_fn

    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
    )
    ts_type = dict(batch.dtypes)["ts"]
    if ts_type == "bigint":
        batch = batch.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        batch = batch.withColumn("ts", F.col("ts").cast("timestamp"))

    # three chronological chunks — replay order, as a backfill would
    src = tmp_path / "src"
    src.mkdir()
    t1, t2 = (
        batch.selectExpr(
            "percentile_approx(ts, 0.33) AS t1", "percentile_approx(ts, 0.66) AS t2"
        )
        .collect()[0]
    )
    batch.filter(F.col("ts") <= F.lit(t1)).coalesce(1).write.parquet(str(src / "c1"))
    batch.filter((F.col("ts") > F.lit(t1)) & (F.col("ts") <= F.lit(t2))).coalesce(1).write.parquet(
        str(src / "c2")
    )
    batch.filter(F.col("ts") > F.lit(t2)).coalesce(1).write.parquet(str(src / "c3"))

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _max_jump_fn,
        outputStructType="user_id long, n_events long, max_jump double",
        stateStructType="n long, last_ts timestamp, last_eid long, last_val double, best double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    emitted: list[pd.DataFrame] = []

    def sink(bdf, bid):
        emitted.append(bdf.toPandas().assign(batch_id=bid))

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    all_updates = pd.concat(emitted)
    assert all_updates["batch_id"].nunique() >= 3, "expected one micro-batch per chunk"
    final = (
        all_updates.sort_values("batch_id")
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")[["n_events", "max_jump"]]
    )

    expected = {
        (r["user_id"]): (r["n_events"], r["max_jump"])
        for r in batch.selectExpr(
            "user_id", "value",
            "value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS jump",
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("jump").alias("max_jump"))
        .collect()
    }

    assert set(final.index) == set(expected)

    # a real cross-batch case must exist, or this test proves nothing:
    # some user's true best jump must straddle a chunk boundary (be
    # strictly larger than any jump visible within a single chunk)
    within = (
        batch.withColumn(
            "chunk",
            F.when(F.col("ts") <= F.lit(t1), 1)
            .when(F.col("ts") <= F.lit(t2), 2)
            .otherwise(3),
        )
        .selectExpr(
            "user_id",
            "value - LAG(value) OVER (PARTITION BY user_id, chunk ORDER BY ts, event_id) AS jump",
        )
        .groupBy("user_id")
        .agg(F.max("jump").alias("max_within"))
        .collect()
    )
    within_best = {r["user_id"]: r["max_within"] for r in within}
    straddlers = [
        uid
        for uid, (_, j_exp) in expected.items()
        if j_exp is not None
        and (within_best.get(uid) is None or j_exp > within_best[uid])
    ]
    assert straddlers, "no user's best jump crossed a batch boundary — test is vacuous"

    mismatch = []
    for uid, (n_exp, j_exp) in expected.items():
        n_got = int(final.loc[uid, "n_events"])
        j_got = final.loc[uid, "max_jump"]
        if n_got != n_exp or (
            (j_exp is None) != (pd.isna(j_got) or j_got is None)
        ) or (j_exp is not None and not pd.isna(j_got) and abs(j_got - j_exp) > 0):
            mismatch.append((uid, (n_got, j_got), (n_exp, j_exp)))
    assert not mismatch, f"state-carry divergence for users: {mismatch[:5]}"


def test_session_windows_merge_across_micro_batches(spark, sf_dir, tmp_path):
    """session_window's merge-on-overlap state, resumed across
    micro-batches: a session whose events span two chunks must come
    out as ONE window, identical to the batch computation. The
    oracle check (single availableNow batch) never resumes that
    state; this delivers three chronological chunks one per trigger
    and requires the complete-mode result to equal batch exactly
    (counts and DECIMAL-routed value sums bit-equal)."""
    from bigdata_project_spark.exact import dsum

    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "value")
    )
    ts_type = dict(batch.dtypes)["ts"]
    if ts_type == "bigint":
        batch = batch.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        batch = batch.withColumn("ts", F.col("ts").cast("timestamp"))

    src = tmp_path / "src"
    src.mkdir()
    # chunk boundary t1 is placed ON the first event of a known
    # multi-event session, so that session's remaining events land in
    # the next chunk — a guaranteed straddle (random percentile splits
    # rarely bisect a 30-minute session in weeks of sparse events)
    def sessionize(df):
        return (
            df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"), dsum("value").alias("session_value"))
            .select(
                "user_id",
                F.unix_micros(F.col("w.start")).alias("session_start_us"),
                "n_events",
                "session_value",
            )
        )

    multi = (
        batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .orderBy("w.start", "user_id")
        .limit(1)
        .collect()
    )
    assert multi, "testbed has no multi-event 30-minute session"
    sess = multi[0]
    t1 = (
        batch.filter(
            (F.col("user_id") == sess["user_id"])
            & (F.col("ts") >= sess["w"]["start"])
        )
        .agg(F.min("ts"))
        .collect()[0][0]
    )
    t_max = batch.agg(F.max("ts")).collect()[0][0]
    t2 = t1 + (t_max - t1) / 2
    assert t1 < t2 < t_max
    batch.filter(F.col("ts") <= F.lit(t1)).coalesce(1).write.parquet(str(src / "c1"))
    batch.filter((F.col("ts") > F.lit(t1)) & (F.col("ts") <= F.lit(t2))).coalesce(1).write.parquet(
        str(src / "c2")
    )
    batch.filter(F.col("ts") > F.lit(t2)).coalesce(1).write.parquet(str(src / "c3"))

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        sessionize(stream.withWatermark("ts", "1 hour"))
        .writeStream.format("memory")
        .queryName("mb_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None and q.recentProgress, "no progress recorded"
    assert len(q.recentProgress) >= 3, "expected >= 3 micro-batches"

    got = sorted(map(tuple, spark.table("mb_sessions").collect()))
    exp = sorted(map(tuple, sessionize(batch).collect()))
    assert got == exp

    # non-vacuity: some session must straddle a chunk boundary — i.e.
    # sessionizing each chunk separately must yield MORE sessions than
    # the true answer (two chunk-local fragments merged into one)
    per_chunk = sum(
        sessionize(spark.read.parquet(str(src / c))).count() for c in ("c1", "c2", "c3")
    )
    assert per_chunk > len(exp), "no session crossed a batch boundary — test is vacuous"
