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
