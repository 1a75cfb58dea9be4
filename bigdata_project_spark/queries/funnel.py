"""Behavioral analytics over the events stream: ordered funnel
conversion, cohort retention, and an Arrow-native per-vector map.

The reference declares a "Fast querying & analytics" serving layer
(README.md:29-32) with aggregates over the listing stream
(README.md:22) but implements none of it; these are the standard
product-analytics shapes that layer would serve, expressed so one
shuffle on user_id feeds every step.

Scale notes:
- funnel + retention both hash-partition by user_id once; the
  follow-on per-user aggregate reuses that partitioning (Catalyst
  inserts no second exchange), so cost is one shuffle of the events
  table regardless of how many funnel steps are stacked.
- the mapInArrow operator moves columnar batches JVM->Python with
  zero pandas materialization — the cheapest Python escape hatch for
  vectorized work on embedding columns (numpy on the flattened
  values buffer, offsets-aware).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "events_funnel_view_click_purchase",
    oracle="""
    WITH s1 AS (
        SELECT user_id, event_type, ts,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS first_view
        FROM events
    ), s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > first_view THEN ts END)
                      OVER (PARTITION BY user_id) AS first_click
        FROM s1
    ), s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > first_click THEN ts END)
                      OVER (PARTITION BY user_id) AS first_purchase
        FROM s2
    ), per_user AS (
        SELECT user_id, MAX(first_view) AS fv, MAX(first_click) AS fc,
               MAX(first_purchase) AS fp
        FROM s3 GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(fv) AS n_view,
           COUNT(fc) AS n_view_then_click,
           COUNT(fp) AS n_full_funnel
    FROM per_user
    """,
    tags=("events", "funnel", "window", "analytics"),
)
def events_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view -> click (strictly after the first view)
    -> purchase (strictly after that click). Each step is a
    conditional MIN window over the same user_id partitioning, so the
    whole funnel costs one shuffle; step counts are exact integers
    (timestamp comparisons are exact in both engines)."""
    w = W.partitionBy("user_id")
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    staged = (
        ev.withColumn(
            "first_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "first_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("first_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "first_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("first_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("first_view").alias("fv"),
        F.max("first_click").alias("fc"),
        F.max("first_purchase").alias("fp"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("fv").alias("n_view"),
        F.count("fc").alias("n_view_then_click"),
        F.count("fp").alias("n_full_funnel"),
    )


@query(
    "events_retention_cohort",
    oracle="""
    WITH d AS (
        SELECT user_id,
               CAST(ts AS DATE) AS day,
               MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort_day
        FROM events
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           date_diff('day', cohort_day, day) AS day_offset,
           COUNT(DISTINCT user_id) AS n_active
    FROM d
    GROUP BY 1, 2
    """,
    tags=("events", "retention", "window", "analytics"),
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen day,
    counted distinct on each day-offset they return. The cohort
    assignment is a MIN window over user_id — co-partitioned with the
    activity rows, so no join against a first-seen table is needed."""
    ev = load(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("day"))
    d = ev.withColumn("cohort_day", F.min("day").over(W.partitionBy("user_id")))
    return d.groupBy(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
    ).agg(F.countDistinct("user_id").alias("n_active"))


@query(
    "arrow_map_component_stats",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           len(list_filter(embedding, x -> x > 0)) AS n_pos
    FROM embeddings
    """,
    tags=("arrow", "udf", "embeddings"),
)
def arrow_map_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow over the embedding column: per-vector dimensionality
    and positive-component count, computed on the raw Arrow buffers
    (flattened values + list offsets, numpy cumsum — no pandas, no
    per-row Python). Comparisons against 0.0 are exact, so the result
    is integer-deterministic across engines. Closure is self-contained
    per the worker-pickling contract (tables.py note)."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def batches(it):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in it:
            arr = b.column(b.schema.get_field_index("embedding"))
            lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False).astype("int64")
            flat = pc.list_flatten(arr)
            pos = pc.greater(flat, 0.0).to_numpy(zero_copy_only=False).astype("int64")
            cs = np.concatenate([[0], np.cumsum(pos)])
            ends = np.cumsum(lens)
            starts = ends - lens
            n_pos = cs[ends] - cs[starts]
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("vec_id")),
                    pa.array(lens, type=pa.int64()),
                    pa.array(n_pos, type=pa.int64()),
                ],
                names=["vec_id", "dim", "n_pos"],
            )

    return emb.mapInArrow(batches, "vec_id long, dim long, n_pos long")


@query(
    "arrow_grouped_label_extremes",
    oracle="""
    WITH s AS (
        SELECT label, vec_id,
               len(list_filter(embedding, x -> x > 0)) AS n_pos
        FROM embeddings
    ), m AS (
        SELECT label, vec_id, n_pos,
               MAX(n_pos) OVER (PARTITION BY label) AS mx
        FROM s
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           MAX(n_pos) AS max_n_pos,
           MIN(CASE WHEN n_pos = mx THEN vec_id END) AS top_vec_id
    FROM m
    GROUP BY label
    """,
    tags=("arrow", "udf", "embeddings", "grouped"),
)
def arrow_grouped_label_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().applyInArrow grouped-map (Spark 4.x): per label, the
    vector count, the max positive-component count, and the smallest
    vec_id achieving it (unique tiebreaker -> engine-deterministic).
    Completes the Arrow API matrix next to mapInArrow /
    applyInPandas / cogrouped applyInPandas; each group arrives as a
    pa.Table and is reduced with pyarrow/numpy kernels only."""
    emb = load(spark, sf_dir, "embeddings").select("label", "vec_id", "embedding")

    def per_label(table):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = table.column("embedding")
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False).astype("int64")
        flat = pc.list_flatten(arr)
        pos = pc.greater(flat, 0.0).to_numpy(zero_copy_only=False).astype("int64")
        cs = np.concatenate([[0], np.cumsum(pos)])
        ends = np.cumsum(lens)
        n_pos = cs[ends] - cs[ends - lens]
        vec_id = table.column("vec_id").to_numpy(zero_copy_only=False)
        mx = int(n_pos.max())
        return pa.table(
            {
                "label": pa.array([table.column("label")[0].as_py()], pa.int32()),
                "n_vecs": pa.array([len(vec_id)], pa.int64()),
                "max_n_pos": pa.array([mx], pa.int64()),
                "top_vec_id": pa.array([int(vec_id[n_pos == mx].min())], pa.int64()),
            }
        )

    return emb.groupBy("label").applyInArrow(
        per_label, "label int, n_vecs long, max_n_pos long, top_vec_id long"
    )
