"""Event analytics, part 2 (round 4): hypertable-style rollup
cascades and behavioral path mining over the events table.

- events_rollup_cascade: hour -> day -> month continuous-aggregate
  tiers where each tier re-aggregates the one below it (never the
  raw facts) — the hypertable/materialized-rollup pattern;
- events_top_paths: the most common daily event-type paths (first 5
  events per user-day), the product-analytics "top user journeys"
  query.

Deterministic per the registry contract; oracles in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.exact import DEC, SQL_DSUM
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "events_rollup_cascade",
    oracle=f"""
    SELECT epoch_us(date_trunc('month', ts)) AS month_start_us,
           event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "rollup", "agg"),
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade: hourly tier from the raw
    events, daily tier from the HOURLY tier, monthly tier from the
    DAILY tier. The oracle aggregates raw events straight to months —
    proving the cascade is lossless — while the Spark plan is the
    shape a continuous-aggregate system maintains incrementally: each
    tier reads only the (orders-of-magnitude smaller) tier below, so
    refreshing a month after a late-arriving hour touches one hourly
    partition + one daily row, never the raw facts.

    Decimal sums ride through every tier unrounded (decimal addition
    is associative, so hour->day->month re-aggregation is EXACTLY the
    raw aggregate — doing this with doubles would drift) and cast to
    double once at the end. Scale: the first group-by is the only
    wide shuffle; the day and month tiers aggregate a few thousand
    rows."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(DEC)).alias("sv"),
    )
    daily = hourly.groupBy(
        F.window(F.col("w.start"), "1 day").alias("d"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))
    monthly = daily.groupBy(
        F.date_trunc("month", F.col("d.start")).alias("m"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))
    return monthly.select(
        F.unix_micros("m").alias("month_start_us"),
        "event_type",
        "n_events",
        F.col("sv").cast("double").alias("total_value"),
    )


@query(
    "events_top_paths",
    oracle="""
    WITH ordered AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    paths AS (
        SELECT user_id, day,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ordered
        WHERE rn <= 5
        GROUP BY user_id, day
    )
    SELECT path,
           COUNT(*) AS n_user_days,
           COUNT(DISTINCT user_id) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_user_days DESC, path
    LIMIT 20
    """,
    tags=("events", "path", "window", "topk"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the 20 most common daily event-type paths,
    where a path is the user's first five events of the day in
    event-time order (event_id breaks timestamp ties, so the path
    string is engine-deterministic).

    Scale: ONE shuffle on (user_id, day) — the per-group sort +
    truncate happens inside the aggregate via
    slice(array_sort(collect_list(struct(ts, event_id, type)))), not
    a global window, so no skewed single-partition sort; struct sort
    order (ts, then event_id) matches the oracle's ORDER BY. The
    5-event cap bounds per-group state the same way a sessionizer
    truncates runaway sessions. The path histogram is a second, tiny
    shuffle; top-20 folds into TakeOrderedAndProject."""
    ev = load(spark, sf_dir, "events")
    day_paths = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                1,
                5,
            ).alias("first5")
        )
        .select(
            "user_id",
            F.concat_ws(">", F.transform(F.col("first5"), lambda x: x.event_type)).alias(
                "path"
            ),
        )
    )
    return (
        day_paths.groupBy("path")
        .agg(
            F.count("*").alias("n_user_days"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_user_days"), "path")
        .limit(20)
    )
