"""Event-time windowing over the events table (SURVEY.md §2.9 batch
equivalents).

The reference *declares* a Spark Structured Streaming layer with
window aggregates (README.md:16-23) but its implementation files are
0-byte stubs. These queries implement the window semantics —
tumbling, sliding, session — with the exact operators the streaming
pipeline uses (F.window / F.session_window), executed in batch; the
`streaming/` package runs the same logic through readStream with
watermarks (tested via availableNow in tests/test_streaming.py).

Window-start timestamps are emitted as epoch microseconds so the
value-hash is engine-portable. Spark's F.window aligns to the epoch;
DuckDB's time_bucket aligns to 2000-01-03 00:00 — identical for
bucket widths that divide a day, which all of these do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.exact import SQL_DSUM, dsum
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window", "streaming-equivalent"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate ('listings per hour per
    district' pattern, README.md:22)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_sliding_1h_15m",
    oracle="""
    WITH slid AS (
        SELECT e.*,
               time_bucket(INTERVAL '15 minutes', e.ts) - k.k * INTERVAL '15 minutes' AS w_start
        FROM events e
        CROSS JOIN (SELECT unnest(range(4)) AS k) k
        WHERE e.ts < time_bucket(INTERVAL '15 minutes', e.ts) - k.k * INTERVAL '15 minutes' + INTERVAL '1 hour'
    )
    SELECT epoch_us(w_start) AS window_start_us,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM slid
    GROUP BY 1
    """,
    tags=("events", "window", "streaming-equivalent"),
)
def events_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h width, 15m slide): each event lands in 4
    overlapping windows — Spark expands this before the shuffle, same
    as the oracle's explicit unnest."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .select(F.unix_micros(F.col("w.start")).alias("window_start_us"), "n_events", "n_users")
    )


@query(
    "events_session_30m",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           COUNT(*) AS n_events,
           {SQL_DSUM('value')} AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("events", "window", "session", "streaming-equivalent"),
)
def events_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-minute gap) per user — posting-burst
    detection (SURVEY §2.9). Spark's session_window merges events
    whose gap is < 30m; the oracle is the classic gaps-and-islands
    construction with the same >= boundary."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("session_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "session_value",
        )
    )


@query(
    "events_dedup_first_arrival",
    oracle="""
    SELECT user_id, event_type,
           MIN(event_id) AS first_event_id,
           COUNT(*) AS n_occurrences
    FROM events
    GROUP BY user_id, event_type
    """,
    tags=("events", "dedup", "streaming-equivalent"),
)
def events_dedup_first_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping a deterministic representative — the
    scalable, order-independent form of dropDuplicates(['user_id',
    'event_type']) and of the reference's set()-dedup
    (CrawlData.py:12,34). Streaming variant in streaming/pipeline.py.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.count("*").alias("n_occurrences"),
    )


@query(
    "events_rate_per_type_day",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM('value')} AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "agg"),
)
def events_rate_per_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type event rates — the dashboard-feed gold table
    (README.md:36-41)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )
