"""Window-function operators (SURVEY.md §2.5).

All [ext]: ranking, analytic lag/lead, running and range frames.
Every window spec has a deterministic total order (unique tiebreaker)
except where tie-stable functions (rank/dense_rank) are the point.

Scale notes: a window = one shuffle on partition keys + per-partition
sort. Partition keys here (segment, customer, status) are the natural
distribution keys; no windows over a global (unpartitioned) ordering
except the small per-status frames — a global window at 100 TB would
single-task, so anything global is expressed per-group instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.exact import dcast
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "window_top3_per_segment",
    oracle="""
    SELECT c_mktsegment, rn, c_custkey, c_name, c_acctbal
    FROM (
        SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    )
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_top3_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the scalable per-group top-k
    (no global sort; rank computed within each hash partition)."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_rank_family",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           RANK() OVER w_ties AS rnk,
           DENSE_RANK() OVER w_ties AS drnk,
           PERCENT_RANK() OVER w_ties AS prnk,
           CUME_DIST() OVER w_ties AS cdist,
           ROW_NUMBER() OVER w_total AS rn,
           NTILE(4) OVER w_total AS quartile
    FROM orders
    WHERE o_orderkey % 20 = 0
    WINDOW w_ties AS (PARTITION BY o_orderstatus ORDER BY CAST(o_orderdate AS DATE)),
           w_total AS (PARTITION BY o_orderstatus ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    """,
    tags=("window", "rank"),
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank/cume_dist over a tie-producing
    order (dates), row_number/ntile over a total order."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    d = F.to_date("o_orderdate")
    w_ties = W.partitionBy("o_orderstatus").orderBy(d)
    w_total = W.partitionBy("o_orderstatus").orderBy(d, "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.percent_rank().over(w_ties).alias("prnk"),
        F.cume_dist().over(w_ties).alias("cdist"),
        F.row_number().over(w_total).alias("rn"),
        F.ntile(4).over(w_total).alias("quartile"),
    )


@query(
    "window_lag_lead_price_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           o_totalprice - LAG(o_totalprice) OVER w AS delta_prev
    FROM orders
    WHERE o_custkey % 10 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "analytic"),
)
def window_lag_lead_price_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: price change between consecutive orders per customer
    (the reference's declared 'price-change tracking per id',
    SURVEY.md §2.9, in batch form)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
    )


@query(
    "window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS order_seq
    FROM orders
    WHERE o_custkey % 10 = 1
    """,
    tags=("window", "frame"),
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (cumulative frame). Decimal-exact so
    the running value is independent of the engine's frame-summation
    strategy (DuckDB uses segment trees — double would re-associate)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 1)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dcast("o_totalprice")).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("double").alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "window_range_frame_30d",
    oracle="""
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER w AS n_orders_30d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS spend_30d
    FROM orders
    WHERE o_custkey % 10 = 2
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "range"),
)
def window_range_frame_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame: per order, count+spend of the same customer's
    orders in the trailing 30 days (ordered by epoch-day)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 2)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.to_date("o_orderdate")))
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("n_orders_30d"),
        F.sum(dcast("o_totalprice")).over(w).cast("double").alias("spend_30d"),
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WHERE o_custkey % 10 = 3
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "frame"),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over an explicit full-partition frame."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 3)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "window_forward_fill_ignore_nulls",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) AS ts_us,
           v AS raw_value,
           LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
    WHERE user_id % 7 = 0
    """,
    tags=("window", "ignore-nulls", "gapfill"),
)
def window_forward_fill_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF) via IGNORE NULLS: error events lose their
    reading; each row carries the most recent non-null value for the
    same user. last_value(..., ignorenulls) over a running rows frame
    is the scalable shape — one shuffle on the partition key, no
    self-join, no loop; the (ts, event_id) tiebreak makes the fill
    deterministic under concurrent-timestamp events. The standard
    time-series repair primitive before windowed feature extraction."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    v = F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
        F.col("value")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        v.alias("raw_value"),
        F.last(v, ignorenulls=True).over(w).alias("filled_value"),
    )
