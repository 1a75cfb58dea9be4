"""Analytical extensions: linear regression aggregates, distribution
entropy, and ratio-to-report windows — serving-layer metrics built on
the exact-statistics discipline (SURVEY.md §2.4/2.5 long tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.exact import DEC
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "agg_regression_price_on_qty",
    oracle="""
    WITH c AS (
        SELECT l_returnflag,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
        FROM lineitem
    ), s AS (
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxy
        FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_cents_per_unit,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept_cents
    FROM s
    """,
    tags=("agg", "regression"),
)
def agg_regression_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression aggregates (regr_slope / regr_intercept
    semantics) from exact integer sufficient statistics — one pass,
    map-side combinable; price in cents so every sum is exact."""
    l = load(spark, sf_dir, "lineitem")
    x = F.round("l_quantity", 0).cast("long")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    c = l.select("l_returnflag", x.alias("x"), y.alias("y"))
    yd = F.col("y").cast("decimal(38,0)")
    s = c.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(yd * F.col("x")).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, sxy = (F.col(k) for k in ("n", "sx", "sxx", "sy", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        "n",
        slope.alias("slope_cents_per_unit"),
        ((sy - slope * sx) / n).alias("intercept_cents"),
    )


@query(
    "agg_user_event_entropy",
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type
    ), totals AS (
        SELECT user_id, SUM(c) AS total FROM counts GROUP BY user_id
    )
    SELECT c.user_id,
           ROUND(-SUM((CAST(c.c AS DOUBLE) / t.total) * LN(CAST(c.c AS DOUBLE) / t.total)), 6)
               AS entropy_nats,
           COUNT(*) AS n_types
    FROM counts c JOIN totals t ON c.user_id = t.user_id
    GROUP BY c.user_id
    """,
    tags=("agg", "entropy"),
)
def agg_user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature (and a quality signal for LLM-corpus
    source mixing). ln rounded to 6 (libm ulps); everything feeding
    it is exact integer ratios so the sum has a fixed tiny term count
    (<= 5 types) and identical association order after the group sort.
    """
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    totals = counts.groupBy("user_id").agg(F.sum("c").alias("total"))
    p = F.col("c").cast("double") / F.col("total")
    joined = counts.join(totals, "user_id")
    # fixed summation order: sort terms by event_type inside the group
    per_type = joined.select("user_id", "event_type", (p * F.log(p)).alias("term"))
    terms = per_type.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("event_type", "term"))).alias("ts")
    )
    ent = F.round(
        -F.aggregate(F.col("ts"), F.lit(0.0), lambda acc, s: acc + s["term"]), 6
    )
    return terms.select(
        "user_id",
        ent.alias("entropy_nats"),
        F.size("ts").alias("n_types"),
    )


@query(
    "window_ratio_to_report",
    oracle="""
    SELECT n_name, o_orderkey,
           o_totalprice,
           o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
               OVER (PARTITION BY n_name) AS DOUBLE) AS share_of_nation
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderkey % 25 = 0
    """,
    tags=("window", "ratio"),
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order's share of its nation's total —
    the market-share window (decimal-exact denominator, one
    deterministic division per row)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    j = o.join(c, o.o_custkey == c.c_custkey).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    total = F.sum(F.col("o_totalprice").cast(DEC)).over(W.partitionBy("n_name")).cast("double")
    return j.select(
        "n_name",
        "o_orderkey",
        "o_totalprice",
        (F.col("o_totalprice") / total).alias("share_of_nation"),
    )
