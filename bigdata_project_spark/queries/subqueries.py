"""SQL subquery / modern-SQL surface (SURVEY.md §2.3, §2.4 [ext]).

The reference's declared "fast querying & analytics" store
(reference README.md:29-32) implies the full ANSI subquery surface a
BI layer generates: EXISTS / NOT EXISTS, IN, correlated scalar
subqueries, LATERAL joins, and recursive CTEs. Catalyst decorrelates
all of these into joins (RewritePredicateSubquery / lateral-join
planning), so at 100 TB each form below executes as a broadcast or
shuffled join — no per-row re-execution of the inner query.

Also covers the modern-SQL convenience layer (GROUP BY ALL, listagg
WITHIN GROUP, VARIANT semi-structured access) so SQL written against
DuckDB/Snowflake-style engines ports without rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.exact import SPARK_SQL_DSUM, SQL_DSUM
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(f"v_sq_{n}")


@query(
    "sub_exists_urgent_buyers",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_buyers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
    tags=("subquery", "exists"),
)
def sub_exists_urgent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst rewrites to a left-semi join on
    o_custkey (the filter on priority is pushed below the join)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS n_buyers
        FROM v_sq_customer c
        WHERE EXISTS (SELECT 1 FROM v_sq_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        GROUP BY c.c_mktsegment
        """
    )


@query(
    "sub_not_exists_no_big_order",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 450000)
    """,
    tags=("subquery", "not-exists"),
)
def sub_not_exists_no_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → left-anti join. Unlike NOT IN, this is
    null-safe by construction (no three-valued-logic trap)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_acctbal
        FROM v_sq_customer c
        WHERE NOT EXISTS (SELECT 1 FROM v_sq_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 450000)
        """
    )


@query(
    "sub_in_top_nation_buyers",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                                                WHERE n_regionkey = 0))
    GROUP BY o.o_orderpriority
    """,
    tags=("subquery", "in"),
)
def sub_in_top_nation_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested uncorrelated IN subqueries → semi-join chain; the inner
    nation filter broadcasts, only the customer semi-join shuffles."""
    _views(spark, sf_dir, "customer", "orders", "nation")
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS n_orders
        FROM v_sq_orders o
        WHERE o.o_custkey IN (SELECT c_custkey FROM v_sq_customer
                              WHERE c_nationkey IN (SELECT n_nationkey FROM v_sq_nation
                                                    WHERE n_regionkey = 0))
        GROUP BY o.o_orderpriority
        """
    )


@query(
    "sub_scalar_correlated_max_item",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           (SELECT MAX(l.l_extendedprice) FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey) AS max_item_price
    FROM orders o
    WHERE o.o_totalprice > 450000
    """,
    tags=("subquery", "scalar-correlated"),
)
def sub_scalar_correlated_max_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — decorrelated into aggregate +
    left outer join, so the lineitem side is scanned once, not
    per-row. MAX of a single double is order-free (no dsum needed)."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice,
               (SELECT MAX(l.l_extendedprice) FROM v_sq_lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS max_item_price
        FROM v_sq_orders o
        WHERE o.o_totalprice > 450000
        """
    )


@query(
    "join_lateral_top2_per_nation",
    oracle="""
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) c
    """,
    tags=("subquery", "lateral", "topk"),
)
def join_lateral_top2_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group ORDER BY + LIMIT —
    the SQL spelling of grouped top-k (c_custkey tie-break makes it
    deterministic). Planned as a lateral join + per-key local sort;
    equivalent at scale to the window row_number() form."""
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_acctbal
        FROM v_sq_nation n, LATERAL (
            SELECT c_custkey, c_acctbal FROM v_sq_customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) c
        """
    )


@query(
    "cte_recursive_price_histogram",
    oracle="""
    WITH RECURSIVE spine(bucket) AS (
        SELECT 0
        UNION ALL
        SELECT bucket + 1 FROM spine WHERE bucket < 10
    )
    SELECT s.bucket,
           s.bucket * 50000 AS lo_price,
           COUNT(o.o_orderkey) AS n_orders
    FROM spine s
    LEFT JOIN orders o
      ON CAST(FLOOR(o.o_totalprice / 50000) AS INT) = s.bucket
    GROUP BY s.bucket
    """,
    tags=("subquery", "recursive-cte", "histogram"),
)
def cte_recursive_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4.1) generating a dense bucket spine,
    left-joined to a price histogram so empty buckets surface as 0 —
    the gap-fill pattern in pure SQL. The spine is 11 rows, so the
    join broadcasts; recursion depth is constant, not data-driven."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE spine(bucket) AS (
            SELECT 0
            UNION ALL
            SELECT bucket + 1 FROM spine WHERE bucket < 10
        )
        SELECT s.bucket,
               s.bucket * 50000 AS lo_price,
               COUNT(o.o_orderkey) AS n_orders
        FROM spine s
        LEFT JOIN v_sq_orders o
          ON CAST(FLOOR(o.o_totalprice / 50000) AS INT) = s.bucket
        GROUP BY s.bucket
        """
    )


@query(
    "sql_group_by_all_daily",
    oracle=f"""
    SELECT event_type,
           CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           {SQL_DSUM('value')} AS total_value
    FROM events
    GROUP BY ALL
    """,
    tags=("agg", "sql", "group-by-all"),
)
def sql_group_by_all_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — modern-SQL sugar (groups by every non-aggregate
    select item); identical plan to the explicit GROUP BY."""
    _views(spark, sf_dir, "events")
    return spark.sql(
        f"""
        SELECT event_type,
               CAST(ts AS DATE) AS day,
               COUNT(*) AS n_events,
               {SPARK_SQL_DSUM('value')} AS total_value
        FROM v_sq_events
        GROUP BY ALL
        """
    )


@query(
    "agg_listagg_nations_per_region",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("agg", "listagg"),
)
def agg_listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg WITHIN GROUP (ORDER BY ...) — ordered string
    concatenation per group (DuckDB spells it string_agg). The
    explicit ORDER BY inside the aggregate is what makes the value
    deterministic under partitioned (arbitrary-order) input."""
    _views(spark, sf_dir, "nation", "region")
    return spark.sql(
        """
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        FROM v_sq_nation JOIN v_sq_region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@query(
    "scalar_variant_props_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           COUNT(*) AS n
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1
    """,
    tags=("scalar", "variant", "json"),
)
def scalar_variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4) semi-structured access: parse the JSON props
    column once into a binary variant, then path-extract with `:` —
    faster than repeated get_json_object string re-parses and the
    open-lakehouse answer to Mongo-style flexible documents."""
    e = load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    return (
        e.select(F.parse_json("props").alias("v"))
        .select(F.expr("CAST(v:k AS INT)").alias("k_val"))
        .groupBy("k_val")
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_sketch_hll_topk",
    oracle=None,  # estimates are engine-specific by design — rows-only gate
    tags=("agg", "sketch", "rows-only"),
)
def agg_sketch_hll_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches surface (Spark 4): mergeable HLL sketches
    for distinct users per event type plus approx_top_k heavy
    hitters. Sketches are the 100 TB answer to exact distinct counts:
    fixed-size state, map-side combinable, and unionable across days
    (hll_union_agg) without rescanning history."""
    e = load(spark, sf_dir, "events")
    # top-k over CAST(value AS BIGINT), not raw value: the raw doubles
    # are near-unique so "top" would be tie-noise; the int buckets have
    # ~100-200 distinct values per group — real heavy hitters, and few
    # enough that the space-saving sketch tracks them exactly (counts
    # are exact when cardinality <= maxItemsTracked), which is what
    # lets tests/test_approx.py put a hard bound on the output
    return (
        e.groupBy("event_type")
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("approx_users"),
            F.expr("approx_top_k(CAST(value AS BIGINT), 3)").alias("top_values"),
            F.count("*").alias("n_events"),
        )
        .select("event_type", "approx_users", F.to_json("top_values").alias("top_values_json"), "n_events")
    )


@query(
    "sub_not_in_null_aware",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey NOT IN (
        SELECT CASE WHEN c_acctbal > -1e12 THEN c_custkey END
        FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    ORDER BY o_orderkey
    """,
    tags=("subquery", "not-in", "null-aware"),
)
def sub_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN against a NULLABLE subquery — the SQL footgun pinned:
    three-valued logic makes `x NOT IN (set containing NULL)` UNKNOWN
    for every x, so one NULL empties the whole result. Spark
    therefore cannot plan a plain anti join when the subquery column
    is nullable; it plans the NULL-AWARE anti join (BroadcastHashJoin
    LeftAnti with isNullAwareAntiJoin=true, streamed-null/build-null
    checks at runtime — plan-asserted in tests/test_plans.py). Here
    the CASE arm is always taken, so the TYPE is nullable (forcing
    the null-aware plan) while the SET is null-free (so the result is
    the meaningful 'orders not from BUILDING customers').

    Scale: the null-aware build side must broadcast (Spark refuses a
    shuffle NAAJ); fine when the subquery is dimension-sized, and the
    rewrite for a fact-sized subquery is the explicit null-guarded
    LEFT ANTI the other sub_* queries demonstrate."""
    from bigdata_project_spark.tables import load

    load(spark, sf_dir, "orders").createOrReplaceTempView("v_naaj_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_naaj_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM v_naaj_orders
        WHERE o_custkey NOT IN (
            SELECT CASE WHEN c_acctbal > -1e12 THEN c_custkey END
            FROM v_naaj_customer WHERE c_mktsegment = 'BUILDING'
        )
        ORDER BY o_orderkey
        """
    )
