"""TPC-H classic query shapes adapted to the testbed schema
(SURVEY.md §2.3/§2.4 widening, round 4).

The testbed's TPC-H-ish tables lack partsupp, l_shipmode,
l_commitdate/l_receiptdate, c_phone and the comment columns; the
queries that hinge on those (Q2/Q4/Q9/Q11/Q12/Q15/Q16/Q17/Q20/Q21)
live in queries/tpch_full.py as documented adaptations that keep the
reference plan shapes. This module holds the classics expressible
almost verbatim:

- Q6  forecast-revenue change (pure scan-side predicate bracket —
      whole query should collapse into the parquet scan + one partial
      agg, zero joins, zero wide shuffles)
- Q10 returned-item reporting (fact-fact join + broadcast dim, top-20)
- Q13 customer order-count distribution (outer join + two-level agg)
- Q14 promo revenue share (conditional aggregate over a dim join)
- Q18 large-volume customers (agg-then-join back to the fact's parents)
- Q19 discounted bracket revenue (OR'd multi-column predicates — the
      classic test that disjunctive pushdown doesn't break the plan)
- Q22 windfall customers (scalar average subquery + anti join),
      country code from the c_name suffix in lieu of c_phone

Scale notes: every dim side (nation, part at the filtered stage,
the Q18 key set, the Q22 scalar) is broadcast; the only wide
shuffles are the unavoidable fact-side group-bys. Doubles aggregate
through DECIMAL per the determinism contract (exact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.exact import SQL_DSUM, dcast, dsum
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load

_REV = "l_extendedprice * (1 - l_discount)"
_PROMO_REV = f"CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END"


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT COUNT(*) AS n_lines,
           {SQL_DSUM('l_extendedprice * l_discount')} AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    tags=("agg", "tpch", "pushdown"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue increase from hypothetically eliminating
    small-quantity discounts. Single-table bracket predicates — the
    canonical pushdown probe: the year/discount/quantity filters reach
    the parquet scan (PushedFilters), the plan is scan -> filter ->
    partial agg -> single-row final agg, no shuffle wider than the
    1-row exchange."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue_delta"),
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {SQL_DSUM(_REV)} AS revenue,
           c_acctbal, n_name, COUNT(*) AS n_lost_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "tpch", "topk"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returned items
    in a quarter. orders x lineitem is the one fact-fact shuffle;
    nation broadcasts; the LIMIT folds into TakeOrderedAndProject so
    only 20 rows ever leave the executors. Deterministic top-20 via
    the c_custkey tiebreaker."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_lost_items"),
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "n_lost_items")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("join", "agg", "tpch", "outer"),
)
def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of non-urgent order counts per
    customer. The outer join keeps zero-order customers (COUNT of a
    null-extended column is 0), then a second, much smaller aggregate
    builds the histogram — two shuffles, the second over at most
    max-order-count distinct keys."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT COUNT(*) AS n_lines,
           {SQL_DSUM(_PROMO_REV)} AS promo_revenue,
           {SQL_DSUM(_REV)} AS total_revenue,
           100.0 * {SQL_DSUM(_PROMO_REV)} / {SQL_DSUM(_REV)} AS promo_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    tags=("join", "agg", "tpch", "conditional"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from promo parts.
    Conditional aggregate over a broadcast part join — no fact
    shuffle at all besides the single-row final agg. The percentage
    divides two decimal-exact sums as identical doubles, so the
    quotient is cross-engine bit-exact."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.count("*").alias("n_lines"),
        dsum(promo).alias("promo_revenue"),
        dsum(rev).alias("total_revenue"),
        (F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_pct"),
    )


@query(
    "tpch_q18_large_volume_customers",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE)::VARCHAR AS order_date,
           o_totalprice,
           {SQL_DSUM('l_quantity')} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "agg", "tpch", "semi"),
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 250, with their
    customers. The key-set aggregate (orderkey -> sum qty) runs first
    and its surviving keys drive a LEFT SEMI join — at 100 TB the
    filtered key set is tiny relative to lineitem, so AQE converts
    the semi join to broadcast; quantities aggregate through DECIMAL
    so the HAVING threshold cuts identically in both engines."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dcast("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19_bracket_revenue",
    oracle=f"""
    SELECT COUNT(*) AS n_lines, {SQL_DSUM(_REV)} AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 5 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 10 AND 40)
    """,
    tags=("join", "tpch", "predicate"),
)
def tpch_q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three OR'd brand/size/quantity
    brackets. Disjunctive predicates straddling both join sides are
    the classic optimizer stressor: the per-side conjuncts
    (p_brand/p_size on part, l_quantity bounds on lineitem) should
    still partially push down while the cross-side OR evaluates
    post-join — part stays broadcast either way."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    qty = F.col("l_quantity")
    size = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & size.between(1, 15) & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & size.between(10, 30) & qty.between(5, 30))
        | ((F.col("p_brand") == "Brand#3") & size.between(20, 50) & qty.between(10, 40))
    )
    return joined.filter(cond).agg(
        F.count("*").alias("n_lines"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@query(
    "tpch_q22_windfall_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(c_acctbal) AS v
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT right(c_name, 2) AS cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE right(c_name, 2) IN ('00','11','22','33','44','55','66')
      AND c_acctbal > avg_bal.v
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cntrycode
    """,
    tags=("join", "anti", "subquery", "tpch"),
)
def tpch_q22_windfall_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted twice for the testbed (no c_phone — the
    two-digit country code comes from the c_name suffix; every
    customer has at least one order, so "never ordered" becomes
    "lapsed: no order since 2000", preserving the anti-join shape):
    above-average-balance lapsed customers bucketed by code. The
    global average is a 1-row broadcast (no per-row subquery); lapsed
    is a LEFT ANTI join against the date-filtered orders; the
    decimal-exact average makes the `>` cut engine-identical."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dcast("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("v"))
    )
    code = F.expr("right(c_name, 2)")
    return (
        c.withColumn("cntrycode", code)
        .filter(F.col("cntrycode").isin("00", "11", "22", "33", "44", "55", "66"))
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")).select(
                "o_custkey"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dcast("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
           year(l_shipdate) AS ship_year,
           COUNT(*) AS n_lines,
           {SQL_DSUM(_REV)} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
        OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY r1.r_name, r2.r_name, year(l_shipdate)
    """,
    tags=("join", "tpch", "multirole"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 at region grain (single nations are empty at the
    smallest test scale): cross-region trade volume between ASIA and
    EUROPE in either direction, by ship year. The same nation/region
    dims join twice in different ROLES (supplier side vs customer
    side) — both roles broadcast, so the 8-table plan still has only
    the two fact-fact shuffles (lineitem x orders, orders x customer);
    the OR'd direction pair evaluates post-join on broadcast columns."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    supp_geo = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    cust_geo = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey", F.col("r_name").alias("cust_region"))
    )
    pair = (
        ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE"))
        | ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
    )
    return (
        li.join(F.broadcast(supp_geo), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(cust_geo.withColumnRenamed("c_custkey", "cg_custkey")),
              F.col("c_custkey") == F.col("cg_custkey"))
        .filter(pair)
        .groupBy("supp_region", "cust_region", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH trade AS (
        SELECT year(o_orderdate) AS order_year,
               {_REV} AS rev,
               CASE WHEN r1.r_name = 'ASIA' THEN {_REV} ELSE 0 END AS asia_rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
        WHERE r2.r_name = 'EUROPE' AND p_type = 'STANDARD'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    )
    SELECT order_year,
           COUNT(*) AS n_lines,
           {SQL_DSUM('asia_rev')} AS asia_revenue,
           {SQL_DSUM('rev')} AS total_revenue,
           {SQL_DSUM('asia_rev')} / {SQL_DSUM('rev')} AS asia_share
    FROM trade
    GROUP BY order_year
    """,
    tags=("join", "tpch", "share"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 adapted (region supplier-origin, STANDARD parts):
    ASIA suppliers' share of EUROPE customers' STANDARD-part spend per
    order year. The share is a conditional aggregate over one joined
    stream — no second scan, no self-join; every dim (both nation
    roles, both regions, part, supplier geo) broadcasts, and the
    quotient of two decimal-exact sums is cross-engine bit-exact."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load(spark, sf_dir, "supplier")
    cust_eur = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    supp_region = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    asia_rev = F.when(F.col("supp_region") == "ASIA", rev).otherwise(F.lit(0.0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_eur), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_region), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count("*").alias("n_lines"),
            dsum(asia_rev).alias("asia_revenue"),
            dsum(rev).alias("total_revenue"),
            (dsum(asia_rev) / dsum(rev)).alias("asia_share"),
        )
    )
