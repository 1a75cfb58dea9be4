"""The remaining TPC-H classics, adapted to the testbed schema
(SURVEY.md §2.3/§2.4 widening, round 4 — completes the 22-query sweep
together with queries/tpch_more.py, join_q5_regional_revenue (Q5),
join_shipping_priority_top10 (Q3) and agg_pricing_summary (Q1)).

The testbed has no partsupp table and no l_commitdate / l_receiptdate
/ l_shipmode / p_container columns, so the queries that hinge on them
are ADAPTED — each keeps the reference query's plan shape (the thing
an engine is actually exercised by) while swapping the missing
physical column for a derivable stand-in, documented per query:

- supplier-part offerings (partsupp stand-in): the distinct
  (l_suppkey, l_partkey) pairs observed in lineitem, with
  min(l_extendedprice / l_quantity) as the offered unit price
  (supplycost stand-in) and sum(l_quantity) as the flow volume
  (availqty stand-in);
- lateness (l_receiptdate > l_commitdate stand-in): a line shipped
  more than N days after its order date
  (l_shipdate > o_orderdate + N days);
- supplier complaints (Q16/Q21 comment scan stand-in): negative
  account balance.

Every adaptation is deterministic (decimal-exact aggregates, total-
order tiebreakers under every LIMIT, IEEE-identical scalar math) and
oracled against DuckDB. Correlated EXISTS / NOT EXISTS / IN / scalar
subqueries are kept in the ORACLE SQL (DuckDB decorrelates them); the
Spark side builds the decorrelated plan explicitly — per-key
aggregates + semi/anti joins + broadcast scalars — because that is
the shape that scales: no per-row subquery execution, one shuffle per
aggregation grain, dims and scalars broadcast.

Scale notes per query are in the docstrings; plan assertions live in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_project_spark.exact import SQL_DSUM, dcast, dsum
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load

_REV = "l_extendedprice * (1 - l_discount)"

# supplier-part offerings: the partsupp stand-in (see module docstring)
_SQL_OFFERINGS = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(l_extendedprice / l_quantity) AS ps_unitprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS ps_volume
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_partkey, l_suppkey
"""


def _offerings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp stand-in: one row per (part, supplier) pair seen
    in lineitem. One group-by shuffle on the pair key; unit price is
    an IEEE division (bit-identical cross-engine), volume aggregates
    through DECIMAL."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    return (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_unitprice"),
            F.sum(dcast("l_quantity")).cast("double").alias("ps_volume"),
        )
    )


def _supplier_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier x nation x region, dims broadcast."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name", "r_name")
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH offerings AS ({_SQL_OFFERINGS}),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cand AS (
        SELECT s_acctbal, s_name, s_suppkey, n_name, p_partkey, p_name,
               ps_unitprice,
               MIN(ps_unitprice) OVER (PARTITION BY p_partkey) AS min_price
        FROM part
        JOIN offerings ON p_partkey = ps_partkey
        JOIN eu ON ps_suppkey = s_suppkey
        WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
    )
    SELECT s_acctbal, s_name, s_suppkey, n_name, p_partkey, p_name,
           ps_unitprice AS unit_price
    FROM cand
    WHERE ps_unitprice = min_price
    ORDER BY s_acctbal DESC, s_suppkey, p_partkey
    LIMIT 100
    """,
    tags=("join", "tpch", "subquery", "window"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (offerings stand in for partsupp): for each
    mid-size STANDARD part, the EUROPE supplier(s) offering the
    minimum unit price, richest suppliers first. The reference's
    correlated MIN subquery is decorrelated into a window MIN over
    p_partkey — one extra exchange on a set already filtered to ~3%
    of parts, instead of a per-part subquery. Supplier geo broadcasts;
    the (part, supplier) offering aggregate is the only fact shuffle.
    Ties on the min price keep every attaining supplier (same rows as
    the correlated form); (s_suppkey, p_partkey) is a total-order
    tiebreaker under the LIMIT."""
    p = load(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    eu = _supplier_geo(spark, sf_dir).filter(F.col("r_name") == "EUROPE")
    cand = (
        _offerings(spark, sf_dir)
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_price", F.min("ps_unitprice").over(w))
        .filter(F.col("ps_unitprice") == F.col("min_price"))
        .select(
            "s_acctbal",
            "s_name",
            "s_suppkey",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_unitprice").alias("unit_price"),
        )
        .orderBy(F.desc("s_acctbal"), "s_suppkey", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "tpch", "subquery"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted (late line = shipped >90 days after the order
    date, standing in for l_commitdate < l_receiptdate): count one
    quarter's orders per priority having at least one late line. The
    EXISTS becomes a LEFT SEMI join whose condition spans both sides
    (l_shipdate > o_orderdate + 90d) — Spark evaluates the extra
    conjunct inside the semi join, so each order is emitted at most
    once with no distinct pass; the quarter filter pushes to the
    orders scan first."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           COUNT(*) AS n_lines,
           {SQL_DSUM('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity')} AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (supply cost stand-in: 60% of retail price,
    since partsupp is absent): profit on green parts by supplier
    nation and order year. Five-table plan with exactly one fact-fact
    shuffle (lineitem x orders); the green-part filter broadcasts
    part, supplier geo broadcasts, so the profit expression is
    computed map-side before the single wide aggregate. The profit
    mixes products of doubles — each term is IEEE-identical
    cross-engine, and the sum goes through DECIMAL."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    supp_nation = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.count("*").alias("n_lines"), dsum(profit).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_parts",
    oracle=f"""
    WITH flow AS (
        SELECT l_partkey AS p_partkey, {SQL_DSUM(_REV)} AS part_value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY l_partkey
    )
    SELECT p_partkey, part_value
    FROM flow
    WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS DECIMAL(38,6))) AS DOUBLE)
                          * 2.0 / COUNT(*) FROM flow)
    """,
    tags=("agg", "subquery", "tpch"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (shipped value from ASIA-based suppliers
    stands in for partsupp stock value): parts whose flow value
    exceeds twice the mean part value. The HAVING-over-global-total scalar
    subquery is decorrelated into a 1-row aggregate broadcast-joined
    back — the per-part flow is computed ONCE (cached) and reused for
    both the total and the filter, so the fact table is scanned and
    shuffled a single time. The mean-relative threshold keeps the
    query growth-stable across scale factors (a fixed fraction of the
    total would select nothing once the part count outgrows it)."""
    from bigdata_project_spark.caching import tracked_persist

    li = load(spark, sf_dir, "lineitem")
    asia_supp = _supplier_geo(spark, sf_dir).filter(F.col("r_name") == "ASIA").select("s_suppkey")
    flow = tracked_persist(
        li.join(F.broadcast(asia_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("part_value"))
    )
    total = flow.agg(
        (F.sum(dcast("part_value")).cast("double") * F.lit(2.0) / F.count("*")).alias(
            "threshold"
        )
    )
    return (
        flow.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("p_partkey", "part_value")
    )


@query(
    "tpch_q12_late_priority",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
    tags=("join", "agg", "conditional", "tpch"),
)
def tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (l_returnflag stands in for l_shipmode,
    shipped >60 days after order date stands in for the
    commit/receipt lateness): how many high- vs low-priority orders
    ride each ship class among 1996's late lines. The year filter
    pushes to the lineitem scan; the lateness predicate spans the
    join and evaluates inside it; the conditional counts are one
    map-side CASE pair feeding a 3-group aggregate."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no, {SQL_DSUM(_REV)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    tags=("agg", "subquery", "tpch"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with the maximum revenue in one
    quarter. The revenue view is computed once (cached) and reused
    for both the MAX scalar and the equality filter — the reference's
    view + scalar subquery becomes agg -> 1-row broadcast -> filter.
    Revenue is decimal-exact, so the MAX and the `=` cut are
    cross-engine identical (ties would all be kept, as in the
    reference). Supplier is a broadcast dim."""
    from bigdata_project_spark.caching import tracked_persist

    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = tracked_persist(
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "agg", "anti", "tpch"),
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (observed lineitem pairs stand in for
    partsupp; negative account balance stands in for the complaint
    comment scan): distinct supplier counts per surviving
    brand/type/size bucket. The NOT IN becomes a LEFT ANTI join
    against the (tiny, broadcast) excluded-supplier set — safe here
    because s_suppkey is never null, sidestepping NOT IN's
    three-valued-logic trap; part filters broadcast; the distinct
    count is one grouped shuffle."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    WITH pavg AS (
        SELECT l_partkey AS avg_partkey,
               (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(l_quantity)) AS avg_qty
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_lines,
           {SQL_DSUM('l_extendedprice')} / 2.0 AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pavg ON l_partkey = avg_partkey
    WHERE p_brand = 'Brand#3'
      AND p_size < 15
      AND l_quantity < 0.2 * avg_qty
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 adapted (p_size < 15 stands in for the container
    predicate): revenue that would be lost by refusing small-quantity
    orders of one brand's small parts. The correlated per-part AVG
    subquery is decorrelated into a (partkey -> avg) aggregate joined
    back; at scale the avg table has one row per part, orders of
    magnitude smaller than lineitem, and AQE picks a broadcast for
    it. The average is decimal-sum / count, so the 0.2 x avg cut is
    IEEE-identical cross-engine."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15)
    )
    pavg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.sum(dcast("l_quantity")).cast("double") / F.count("l_quantity")).alias(
            "avg_qty"
        )
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(pavg, li.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.count("*").alias("n_lines"),
            (dsum("l_extendedprice") / F.lit(2.0)).alias("avg_yearly"),
        )
    )


@query(
    "tpch_q20_excess_shippers",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE '%blue%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 50
      )
    """,
    tags=("join", "semi", "subquery", "tpch"),
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (shipped volume > 50 units of a blue part
    in 1996 stands in for the partsupp excess-stock test): ASIA
    suppliers who moved unusually large volumes. The nested IN
    becomes: per-(supplier, part) volume aggregate -> HAVING filter
    -> LEFT SEMI join into the broadcast-dim supplier geo. The year
    and part filters reach the lineitem/part scans before the one
    grouped shuffle; quantities aggregate through DECIMAL so the
    threshold cuts identically."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    movers = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dcast("l_quantity")).alias("vol"))
        .filter(F.col("vol") > 50)
        .select("l_suppkey")
    )
    asia = _supplier_geo(spark, sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        asia.join(movers, asia.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s_name, s_suppkey, COUNT(*) AS numwait
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name, s_suppkey
    ORDER BY numwait DESC, s_suppkey
    LIMIT 100
    """,
    tags=("join", "semi", "anti", "subquery", "tpch"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (shipped >60 days after order date stands in
    for receipt-after-commit lateness; ASIA region stands in for the
    single-nation filter): suppliers who were the SOLE late shipper
    on finalized multi-supplier orders, by number of late lines. The
    oracle keeps the reference's correlated EXISTS / NOT EXISTS pair;
    the Spark plan decorrelates both into ONE per-(order, supplier)
    aggregate — n_supp > 1 replaces the EXISTS, n_late_supp = 1
    replaces the NOT EXISTS — so lineitem is scanned once and
    shuffled once on the order key, instead of three correlated
    probes. That rewrite is the difference between a plan that runs
    at 100 TB and one that doesn't."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast("int"),
    )
    per_pair = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late"),
        F.sum("is_late").alias("late_lines"),
    )
    per_order = per_pair.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.count("*").alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
    )
    waiting = (
        per_pair.join(per_order, F.col("l_orderkey") == F.col("agg_orderkey"))
        .filter((F.col("supp_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .select("l_suppkey", "late_lines")
    )
    asia = _supplier_geo(spark, sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        waiting.join(F.broadcast(asia), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name", "s_suppkey")
        .agg(F.sum("late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(100)
    )
