"""Join operators (SURVEY.md §2.3).

The reference implements zero joins ([code] count 0); this is the
standard relational join surface its declared analytics layer
(README.md:29-32) needs: inner/outer/semi/anti equi-joins, broadcast
hash joins for dims, theta/range join, as-of join, cross join.

Scale notes: dims (region/nation/supplier/part, price bands) are
broadcast — no shuffle of the fact side; fact-fact joins
(orders x lineitem) shuffle on the join key and AQE handles skew.
The as-of join is the union+last_value pattern — a single shuffle by
key, no per-row lookups — which scales to arbitrarily large event
streams (vs. the naive range-join-then-argmax which explodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.exact import SPARK_SQL_DSUM, SQL_DSUM, dsum
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "join_revenue_per_nation",
    oracle=f"""
    SELECT n_name,
           COUNT(*) AS n_orders,
           {SQL_DSUM('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "inner"),
)
def join_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain fact->dim->dim; nation broadcast."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@query(
    "join_broadcast_brand_volume",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_lineitems,
           {SQL_DSUM('l_quantity')} AS total_qty
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size >= 30
    GROUP BY p_brand
    """,
    tags=("join", "broadcast"),
)
def join_broadcast_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: big fact x small dim, filter pushed to the
    dim side before broadcast (no shuffle of lineitem)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 30)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lineitems"), dsum("l_quantity").alias("total_qty"))
    )


@query(
    "join_left_outer_customer_orders",
    oracle=f"""
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           COUNT(CASE WHEN o.o_custkey IS NULL THEN 1 END) AS rows_without_orders,
           {SQL_DSUM('COALESCE(o_totalprice, 0)')} AS spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c_nationkey
    """,
    tags=("join", "outer"),
)
def join_left_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("rows_without_orders"),
        dsum(F.coalesce(F.col("o_totalprice"), F.lit(0))).alias("spend"),
    )


@query(
    "join_full_outer_nation_presence",
    oracle="""
    WITH hc AS (
        SELECT c_nationkey AS nk, COUNT(*) AS n_rich
        FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ), sp AS (
        SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(hc.nk, sp.nk) AS nationkey,
           COALESCE(n_rich, 0) AS n_rich,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM hc FULL OUTER JOIN sp ON hc.nk = sp.nk
    """,
    tags=("join", "outer"),
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates with disjoint key coverage."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    hc = c.filter(F.col("c_acctbal") > 9000).groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_rich"))
    sp = s.groupBy(F.col("s_nationkey").alias("nk2")).agg(F.count("*").alias("n_suppliers"))
    j = hc.join(sp, hc.nk == sp.nk2, "full")
    return j.select(
        F.coalesce("nk", "nk2").alias("nationkey"),
        F.coalesce("n_rich", F.lit(0)).alias("n_rich"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "join_semi_big_spenders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    GROUP BY c_mktsegment
    """,
    tags=("join", "semi"),
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with at least one big order.
    Semi-join avoids duplicating customer rows per matching order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "join_anti_never_ordered",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    tags=("join", "anti"),
)
def join_anti_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders before
    1996 — the scalable form of the reference's 'listings never seen
    before' set-membership check (SURVEY.md §2.3). The date filter
    keeps the result non-trivial at every scale factor (at sf>=0.01
    every customer has *some* order)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-01-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )


_BANDS = [(0, 0, 100000), (1, 100000, 200000), (2, 200000, 300000), (3, 300000, 400000), (4, 400000, 600000)]
_BANDS_SQL = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _BANDS)


@query(
    "join_range_price_bands",
    oracle=f"""
    SELECT band_id,
           COUNT(*) AS n_orders,
           {SQL_DSUM('o_totalprice')} AS revenue
    FROM orders
    JOIN (VALUES {_BANDS_SQL}) AS b(band_id, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_id
    """,
    tags=("join", "range"),
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join against a broadcast band table (BNLJ on a
    tiny broadcast side — the right physical plan for interval
    lookup; at scale the alternative is a bucketized equi-join)."""
    o = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, ["band_id", "lo", "hi"])
    cond = (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi)
    return (
        o.join(F.broadcast(bands), cond)
        .groupBy("band_id")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@query(
    "join_asof_purchase_click",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ), purchases AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_event_id,
           p.user_id AS user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           c.click_event_id AS click_event_id,
           epoch_us(c.ts) AS click_ts_us
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("join", "asof"),
)
def join_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it
    (attribution). Implemented with the scalable union+last_value
    pattern — one shuffle on user_id, no range-join explosion:
    tag both sides, sort by (ts, side), carry the last click struct
    forward with last(..., ignorenulls=True), keep purchase rows.
    Equivalent to DuckDB's native ASOF JOIN (the oracle).
    """
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id"), F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("click_event_id"), F.lit(1).alias("side"), "event_id"
    )
    unioned = clicks.unionByName(purchases)
    # ordering (ts, side, click_event_id) makes the carried last-click
    # the max-event_id click at the latest ts <= purchase ts — the
    # same-(user,ts) dedup falls out of the sort, so the whole as-of
    # is ONE shuffle on user_id (no pre-aggregation exchange)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "click_event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    click_info = F.when(F.col("side") == 0, F.struct(F.col("ts").alias("cts"), F.col("click_event_id").alias("cid")))
    carried = unioned.withColumn("last_click", F.last(click_info, ignorenulls=True).over(w))
    return carried.filter(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id"),
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("last_click.cid").alias("click_event_id"),
        F.unix_micros("last_click.cts").alias("click_ts_us"),
    )


@query(
    "join_cross_region_status",
    oracle="""
    SELECT r_name, o_orderstatus,
           COUNT(*) AS n_combos
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    GROUP BY r_name, o_orderstatus
    """,
    tags=("join", "cross"),
)
def join_cross_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (small x small only — guarded use at scale)."""
    r = load(spark, sf_dir, "region")
    s = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).groupBy("r_name", "o_orderstatus").agg(F.count("*").alias("n_combos"))


@query(
    "join_shipping_priority_top10",
    oracle=f"""
    SELECT o_orderkey,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("join", "topk", "flagship"),
)
def join_shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style: selective dim filter -> fact-fact join ->
    agg -> deterministic top-k (TakeOrderedAndProject)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"), "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "join_hint_broadcast_sql",
    oracle=f"""
    SELECT r_name, COUNT(*) AS n_suppliers, {SQL_DSUM('s_acctbal')} AS total_bal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("join", "sql", "hint"),
)
def join_hint_broadcast_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-level join-strategy hints (/*+ BROADCAST */): the knob a
    SQL-only user has where the DataFrame API would call broadcast().
    Hints change the physical plan, never the result — the oracle is
    the same query unhinted."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("v_h_supplier")
    load(spark, sf_dir, "nation").createOrReplaceTempView("v_h_nation")
    load(spark, sf_dir, "region").createOrReplaceTempView("v_h_region")
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(v_h_nation), BROADCAST(v_h_region) */
               r_name, COUNT(*) AS n_suppliers,
               {SPARK_SQL_DSUM('s_acctbal')} AS total_bal
        FROM v_h_supplier
        JOIN v_h_nation ON s_nationkey = n_nationkey
        JOIN v_h_region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS pri_key, o_totalprice
        FROM orders
    ),
    w AS (
        SELECT NULLIF(p, '1-URGENT') AS pri_key, wgt FROM (VALUES
            ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
            ('4-NOT SPECIFIED', 2), ('5-LOW', 1)) AS t(p, wgt)
    )
    SELECT w.wgt AS wgt,
           COUNT(*) AS n_orders,
           MIN(o.o_orderkey) AS min_key
    FROM o JOIN w ON o.pri_key IS NOT DISTINCT FROM w.pri_key
    GROUP BY w.wgt
    """,
    tags=("join", "null-safe"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match NULL keys instead of vanishing — the semantics needed when a
    dimension legitimately keys on 'unknown'. Both sides derive a
    nullable key (urgent priority -> NULL) so the null bucket is
    non-empty and its matching is actually exercised. Plan note: <=>
    is still an equi-join condition, so Catalyst uses a hash join
    (broadcast here — the weight table is 5 rows), never a
    nested-loop; null keys hash like any other value."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pri_key"),
    )
    w = spark.createDataFrame(
        [("1-URGENT", 5), ("2-HIGH", 4), ("3-MEDIUM", 3), ("4-NOT SPECIFIED", 2), ("5-LOW", 1)],
        ["p", "wgt"],
    ).select(F.nullif(F.col("p"), F.lit("1-URGENT")).alias("pri_key"), "wgt")
    return (
        o.join(F.broadcast(w), o["pri_key"].eqNullSafe(w["pri_key"]))
        .groupBy("wgt")
        .agg(F.count("*").alias("n_orders"), F.min("o_orderkey").alias("min_key"))
    )


@query(
    "join_market_basket_pairs",
    oracle="""
    WITH pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, COUNT(*) AS n_orders_together
    FROM pairs
    GROUP BY part_a, part_b
    ORDER BY n_orders_together DESC, part_a, part_b
    LIMIT 20
    """,
    tags=("join", "affinity", "topk"),
)
def join_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 20 part pairs most often bought in
    the same order. The self-join is keyed on l_orderkey with the
    a < b orientation, so each unordered pair counts once; fan-out
    per order is bounded by (lines-per-order choose 2) — a per-key
    constant, NOT corpus-quadratic (the same bounded-group discipline
    as the capped shingle joins). Distinct (order, part) first so
    multi-line quantities don't inflate co-occurrence. Top-20 via
    TakeOrderedAndProject with the full pair tiebreak."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders_together"))
        .orderBy(F.desc("n_orders_together"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "join_asof_tolerance_1h",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, MAX(event_id) AS cid
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ), p AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    )
    SELECT purchase_event_id, user_id, purchase_ts_us,
           click_event_id, click_ts_us
    FROM (
        SELECT p.event_id AS purchase_event_id, p.user_id AS user_id,
               epoch_us(p.ts) AS purchase_ts_us,
               c.cid AS click_event_id, epoch_us(c.ts) AS click_ts_us,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC NULLS LAST, c.cid DESC NULLS LAST
               ) AS rn
        FROM p LEFT JOIN clicks c
          ON p.user_id = c.user_id
         AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL '1 hour'
    ) WHERE rn = 1
    """,
    tags=("join", "asof", "tolerance"),
)
def join_asof_tolerance_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH A TOLERANCE (pandas merge_asof(tolerance=...)
    semantics): each purchase takes the latest same-user click
    at-or-before it, but only if that click is within the trailing
    hour — older matches become NULL, not stale attributions. Same
    union+last_value sweep as join_asof_purchase_click (ONE shuffle
    on the entity key, no range-join candidate set); the tolerance is
    a post-sweep predicate on the carried click's age, so it adds
    ZERO plan cost — the crucial property at 100 TB, where the naive
    tolerance formulation (a range join on [t-1h, t]) would plan a
    nested loop. Click ties at one instant resolve to max event_id,
    purchases at the exact click instant DO match (click sorts before
    purchase at equal timestamps via the side flag)."""
    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.unix_micros("ts").alias("t_us"))
        .agg(F.max("event_id").alias("cid"))
        .select("user_id", "t_us", F.lit(0).alias("side"), "cid", F.lit(None).cast("long").alias("pid"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_micros("ts").alias("t_us"),
            F.lit(1).alias("side"),
            F.lit(None).cast("long").alias("cid"),
            F.col("event_id").alias("pid"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = clicks.unionAll(purchases).withColumn(
        "last_click",
        F.last(
            F.when(F.col("side") == 0, F.struct("t_us", "cid")), ignorenulls=True
        ).over(w),
    )
    HOUR_US = 3_600_000_000
    in_tol = F.col("last_click.t_us") > F.col("t_us") - HOUR_US
    return (
        swept.filter(F.col("side") == 1)
        .select(
            F.col("pid").alias("purchase_event_id"),
            "user_id",
            F.col("t_us").alias("purchase_ts_us"),
            F.when(in_tol, F.col("last_click.cid")).alias("click_event_id"),
            F.when(in_tol, F.col("last_click.t_us")).alias("click_ts_us"),
        )
        .orderBy("purchase_event_id")
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, MAX(event_id) AS pid
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ), c AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    )
    SELECT click_event_id, user_id, click_ts_us,
           purchase_event_id, purchase_ts_us
    FROM (
        SELECT c.event_id AS click_event_id, c.user_id AS user_id,
               epoch_us(c.ts) AS click_ts_us,
               p.pid AS purchase_event_id, epoch_us(p.ts) AS purchase_ts_us,
               ROW_NUMBER() OVER (
                   PARTITION BY c.event_id
                   ORDER BY p.ts ASC NULLS LAST, p.pid ASC NULLS LAST
               ) AS rn
        FROM c LEFT JOIN purchases p
          ON p.user_id = c.user_id AND p.ts >= c.ts
    ) WHERE rn = 1
    """,
    tags=("join", "asof", "forward"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward'):
    each click takes the EARLIEST same-user purchase at-or-after it —
    the time-to-outcome pairing (click -> eventual conversion), the
    mirror of the backward attribution join. Same union+last_value
    sweep, run in DESCENDING time order: sorting (t DESC, side) with
    purchases flagged to sort before clicks at equal instants makes
    `last(purchase, ignorenulls)` carry the NEXT purchase backward
    through time, so an at-the-same-instant purchase matches
    (inclusive >=). One shuffle on the entity key; no range join.
    Purchase ties at one instant resolve to max event_id before the
    sweep, exactly as the oracle's pre-dedup."""
    ev = load(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.unix_micros("ts").alias("t_us"))
        .agg(F.max("event_id").alias("pid"))
        .select("user_id", "t_us", F.lit(0).alias("side"), "pid", F.lit(None).cast("long").alias("cid"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.unix_micros("ts").alias("t_us"),
            F.lit(1).alias("side"),
            F.lit(None).cast("long").alias("pid"),
            F.col("event_id").alias("cid"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("t_us"), F.asc("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = purchases.unionAll(clicks).withColumn(
        "next_p",
        F.last(
            F.when(F.col("side") == 0, F.struct("t_us", "pid")), ignorenulls=True
        ).over(w),
    )
    return (
        swept.filter(F.col("side") == 1)
        .select(
            F.col("cid").alias("click_event_id"),
            "user_id",
            F.col("t_us").alias("click_ts_us"),
            F.col("next_p.pid").alias("purchase_event_id"),
            F.col("next_p.t_us").alias("purchase_ts_us"),
        )
        .orderBy("click_event_id")
    )


@query(
    "join_range_price_bands_binned",
    oracle=f"""
    SELECT band_id,
           COUNT(*) AS n_orders,
           {SQL_DSUM('o_totalprice')} AS revenue
    FROM orders
    JOIN (VALUES {_BANDS_SQL}) AS b(band_id, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_id
    """,
    tags=("join", "range", "binned", "two-stage"),
)
def join_range_price_bands_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUCKETIZED-EQUI-JOIN form of the interval lookup — the
    scale path join_range_price_bands' docstring promises, now
    implemented: when the band table is too large or too hot to
    broadcast-nested-loop, decompose the range predicate instead.
    Facts bucket by price div W (integer on cents, W = $50k);
    each band EXPANDS to the buckets its [lo, hi) covers — a
    bounded, data-independent fan-out of ceil(width/W) rows per
    band via sequence() — and the join becomes a plain hash-
    joinable EQUI join on the bucket id with the exact range check
    as a residual (carry/offset analogue: the band's bucket list
    IS its carry structure). Same oracle as the BNLJ form — the
    two plans must agree exactly.

    At 100 TB with thousands of bands, the equi-join shuffles on
    the bucket id (or broadcasts the expanded band-bucket table,
    still tiny); no nested loop over facts x bands."""
    W = 50_000_00  # $50k in cents (integer arithmetic)
    o = load(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    ).withColumn("bucket", F.expr(f"cents div {W}"))
    bands = spark.createDataFrame(_BANDS, ["band_id", "lo", "hi"])
    bexp = bands.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"cast(lo as bigint) * 100 div {W}"),
                F.expr(f"(cast(hi as bigint) * 100 - 1) div {W}"),
            )
        ),
    )
    joined = o.join(
        F.broadcast(bexp),
        (o.bucket == bexp.bucket)
        & (o.o_totalprice >= bexp.lo)
        & (o.o_totalprice < bexp.hi),
    )
    return (
        joined.groupBy("band_id")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .orderBy("band_id")
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, MAX(event_id) AS cid
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ), p AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    )
    SELECT purchase_event_id, user_id, purchase_ts_us,
           click_event_id, click_ts_us, direction
    FROM (
        SELECT p.event_id AS purchase_event_id, p.user_id AS user_id,
               epoch_us(p.ts) AS purchase_ts_us,
               c.cid AS click_event_id, epoch_us(c.ts) AS click_ts_us,
               CASE WHEN c.cid IS NULL THEN NULL
                    WHEN c.ts <= p.ts THEN 'backward' ELSE 'forward' END AS direction,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)) ASC NULLS LAST,
                            (c.ts > p.ts) ASC
               ) AS rn
        FROM p LEFT JOIN clicks c ON c.user_id = p.user_id
    ) WHERE rn = 1
    """,
    tags=("join", "asof", "nearest"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest'):
    each purchase takes the same-user click closest in time in EITHER
    direction, ties resolving to the earlier (backward) click —
    completing the as-of family next to backward, tolerance, and
    forward. One union of the two sides, ONE shuffle on the entity
    key, then two frame sweeps over the same per-user partition: the
    ascending sweep carries the last click at-or-before each purchase
    (`last(click) ignorenulls`), the descending sweep carries the
    first click at-or-after it; a pure integer comparison of the two
    deltas picks the winner. The brute-force oracle (all user clicks
    ranked by |delta|) proves the two-sweep plan exact.

    Scale: no range join, no per-purchase candidate set — the cost is
    one exchange plus two in-partition sorts (asc + desc) over the
    union, each bounded by the user's own events. Click ties at one
    instant pre-dedup to max event_id exactly as the oracle does;
    same-instant clicks match backward (delta 0 ties prefer
    backward), matching merge_asof."""
    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.unix_micros("ts").alias("t_us"))
        .agg(F.max("event_id").alias("cid"))
        .select("user_id", "t_us", F.lit(0).alias("side"), "cid",
                F.lit(None).cast("long").alias("pid"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("cid"),
        F.col("event_id").alias("pid"),
    )
    from pyspark.sql import Window

    is_click = F.col("side") == 0
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("t_us"), F.asc("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("t_us"), F.asc("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = (
        clicks.unionAll(purchases)
        .withColumn(
            "back",
            F.last(F.when(is_click, F.struct("t_us", "cid")), ignorenulls=True).over(w_back),
        )
        .withColumn(
            "fwd",
            F.last(F.when(is_click, F.struct("t_us", "cid")), ignorenulls=True).over(w_fwd),
        )
    )
    d_back = F.col("t_us") - F.col("back.t_us")
    d_fwd = F.col("fwd.t_us") - F.col("t_us")
    take_back = F.col("back").isNotNull() & (F.col("fwd").isNull() | (d_back <= d_fwd))
    chosen = F.when(take_back, F.col("back")).otherwise(F.col("fwd"))
    direction = F.when(chosen.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(take_back, F.lit("backward")).otherwise(F.lit("forward"))
    )
    return (
        swept.filter(F.col("side") == 1)
        .select(
            F.col("pid").alias("purchase_event_id"),
            "user_id",
            F.col("t_us").alias("purchase_ts_us"),
            chosen["cid"].alias("click_event_id"),
            chosen["t_us"].alias("click_ts_us"),
            direction.alias("direction"),
        )
        .orderBy("purchase_event_id")
    )


@query(
    "join_copurchase_lift",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    item AS (SELECT l_partkey, COUNT(*) AS n_orders FROM op GROUP BY l_partkey),
    tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_total FROM op),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS n_together
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING COUNT(*) >= 2
    )
    SELECT p.part_a, p.part_b, p.n_together,
           ia.n_orders AS n_orders_a, ib.n_orders AS n_orders_b,
           t.n_total * p.n_together * 1000000 // (ia.n_orders * ib.n_orders)
             AS lift_micros,
           CAST(t.n_total * p.n_together AS DOUBLE) / (ia.n_orders * ib.n_orders)
             AS lift,
           CAST(t.n_total * p.n_together > ia.n_orders * ib.n_orders AS INT)
             AS positive_assoc
    FROM pairs p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b
    CROSS JOIN tot t
    """,
    tags=("join", "affinity", "association", "pmi"),
)
def join_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase ASSOCIATION, not just co-occurrence: for every part
    pair bought together in >= 2 orders (the Apriori support prune
    that bounds the output), the exact lift
    N * c(a,b) / (c(a) * c(b)) — the ratio of observed to
    independence-expected co-occurrence, whose log is PMI.
    `join_market_basket_pairs` ranks raw counts, which popular items
    dominate; lift > 1 (positive_assoc, an INTEGER cross-multiplication
    test — no float boundary) finds pairs bought together MORE than
    their popularities predict, the signal recommenders and
    substitutes/complements analyses actually use.

    Determinism: lift_micros is integer fixed-point (numerator and
    denominator are exact int64 counts; one integer division);
    `lift` is a single IEEE division of two exact integers —
    bit-identical across engines; positive_assoc never touches
    floats at all.

    Scale: the distinct (order, part) shrink happens FIRST (one
    shuffle, map-side combine); the pair fan-out is bounded per order
    by basket size; support >= 2 prunes the pair aggregate before the
    two part-keyed count joins; the 1-row order total broadcasts
    (whitelisted BNLJ). Same candidate shape as the basket query plus
    two bounded equi-joins."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    item = li.groupBy("l_partkey").agg(F.count("*").alias("n_orders"))
    tot = li.agg(F.count_distinct("l_orderkey").cast("long").alias("n_total"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b"))
        .agg(F.count("*").cast("long").alias("n_together"))
        .filter(F.col("n_together") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("n_orders_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("n_orders_b"))
    out = pairs.join(ia, "part_a").join(ib, "part_b").join(F.broadcast(tot))
    num = F.col("n_total") * F.col("n_together")
    den = F.col("n_orders_a") * F.col("n_orders_b")
    return out.select(
        "part_a",
        "part_b",
        "n_together",
        "n_orders_a",
        "n_orders_b",
        F.expr("n_total * n_together * 1000000 div (n_orders_a * n_orders_b)").alias("lift_micros"),
        (num.cast("double") / den).alias("lift"),
        (num > den).cast("int").alias("positive_assoc"),
    )
