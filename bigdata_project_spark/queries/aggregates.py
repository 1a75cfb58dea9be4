"""Aggregation operators (SURVEY.md §2.4).

The reference implements only a set()-dedup (CrawlData.py:12,34) and
*declares* "Aggregates" (README.md:22); this module is the concrete
aggregation surface: hash group-by with partial/final agg (Catalyst
does map-side combine automatically), rollup/cube, filtered aggs,
exact medians, moments, collect-to-array, min_by/max_by, and
approx-distinct (HLL++).

Scale notes: every query here is a single shuffle on the group keys;
decimal partial sums stay inside whole-stage codegen. Rollup/cube
expand rows before the shuffle (grouping-set expansion) which is the
same strategy a 1000-executor cluster wants — no driver collection
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.exact import SQL_DAVG, SQL_DSUM, davg, dcast, dsum
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM('l_quantity')} AS sum_qty,
           {SQL_DSUM('l_extendedprice')} AS sum_base_price,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {SQL_DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {SQL_DAVG('l_quantity')} AS avg_qty,
           {SQL_DAVG('l_extendedprice')} AS avg_price,
           {SQL_DAVG('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan -> filter -> hash agg.

    Flagship: exercises predicate pushdown to parquet, column pruning,
    partial+final HashAggregate, and exact decimal arithmetic.
    """
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_rollup_region_nation",
    oracle=f"""
    SELECT r_name, n_name,
           COUNT(s_suppkey) AS n_suppliers,
           {SQL_DSUM('s_acctbal')} AS total_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    -- no-op on observed groups (all have >=1 row); drops only the
    -- grand-total-over-zero-rows row so the zero-input case matches
    -- Spark, whose Expand-based rollup emits no rows on empty input
    HAVING COUNT(*) > 0
    """,
    tags=("agg", "rollup"),
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup region -> nation -> grand total.

    Mirrors the reference's declared region/district/ward hierarchy
    aggregation (SURVEY.md §2.4); dims are broadcast.
    """
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("s_suppkey").alias("n_suppliers"),
        dsum("s_acctbal").alias("total_acctbal"),
    )


@query(
    "agg_cube_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {SQL_DSUM('o_totalprice')} AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    -- align zero-input case with Spark's cube (see rollup note)
    HAVING COUNT(*) > 0
    """,
    tags=("agg", "cube"),
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 2^2 grouping sets in one pass."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


@query(
    "agg_distinct_per_segment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(DISTINCT CAST(c_acctbal > 0 AS INT)) AS n_bal_signs
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "distinct"),
)
def agg_distinct_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-aggregation — the scalable form of the
    reference's in-memory set() dedup (CrawlData.py:12,34)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.countDistinct((F.col("c_acctbal") > 0).cast("int")).alias("n_bal_signs"),
    )


@query(
    "agg_approx_count_distinct",
    oracle=None,  # HLL++ sketch differs between engines by design; rows-only check
    tags=("agg", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB-scale way to
    count distinct keys without an exact shuffle-heavy expansion."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@query(
    "agg_conditional",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
           {SQL_DSUM("CASE WHEN o_totalprice > 100000 THEN o_totalprice ELSE 0 END")} AS big_revenue,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS DOUBLE) / COUNT(*) AS open_ratio
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "conditional"),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregates via CASE WHEN inside agg."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        dsum(F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice")).otherwise(0.0)).alias("big_revenue"),
        (F.count(F.when(F.col("o_orderstatus") == "O", 1)).cast("double") / F.count("*")).alias("open_ratio"),
    )


@query(
    "agg_median_exact",
    oracle="""
    WITH ranked AS (
        SELECT o_orderstatus, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        FROM orders
    )
    SELECT o_orderstatus,
           (MIN(o_totalprice) + MAX(o_totalprice)) / 2 AS median_price,
           MIN(n) AS n_orders
    FROM ranked
    WHERE rn IN ((n + 1) // 2, n // 2 + 1)
    GROUP BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median via rank-and-pick — engine-independent (no float
    interpolation ambiguity): the two middle ranks floor((n+1)/2) and
    floor(n/2)+1 (equal when n is odd) are selected by integer
    arithmetic and averaged with one deterministic (a+b)/2."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("o_orderstatus")).alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)  # integer ranks on both sides:
    hi = F.floor(F.col("n") / 2) + 1  # for even n this is the true two-middle average
    mid = ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
    return mid.groupBy("o_orderstatus").agg(
        ((F.min("o_totalprice") + F.max("o_totalprice")) / 2).alias("median_price"),
        F.min("n").alias("n_orders"),
    )


@query(
    "agg_percentile_native",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def agg_percentile_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native exact percentiles: Spark percentile() and DuckDB
    quantile_cont share the linear-interpolation definition; rounding
    to 6 decimals absorbs last-ulp interpolation-order differences.
    (percentile_approx also exists in the surface but its sketch is
    engine-specific — the exact median gate is agg_median_exact.)"""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", 0.5), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.9), 6).alias("p90"),
    )


@query(
    "agg_stats_moments",
    oracle="""
    WITH c AS (
        SELECT l_returnflag,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS q,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS pc
        FROM lineitem
    ), s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(q) AS DOUBLE) AS sx,
               CAST(SUM(q * q) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(pc AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(pc AS DECIMAL(38,0)) * pc) AS DOUBLE) AS syy,
               CAST(SUM(CAST(pc AS DECIMAL(38,0)) * q) AS DOUBLE) AS sxy
        FROM c
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           SQRT((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS corr_qty_price
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation from exact sufficient statistics
    (one pass, map-side combinable — the textbook way to do moments on
    100 TB without a second scan).

    Cross-engine exactness note: money is converted to integer cents
    (prices are 2-decimal; ROUND(x*100) is engine-independent because
    the product lands within 1e-8 of an integer) so every sum is exact
    integer/decimal arithmetic — no double summation order anywhere.
    Casting arbitrary double products to decimal is NOT portable: the
    engines' double->decimal roundings disagree once |x|*10^scale
    nears 2^53 or the true value ties at the rounding digit.
    """
    l = load(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity"), 0).cast("long")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    c = l.select("l_returnflag", q.alias("q"), pc.alias("pc"))
    qd, pcd = F.col("q"), F.col("pc").cast("decimal(38,0)")
    s = c.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(qd).cast("double").alias("sx"),
        F.sum(qd * qd).cast("double").alias("sxx"),
        F.sum(pcd).cast("double").alias("sy"),
        F.sum(pcd * F.col("pc")).cast("double").alias("syy"),
        F.sum(pcd * qd).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    return s.select(
        "l_returnflag",
        "n",
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_qty"),
        ((n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))).alias("corr_qty_price"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT n_name)), ',') AS nations,
           COUNT(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("agg", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set -> sort_array -> join: deterministic collect-to-array."""
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"),
        F.count("*").alias("n_nations"),
    )


@query(
    "agg_minmaxby",
    oracle="""
    SELECT c_nationkey,
           ARG_MAX(c_name, c_custkey) AS newest_customer,
           ARG_MIN(c_name, c_custkey) AS oldest_customer,
           MAX(c_acctbal) AS max_bal,
           MIN(c_acctbal) AS min_bal
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("agg", "minmaxby"),
)
def agg_minmaxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by over a unique ordering key (deterministic)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", "c_custkey").alias("newest_customer"),
        F.min_by("c_name", "c_custkey").alias("oldest_customer"),
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_acctbal").alias("min_bal"),
    )


@query(
    "agg_boolean_family",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           CAST(bool_and(o_totalprice > 1000) AS INT) AS all_over_1k,
           CAST(bool_or(o_orderstatus = 'F') AS INT) AS any_finished,
           CAST(bool_and(o_custkey IS NOT NULL) AS INT) AS all_have_cust
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "boolean"),
)
def agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates — count_if / bool_and (every) / bool_or
    (any): the data-quality assertion layer (e.g. 'every record has a
    customer key') expressed as aggregates instead of filters, so one
    pass answers many invariants. All are algebraic: partial AND/OR
    states combine map-side like any sum."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000).cast("int").alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").cast("int").alias("any_finished"),
        F.bool_and(F.col("o_custkey").isNotNull()).cast("int").alias("all_have_cust"),
    )


@query(
    "agg_mode_exact",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus,
           o_orderpriority AS mode_priority,
           n AS mode_count
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                     ORDER BY n DESC, o_orderpriority DESC) AS rn
        FROM c
    )
    WHERE rn = 1
    """,
    tags=("agg", "mode"),
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode with a deterministic tiebreak: the most frequent
    order priority per status (ties resolved to the lexicographically
    largest value, so both engines pick the same winner — a bare
    `mode()` is free to pick either and would flap the hash gate).

    Scale: count-then-argmax — the first aggregate shrinks each group
    to its distinct-value histogram (map-side combined), the argmax
    is max_by over that tiny table; nothing resembling a sort of the
    fact table. The struct(n, value) ordering IS the tiebreak."""
    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))
    return c.groupBy("o_orderstatus").agg(
        F.max_by(
            "o_orderpriority", F.struct("n", "o_orderpriority")
        ).alias("mode_priority"),
        F.max(F.struct("n", "o_orderpriority")).getField("n").alias("mode_count"),
    )


@query(
    "agg_share_of_total",
    oracle=f"""
    WITH per_nation AS (
        SELECT n_name, {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    )
    SELECT n_name, revenue,
           revenue / (SELECT CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS DOUBLE)
                      FROM per_nation) AS revenue_share
    FROM per_nation
    """,
    tags=("agg", "share", "subquery"),
)
def agg_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total per group — the rewrite that matters: the naive
    form is `revenue / SUM(revenue) OVER ()`, whose empty-frame
    window collapses ALL rows onto one partition at scale. Here the
    grand total is a 1-row aggregate of the (tiny, already-grouped)
    per-nation table, broadcast back — the fact stream shuffles once
    for the group-by and never again. Decimal-exact at both levels so
    the shares are cross-engine identical doubles."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    per_nation = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    total = per_nation.agg(
        F.sum(dcast("revenue")).cast("double").alias("total_revenue")
    )
    return (
        per_nation.join(F.broadcast(total))
        .select("n_name", "revenue", (F.col("revenue") / F.col("total_revenue")).alias("revenue_share"))
    )


@query(
    "agg_hll_sketch_union_rollup",
    # rows-only by design: the sketch estimates are Apache DataSketches
    # HLL values DuckDB cannot reproduce; tests/test_approx.py pins the
    # merge-associativity identity (merged == direct, exactly) and a
    # 5% accuracy band against the exact distinct count instead.
    tags=("agg", "sketch", "approx", "rollup"),
)
def agg_hll_sketch_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count rollup via HLL sketches: build
    one DataSketches HLL sketch of user_id per (event_type, day),
    then MERGE the daily sketches into weekly tiers with
    hll_union_agg — the pattern that makes COUNT(DISTINCT) usable in
    a continuous-aggregate store at 100 TB: daily sketch blobs are
    small, mergeable, and never need the raw events again (a plain
    distinct count is NOT re-aggregatable: sum(daily distincts) !=
    weekly distinct). The query emits, per (event_type, week): the
    estimate from merging the daily sketches, the estimate from
    sketching the raw week directly, and the exact distinct count.
    Both estimates are deterministic (DataSketches hashing has no
    RNG), and tests pin est_merged within 2% of est_direct and both
    within 5% of exact: a small-cardinality sketch may still be in
    exact sparse mode, so a direct sketch can beat the dense-mode
    union by a hair — the union is lossless at the HLL register
    level, not at the mixed sparse/dense estimator level, and the
    band states exactly that.

    Scale: one (type, day) shuffle builds daily sketches map-side;
    the weekly merge shuffles only ~(types x days) sketch blobs
    (constant size, lgK=12 -> ~2.5 KB each); the exact column is the
    verification baseline and would be dropped in production."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        "user_id",
    )
    daily = ev.groupBy("event_type", "week", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    merged = daily.groupBy("event_type", "week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = ev.groupBy("event_type", "week").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est_direct"),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    return merged.join(direct, ["event_type", "week"]).select(
        "event_type", "week", "est_merged", "est_direct", "exact_distinct"
    )


@query(
    "agg_winsorized_mean",
    oracle="""
    WITH ranked AS (
        SELECT o_orderstatus, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        FROM orders
    ),
    bounds AS (
        SELECT o_orderstatus,
               MIN(CASE WHEN rn = (n * 5) // 100 + 1 THEN o_totalprice END) AS lo_cut,
               MIN(CASE WHEN rn = n - (n * 5) // 100 THEN o_totalprice END) AS hi_cut
        FROM ranked
        WHERE rn = (n * 5) // 100 + 1 OR rn = n - (n * 5) // 100
        GROUP BY o_orderstatus
    )
    SELECT r.o_orderstatus,
           MIN(r.n) AS n_orders,
           MIN(b.lo_cut) AS lo_cut,
           MIN(b.hi_cut) AS hi_cut,
           CAST(SUM(CAST(round(
                 CASE WHEN r.rn <= (r.n * 5) // 100 THEN b.lo_cut
                      WHEN r.rn >  r.n - (r.n * 5) // 100 THEN b.hi_cut
                      ELSE r.o_totalprice END * 100, 0) AS BIGINT))
                AS DOUBLE) / MIN(r.n) / 100.0e0 AS winsorized_mean
    FROM ranked r JOIN bounds b USING (o_orderstatus)
    GROUP BY r.o_orderstatus
    """,
    tags=("agg", "percentile", "robust"),
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% winsorized mean of order value per status — the robust
    location estimate analysts use when a handful of whale orders
    (or refunds) dominate the plain mean: the lowest and highest
    floor(0.05 n) values are CLAMPED to the adjacent order
    statistics, then averaged. Complements `agg_mad_outliers`
    (detection) with estimation-under-outliers.

    Determinism: rank-and-pick, never interpolation — the cut ranks
    g = (n*5) div 100 are integers, the cut values are existing rows
    selected by rank (same discipline as agg_median_exact), and the
    mean is an exact integer-cents sum with ONE final double divide.

    Scale: ranking, the bounds pick, the bounds join-back, and the
    final aggregate all ride ONE o_orderstatus exchange (window key =
    join key = group key); rows carry (status, price, two ints). The
    window-over-status sort is the cost — at 100 TB a percentile
    SKETCH (approx_percentile) replaces the exact ranks and drops
    the sort; this is the exact-answer form, kept deliberately for
    the same reason as agg_median_exact."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("o_orderstatus")).alias("n"),
    )
    g = F.expr("(n * 5) div 100")
    bounds = (
        ranked.filter((F.col("rn") == g + 1) | (F.col("rn") == F.col("n") - g))
        .groupBy("o_orderstatus")
        .agg(
            F.min(F.when(F.col("rn") == g + 1, F.col("o_totalprice"))).alias("lo_cut"),
            F.min(F.when(F.col("rn") == F.col("n") - g, F.col("o_totalprice"))).alias("hi_cut"),
        )
    )
    clamped = (
        ranked.join(bounds, "o_orderstatus")
        .select(
            "o_orderstatus",
            "n",
            "lo_cut",
            "hi_cut",
            F.when(F.col("rn") <= g, F.col("lo_cut"))
            .when(F.col("rn") > F.col("n") - g, F.col("hi_cut"))
            .otherwise(F.col("o_totalprice"))
            .alias("wv"),
        )
    )
    return clamped.groupBy("o_orderstatus").agg(
        F.min("n").alias("n_orders"),
        F.min("lo_cut").alias("lo_cut"),
        F.min("hi_cut").alias("hi_cut"),
        (
            F.sum(F.round(F.col("wv") * 100, 0).cast("long").cast("decimal(38,0)")).cast("double")
            / F.min("n")
            / F.lit(100.0)
        ).alias("winsorized_mean"),
    )
