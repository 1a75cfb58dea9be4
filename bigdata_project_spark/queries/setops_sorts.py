"""Set operations (SURVEY.md §2.7) and sorts/limits/top-k (§2.6).

union/unionByName, intersect/intersectAll, except/exceptAll, ordered
global top-k. The reference's only [code] instance is the ingest-side
`limit` (CrawlData.py:36-37); the rest is the [ext] analytics surface.

Scale notes: ordered LIMIT k compiles to TakeOrderedAndProject (per-
partition top-k + driver merge of k*partitions rows — no global
sort). Set ops are distinct-aggregations/joins under the hood and
shuffle once on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "setop_union_all_nation_rows",
    oracle="""
    SELECT nationkey, kind, COUNT(*) AS n
    FROM (
        SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
    )
    GROUP BY nationkey, kind
    """,
    tags=("setop", "union"),
)
def setop_union_all_nation_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName (UNION ALL) of two differently-shaped relations."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind"))
    return c.unionByName(s).groupBy("nationkey", "kind").agg(F.count("*").alias("n"))


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
    UNION
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
    """,
    tags=("setop", "union"),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets — dedup across branches is one
    hash aggregate over the unioned stream (map-side combined)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9500).select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000).select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "setop_intersect_buyers_building",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    tags=("setop", "intersect"),
)
def setop_intersect_buyers_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers that both ordered and are in BUILDING."""
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    return o.intersect(c)


@query(
    "setop_except_nonbuilding_buyers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    tags=("setop", "except"),
)
def setop_except_nonbuilding_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): buyers not in the BUILDING segment —
    the 'delisted ads = yesterday minus today' pattern (SURVEY §2.7)."""
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    return o.subtract(c)


@query(
    "setop_intersect_all_multiset",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("setop", "intersect"),
)
def setop_intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: multiset intersection preserving multiplicity."""
    l = load(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    r = l.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.intersectAll(r)


@query(
    "setop_except_all_multiset",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("setop", "except"),
)
def setop_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiset difference preserving multiplicity."""
    l = load(spark, sf_dir, "lineitem")
    n = l.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    r = l.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return n.exceptAll(r)


@query(
    "sort_top100_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("sort", "topk"),
)
def sort_top100_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ordered top-k -> TakeOrderedAndProject (no full sort)."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    ).limit(100)


@query(
    "sort_multicol_limit",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderstatus, o_orderpriority DESC, o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    tags=("sort",),
)
def sort_multicol_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column mixed-direction sort with deterministic limit."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice").orderBy(
        "o_orderstatus", F.desc("o_orderpriority"), F.desc("o_totalprice"), "o_orderkey"
    ).limit(50)


@query(
    "setop_union_by_name_missing",
    oracle="""
    SELECT region_name, n_nations, src FROM (
        SELECT r_name AS region_name, NULL::BIGINT AS n_nations, 'regions' AS src FROM region
        UNION ALL BY NAME
        SELECT CAST(NULL AS VARCHAR) AS region_name, COUNT(*) AS n_nations, 'nations' AS src
        FROM nation
    ) t
    """,
    tags=("setop", "union", "schema-evolution"),
)
def setop_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: unionByName(allowMissingColumns=True)
    aligns columns by NAME and null-fills the gaps — the operation a
    lake needs when appending batches whose schema gained or lost a
    column (positional UNION would silently misalign). Oracle is
    DuckDB's UNION ALL BY NAME with explicit NULL columns."""
    r = load(spark, sf_dir, "region").select(
        F.col("r_name").alias("region_name"), F.lit("regions").alias("src")
    )
    n = (
        load(spark, sf_dir, "nation")
        .groupBy()
        .agg(F.count("*").alias("n_nations"))
        .select("n_nations", F.lit("nations").alias("src"))
    )
    return r.unionByName(n, allowMissingColumns=True).select("region_name", "n_nations", "src")


@query(
    "sort_keyset_pagination",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    WHERE (o_totalprice < 400000.0)
       OR (o_totalprice = 400000.0 AND o_orderkey > 1000)
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("sort", "pagination", "topk"),
)
def sort_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination: the next 20 orders after the
    cursor (o_totalprice=400000.0, o_orderkey=1000) in
    (price DESC, key ASC) order. The serving-layer pattern that
    replaces OFFSET pagination: OFFSET n must compute-and-discard n
    rows (page 10000 costs 10000 pages of work, and a global sort),
    while the keyset predicate pushes into the scan and the plan
    stays TakeOrderedAndProject — page 10000 costs the same as page
    one. The cursor tuple's strict-inequality form ((p < c_p) OR
    (p = c_p AND k > c_k)) is the standard composite-key
    continuation, exact under the total order (price, key)."""
    o = load(spark, sf_dir, "orders")
    after_cursor = (F.col("o_totalprice") < 400000.0) | (
        (F.col("o_totalprice") == 400000.0) & (F.col("o_orderkey") > 1000)
    )
    return (
        o.filter(after_cursor)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )
