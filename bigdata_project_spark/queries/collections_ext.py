"""Array set-algebra, nested flatten, base conversion, and date
construction/arithmetic — closing the remaining §2.8 long tail.
Array-valued results are emitted as sorted CSV strings (DuckDB's
list_distinct/list_intersect don't guarantee order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "scalar_array_set_algebra",
    oracle="""
    WITH src AS (
        SELECT o_orderkey,
               range(1, CAST(o_orderkey % 5 AS INT) + 3) AS a,
               range(CAST(o_orderkey % 3 AS INT) + 1, 7) AS b
        FROM orders WHERE o_orderkey % 60 = 0
    )
    SELECT o_orderkey,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS union_csv,
           -- DuckDB array_to_string returns NULL for [], Spark '' -> coalesce
           COALESCE(array_to_string(list_sort(list_intersect(a, b)), ','), '') AS intersect_csv,
           COALESCE(array_to_string(list_sort(list_filter(list_distinct(a), x -> NOT list_contains(b, x))), ','), '') AS except_csv,
           CAST(list_has_any(a, b) AS INT) AS overlaps,
           array_to_string(flatten([a, b]), ',') AS flat_csv
    FROM src
    """,
    tags=("scalar", "array", "setops"),
)
def scalar_array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: union/intersect/except/overlap/flatten.
    Spark's array_union/array_except dedup; outputs sorted+joined so
    element order never enters the hash."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 60 == 0)
    a = F.sequence(F.lit(1), (F.col("o_orderkey") % 5).cast("int") + 2)
    b = F.sequence((F.col("o_orderkey") % 3).cast("int") + 1, F.lit(6))
    src = o.select("o_orderkey", a.alias("a"), b.alias("b"))
    csv = lambda c: F.array_join(F.array_sort(c), ",")  # noqa: E731
    return src.select(
        "o_orderkey",
        csv(F.array_union("a", "b")).alias("union_csv"),
        csv(F.array_intersect("a", "b")).alias("intersect_csv"),
        csv(F.array_except("a", "b")).alias("except_csv"),
        F.arrays_overlap("a", "b").cast("int").alias("overlaps"),
        F.array_join(F.flatten(F.array("a", "b")), ",").alias("flat_csv"),
    )


@query(
    "scalar_date_construction",
    oracle="""
    SELECT o_orderkey,
           CAST(make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS VARCHAR)
               AS month_first,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS DATE)::VARCHAR AS due_date,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE)::VARCHAR AS week_before,
           to_base(o_orderkey, 16) AS key_hex,
           to_base(o_orderkey, 2) AS key_bin
    FROM orders WHERE o_orderkey % 45 = 0
    """,
    tags=("scalar", "datetime", "conv"),
)
def scalar_date_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date construction (make_date), day arithmetic (date_add/sub),
    and radix conversion (conv) — the remaining conversion surface."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 45 == 0)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).cast("string").alias("month_first"),
        F.date_add(d, 45).cast("string").alias("due_date"),
        F.date_sub(d, 7).cast("string").alias("week_before"),
        F.conv(F.col("o_orderkey").cast("string"), 10, 16).alias("key_hex"),
        F.conv(F.col("o_orderkey").cast("string"), 10, 2).alias("key_bin"),
    )


@query(
    "scalar_map_higher_order",
    oracle="""
    SELECT p_partkey,
           p_retailprice * 2 AS price_doubled,
           CAST(p_size AS DOUBLE) * 3 AS size_tripled,
           -- COALESCE(.., FALSE): map_filter drops entries whose
           -- predicate is NULL (unknown != big), so a NULL price must
           -- count 0 here, not poison the sum
           CAST(COALESCE(p_retailprice * 3 > 3000, FALSE) AS INT)
             + CAST(COALESCE(CAST(p_size AS DOUBLE) * 3 > 3000, FALSE) AS INT) AS n_big_entries
    FROM part
    """,
    tags=("scalar", "map", "higher-order"),
)
def scalar_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions — transform_values, map_zip_with,
    map_filter — over a per-row attribute map (the flexible-props
    pattern for semi-structured columns). The oracle states the
    arithmetic the map pipeline must produce: doubled = 2v (from
    transform_values), zipped = v + 2v = 3v (map_zip_with), and the
    filtered cardinality counts entries with 3v > 3000 (map_filter).
    All map ops are JVM expressions inside codegen — a map column is
    not a Python detour."""
    p = load(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("price"), F.col("p_retailprice"),
        F.lit("size"), F.col("p_size").cast("double"),
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    zipped = F.map_zip_with(m, doubled, lambda k, v1, v2: v1 + v2)
    filtered = F.map_filter(zipped, lambda k, v: v > 3000)
    return p.select(
        "p_partkey",
        F.element_at(doubled, "price").alias("price_doubled"),
        F.element_at(zipped, "size").alias("size_tripled"),
        F.size(filtered).alias("n_big_entries"),
    )
