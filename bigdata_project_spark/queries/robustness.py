"""Error-tolerant casts, bitwise ops, binary encodings, null
ordering, and time-series gap filling — the long tail of SURVEY.md
§2.8 plus the hypertable-style densification a metrics serving layer
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.exact import SQL_DSUM, dsum
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "scalar_try_functions",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INT) AS brand_num,
           TRY_CAST(p_name AS INT) AS name_as_int,
           CASE WHEN p_size != 0 THEN CAST(p_retailprice / p_size AS DOUBLE) END AS price_per_size,
           TRY_CAST('9999999999999999999999' AS BIGINT) AS overflow_null
    FROM part
    WHERE p_partkey % 7 = 0
    """,
    tags=("scalar", "try"),
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant expressions: try_cast (malformed -> null, the
    engine-side form of the reference's try/except-None error channel,
    CrawlData.py:56-57), try_divide, overflow-to-null."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    return p.select(
        "p_partkey",
        F.try_to_number(F.regexp_extract("p_brand", r"#(\d+)", 1), F.lit("999")).cast("int").alias("brand_num"),
        F.col("p_name").try_cast("int").alias("name_as_int"),
        F.try_divide("p_retailprice", F.nullif(F.col("p_size").cast("double"), F.lit(0.0))).alias("price_per_size"),
        F.lit("9999999999999999999999").try_cast("bigint").alias("overflow_null"),
    )


@query(
    "agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           bit_and(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS and_qty,
           bit_or(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS or_qty,
           bit_xor(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS xor_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "bitwise"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bitmap-style rollups)."""
    l = load(spark, sf_dir, "lineitem")
    q = F.round("l_quantity", 0).cast("long")
    return l.select("l_returnflag", q.alias("q")).groupBy("l_returnflag").agg(
        F.bit_and("q").alias("and_qty"),
        F.bit_or("q").alias("or_qty"),
        F.bit_xor("q").alias("xor_qty"),
    )


@query(
    "scalar_bit_binary_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey >> 4 AS shifted,
           xor(o_orderkey, 21845) AS xored,
           lower(hex(o_orderkey & 65535)) AS hex_low,
           to_base64(encode(o_orderstatus)) AS status_b64
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
    tags=("scalar", "bitwise", "binary"),
)
def scalar_bit_binary_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit manipulation + hex/base64 encodings (sketch/bitmap and
    binary-payload building blocks)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(255).alias("low_byte"),
        F.shiftright(k, 4).alias("shifted"),
        k.bitwiseXOR(21845).alias("xored"),
        F.lower(F.hex(k.bitwiseAND(65535))).alias("hex_low"),
        F.base64(F.encode("o_orderstatus", "UTF-8")).alias("status_b64"),
    )


@query(
    "sort_null_ordering",
    oracle="""
    SELECT o_orderkey, nullable_metric FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS nullable_metric
        FROM orders
    )
    ORDER BY nullable_metric DESC NULLS LAST, o_orderkey
    LIMIT 60
    """,
    tags=("sort", "null"),
)
def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null ordering (desc_nulls_last) with a deterministic
    limit over a nullable sort key."""
    o = load(spark, sf_dir, "orders")
    metric = F.when(F.col("o_orderkey") % 3 != 0, F.col("o_totalprice"))
    return (
        o.select("o_orderkey", metric.alias("nullable_metric"))
        .orderBy(F.desc_nulls_last("nullable_metric"), "o_orderkey")
        .limit(60)
    )


@query(
    "events_gapfill_hourly",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
    ),
    grid AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ),
    actual AS (
        SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n, {SQL_DSUM('value')} AS v
        FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT epoch_us(grid.h) AS hour_us,
           COALESCE(actual.n, 0) AS n_errors,
           COALESCE(actual.v, 0.0) AS total_value
    FROM grid LEFT JOIN actual ON grid.h = actual.h
    """,
    tags=("events", "gapfill", "timeseries"),
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification (hypertable-style rollup): generate
    the full hourly grid with sequence(), left-join the sparse
    aggregate, zero-fill gaps — so downstream charts/windows see every
    bucket. The grid generation is O(range) on one row then exploded;
    the join is broadcast (grid is tiny relative to the fact side)."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.date_trunc("hour", F.max("ts")).alias("hi")
    )
    grid = bounds.select(F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"))
    actual = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"), dsum("value").alias("v"))
    )
    return grid.join(actual, "h", "left").select(
        F.unix_micros("h").alias("hour_us"),
        F.coalesce("n", F.lit(0)).alias("n_errors"),
        F.coalesce("v", F.lit(0.0)).alias("total_value"),
    )
