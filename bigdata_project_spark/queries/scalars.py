"""Scalar function surface (SURVEY.md §2.8).

String / date-time / math / null-handling / array / JSON / conversion
functions, mirroring the families the reference exercises at the
ingest edge (projection+rename CrawlData.py:71-88, guarded divide
:67-69, epoch-millis timestamps :86, `.get()` null defaults :72-87)
plus the [ext] analytics surface.

All expressions are built-in pyspark.sql.functions — JVM-side, inside
whole-stage codegen; zero Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
           lower(p_type) AS type_lower,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           string_split(p_name, ' ')[1] AS first_word,
           concat(p_brand, ':', p_type) AS brand_type,
           substring(p_name, 1, 3) AS name_prefix,
           CAST(contains(p_name, 'red') AS INT) AS has_red,
           CAST(p_type LIKE '%ECO%' AS INT) AS is_eco,
           replace(p_name, ' ', '_') AS name_snake,
           trim('  ' || p_name || ' ') AS name_trimmed
    FROM part
    WHERE p_partkey % 4 = 0
    """,
    tags=("scalar", "string"),
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: regexp_extract, case-norm, split-first-token,
    concat, substring, contains/LIKE, replace, trim — the Spark form
    of the reference's name-normalization needs (SURVEY §2.8)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 4 == 0)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.lower("p_type").alias("type_lower"),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 3).alias("name_prefix"),
        F.col("p_name").contains("red").cast("int").alias("has_red"),
        F.col("p_type").like("%ECO%").cast("int").alias("is_eco"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
    )


@query(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(week(o_orderdate) AS INT) AS iso_week,
           dayname(CAST(o_orderdate AS DATE)) AS dow_name,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           epoch_us(o_orderdate) AS order_epoch_us
    FROM orders
    WHERE o_orderkey % 16 = 0
    """,
    tags=("scalar", "datetime"),
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extraction, truncation, formatting, diffing,
    epoch conversion (the reference's epoch-millis post_time handling,
    CrawlData.py:86, generalized)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 16 == 0)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.date_format("o_orderdate", "EEEE").alias("dow_name"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.last_day(d).cast("string").alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.unix_micros("o_orderdate").alias("order_epoch_us"),
    )


@query(
    "scalar_math_guarded",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity IS NOT NULL AND l_quantity > 0
                THEN l_extendedprice / l_quantity END AS unit_price,
           floor(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) * 100 / 1024) / 100 AS price_k,
           round(l_quantity / 2, 0) AS qty_half_rounded,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decade,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           abs(l_extendedprice - 50000) AS dist_from_50k,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    WHERE l_orderkey % 32 = 0
    """,
    tags=("scalar", "math"),
)
def scalar_math_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family incl. the reference's null-guarded divide
    (price_per_m2 = price/area iff both truthy and area>0,
    CrawlData.py:67-69) re-expressed as a when() guard."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 32 == 0)
    q = F.col("l_quantity")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.when(q.isNotNull() & (q > 0), F.col("l_extendedprice") / q).alias("unit_price"),
        # price scaling via exact integer-cents floor arithmetic:
        # round(x/1024, 2) is NOT portable — Spark rounds the double's
        # shortest decimal repr (which can be an exact .xx5 tie) while
        # DuckDB rounds an inexact multiply, and they disagree on
        # those rows (observed at sf0.1). Every step below is exact.
        (F.floor(F.round(F.col("l_extendedprice") * 100, 0).cast("long") * 100 / 1024) / 100).alias("price_k"),
        # round() itself is demonstrated on exact .5 ties, where both
        # engines round identically (away from zero)
        F.round(F.col("l_quantity") / 2, 0).alias("qty_half_rounded"),
        F.floor(q / 10).alias("qty_decade"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.abs(F.col("l_extendedprice") - 50000).alias("dist_from_50k"),
        F.sqrt(q).alias("qty_sqrt"),
        (q.cast("long") % 7).alias("qty_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "scalar_null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0), -1) AS disc_or_sentinel,
           CAST(NULLIF(l_discount, 0) IS NULL AS INT) AS is_zero_disc,
           CASE WHEN NULLIF(l_tax, 0) IS NOT NULL THEN 'taxed' ELSE 'untaxed' END AS tax_flag,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    WHERE l_orderkey % 32 = 1
    """,
    tags=("scalar", "null"),
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null family: nullif/coalesce/isnull — the engine-side form of
    the reference's `.get()` defaults (CrawlData.py:72-87)."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 32 == 1)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0)), F.lit(-1)).alias("disc_or_sentinel"),
        F.isnull(F.nullif(F.col("l_discount"), F.lit(0))).cast("int").alias("is_zero_disc"),
        F.when(F.nullif(F.col("l_tax"), F.lit(0)).isNotNull(), "taxed").otherwise("untaxed").alias("tax_flag"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias("flag_or_none"),
    )


@query(
    "scalar_array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(embedding[64] AS DOUBLE) AS last_elem,
           CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
             + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head4_sum,
           CAST(CAST(embedding[1] AS DOUBLE) > 0 AS INT) AS first_positive
    FROM embeddings
    WHERE vec_id % 5 = 0
    """,
    tags=("scalar", "array"),
)
def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embedding column: size, element_at, and
    an explicit (order-fixed) small reduction. Elements are widened
    float->double (exact) so both engines emit identical cells."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    el = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        el(1).alias("first_elem"),
        el(64).alias("last_elem"),
        (el(1) + el(2) + el(3) + el(4)).alias("head4_sum"),
        (el(1) > 0).cast("int").alias("first_positive"),
    )


@query(
    "scalar_json_extraction",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CAST(json_extract_string(props, '$.missing') IS NULL AS INT) AS missing_is_null
    FROM events
    WHERE event_id % 8 = 0
    """,
    tags=("scalar", "json"),
)
def scalar_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: path extraction from the events.props payload —
    the engine-side form of the reference's raw["ad"] access
    (CrawlData.py:65)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 8 == 0)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.isnull(F.get_json_object("props", "$.missing")).cast("int").alias("missing_is_null"),
    )


@query(
    "scalar_case_conversion",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
                ELSE 'cold' END AS priority_tier,
           CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) AS price_str,
           printf('%s|%s', o_orderstatus, o_orderpriority) AS status_key,
           CAST(o_orderstatus = 'O' AS INT) AS is_open
    FROM orders
    WHERE o_orderkey % 16 = 1
    """,
    tags=("scalar", "conditional"),
)
def scalar_case_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN chains + cast/format conversions (the reference's
    CSV stringification edge, CrawlData.py:97-100, generalized)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 16 == 1)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "warm")
        .otherwise("cold")
        .alias("priority_tier"),
        # floor-then-cast: Spark's double->long cast truncates while
        # DuckDB's rounds; floor() is identical in both engines
        F.floor("o_totalprice").cast("string").alias("price_str"),
        F.format_string("%s|%s", "o_orderstatus", "o_orderpriority").alias("status_key"),
        (F.col("o_orderstatus") == "O").cast("int").alias("is_open"),
    )


@query(
    "scalar_regexp_family",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, 'st[a-z]+')) AS n_st_words,
           -- the COALESCE covers DuckDB's zero-match NULL; it must not
           -- also swallow NULL input (Spark's array_join propagates)
           CASE WHEN text IS NULL THEN NULL
                ELSE COALESCE(array_to_string(regexp_extract_all(text, 'st[a-z]+'), ','), '') END AS st_words,
           CAST(regexp_matches(text, 'spark.*stream|stream.*spark') AS INT) AS has_both,
           regexp_replace(text, '\\s+', '_', 'g') AS snake_text
    FROM documents
    WHERE doc_id % 10 = 0
    """,
    tags=("scalar", "regexp"),
)
def scalar_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface beyond plain extract: global extract_all (in
    document order), match counting, alternation matching, and global
    replace. All JVM-side regex — no Python. Patterns stay in the
    RE2-compatible subset so Java and DuckDB regex agree."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    hits = F.regexp_extract_all("text", F.lit("st[a-z]+"), 0)
    return d.select(
        "doc_id",
        F.size(hits).alias("n_st_words"),
        F.array_join(hits, ",").alias("st_words"),
        F.col("text").rlike("spark.*stream|stream.*spark").cast("int").alias("has_both"),
        F.regexp_replace("text", r"\s+", "_").alias("snake_text"),
    )


@query(
    "scalar_url_parse",
    oracle="""
    SELECT o_orderkey,
           'nhatot.com' AS host,
           '/listing/' || CAST(o_orderkey AS VARCHAR) AS path,
           CAST(o_orderkey % 7 AS VARCHAR) AS page_param,
           'https' AS protocol
    FROM orders WHERE o_orderkey % 25 = 0
    """,
    tags=("scalar", "url", "crawl"),
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (parse_url) — the ingest-edge primitive for
    a crawler pipeline (the reference pages a listing REST API,
    CrawlData.py:17-20): build each listing's URL, then parse host /
    path / a query parameter / protocol back out. The oracle states
    the expected components directly from the key, so the round-trip
    (format -> parse) is what's actually verified."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    url = F.concat(
        F.lit("https://nhatot.com/listing/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?page="),
        (F.col("o_orderkey") % 7).cast("string"),
        F.lit("&cat=house"),
    )
    u = o.select("o_orderkey", url.alias("url"))
    return u.select(
        "o_orderkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "scalar_csv_column_codec",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ','
             || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS csv_line,
           o_orderstatus AS parsed_status,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS parsed_price
    FROM orders WHERE o_orderkey % 40 = 0
    """,
    tags=("scalar", "csv", "codec"),
)
def scalar_csv_column_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV-in-a-column codec: serialize a struct with to_csv, parse it
    back with from_csv — the message-payload pattern when records
    arrive CSV-encoded inside a Kafka value (the reference's batch CSV
    contract, CrawlData.py:97-100, as a stream payload). Price rides
    as DECIMAL(18,2) so the text form is the exact 2-decimal value in
    both engines (raw doubles stringify differently)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 40 == 0)
    rec = F.struct(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    with_csv = o.select("o_orderkey", F.to_csv(rec).alias("csv_line"))
    parsed = F.from_csv("csv_line", F.lit("k long, s string, p decimal(18,2)"))
    return with_csv.select(
        "o_orderkey",
        "csv_line",
        parsed.getField("s").alias("parsed_status"),
        parsed.getField("p").cast("double").alias("parsed_price"),
    )


@query(
    "scalar_interval_datetime",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS y,
           EXTRACT(quarter FROM o_orderdate) AS q,
           EXTRACT(month FROM o_orderdate) AS m,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           CAST(week(o_orderdate) AS INT) AS iso_week,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_1995,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           epoch_us(o_orderdate + INTERVAL 90 DAY + INTERVAL 12 HOUR) AS plus_90d12h_us
    FROM orders WHERE o_orderkey % 50 = 0
    """,
    tags=("scalar", "datetime", "interval"),
)
def scalar_interval_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar/interval arithmetic family: field extraction (year/
    quarter/month/ISO weekday/ISO week), day difference against an
    epoch, month truncation and last-day, and timestamp + compound
    interval — all UTC, all integer-calendar math, so both engines
    agree exactly. Cross-engine portability notes: Spark dayofweek is
    1=Sunday while DuckDB dayofweek is 0=Sunday, so the ISO form
    (weekday+1 == isodow) is the portable one; day-granularity
    datediff counts calendar-date boundaries identically in both;
    timestamps are emitted as epoch micros per the registry contract."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        (F.expr("weekday(o_orderdate)") + 1).alias("iso_dow"),
        F.weekofyear(d).alias("iso_week"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_1995"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.unix_micros(d + F.expr("INTERVAL 90 DAYS") + F.expr("INTERVAL 12 HOURS")).alias(
            "plus_90d12h_us"
        ),
    )


@query(
    "scalar_collation_ci_grouping",
    oracle="""
    WITH mixed AS (
        SELECT unnest([p_brand, lower(p_brand),
                       upper(substring(p_brand, 1, 1)) || lower(substring(p_brand, 2))]) AS b
        FROM part
    )
    SELECT MIN(b) AS brand_rep, COUNT(*) AS n
    FROM mixed GROUP BY lower(b)
    """,
    tags=("scalar", "collation", "string"),
)
def scalar_collation_ci_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware GROUP BY (Spark 4 collations): grouping mixed-
    case brand variants under UTF8_LCASE folds case in the COMPARATOR
    — no lower() materialization in the grouping key, which at scale
    keeps the original column prunable and lets the collation ride
    into sorts and joins too. The oracle states the same semantics
    the portable way (GROUP BY lower(b)).

    The group REPRESENTATIVE is min(original) — the collated key
    itself would surface an arbitrary case variant per group
    (whichever partial aggregate won), which is exactly the kind of
    engine-dependent nondeterminism the registry contract bans."""
    p = load(spark, sf_dir, "part")
    mixed = p.select(
        F.explode(
            F.array(
                F.col("p_brand"),
                F.lower("p_brand"),
                F.initcap(F.lower("p_brand")),
            )
        ).alias("b")
    )
    return (
        mixed.groupBy(F.expr("b COLLATE UTF8_LCASE").alias("k"))
        .agg(F.min("b").alias("brand_rep"), F.count("*").alias("n"))
        .select("brand_rep", "n")
        .orderBy("brand_rep")
    )
