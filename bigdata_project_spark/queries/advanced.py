"""Advanced relational surface: SQL-API queries (GROUPING SETS),
pivot, deep multi-join (TPC-H-Q5-style), geo distance, extended
string/map/JSON construction, array higher-order functions, and a
Python UDTF — rounding out SURVEY.md §2.3/2.4/2.8/2.10.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.exact import SPARK_SQL_DSUM, SQL_DSUM, dsum
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "sql_grouping_sets",
    oracle=f"""
    SELECT r_name, n_name,
           GROUPING(r_name, n_name) AS grp_id,
           COUNT(*) AS n_suppliers,
           {SQL_DSUM('s_acctbal')} AS total_bal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), (r_name, n_name), ())
    -- align zero-input case with Spark's grouping sets (no () row
    -- over empty input); no-op on any observed group
    HAVING COUNT(*) > 0
    """,
    tags=("agg", "sql", "grouping-sets"),
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS through the spark.sql() API (the
    engine's second front door next to the DataFrame API), with
    grouping_id disambiguating the null-means-subtotal rows."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("v_supplier")
    load(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    load(spark, sf_dir, "region").createOrReplaceTempView("v_region")
    return spark.sql(
        f"""
        SELECT r_name, n_name,
               CAST(grouping_id(r_name, n_name) AS INT) AS grp_id,
               COUNT(*) AS n_suppliers,
               {SPARK_SQL_DSUM('s_acctbal')} AS total_bal
        FROM v_supplier
        JOIN v_nation ON s_nationkey = n_nationkey
        JOIN v_region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), (r_name, n_name), ())
        """
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_SQL_PIVOT_COLS = ",\n".join(
    f"COUNT(CASE WHEN o_orderpriority = '{p}' THEN 1 END) AS \"{p}\"" for p in _PRIORITIES
)


@query(
    "pivot_status_by_priority",
    oracle=f"""
    SELECT o_orderstatus, {_SQL_PIVOT_COLS}
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "pivot"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab): order counts, status rows x priority columns.
    Explicit pivot values keep the output schema static — mandatory at
    scale (value discovery would need an extra pass) and for a stable
    driver-checkable schema."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").pivot("o_orderpriority", _PRIORITIES).agg(F.count(F.lit(1)))


@query(
    "join_q5_regional_revenue",
    oracle=f"""
    SELECT n_name,
           COUNT(*) AS n_lineitems,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "flagship"),
)
def join_q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style: 6-table join with a local-supplier condition
    (customer and supplier in the same nation). Fact-fact joins
    shuffle on their keys; region/nation broadcast and prune the
    supplier side before it touches lineitem."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "scalar_geo_haversine_km",
    oracle="""
    WITH pts AS (
        SELECT o_orderkey,
               (o_orderkey * 7 % 17000) / 100.0 - 85.0 AS lat,
               (o_orderkey * 13 % 36000) / 100.0 - 180.0 AS lng
        FROM orders WHERE o_orderkey % 30 = 0
    )
    SELECT o_orderkey, lat, lng,
           CAST(ROUND(
             2 * 6371.0 * ASIN(SQRT(
               POW(SIN(RADIANS(lat - 21.0) / 2), 2)
               + COS(RADIANS(21.0)) * COS(RADIANS(lat))
                 * POW(SIN(RADIANS(lng - 105.8) / 2), 2)
             )), 0) AS BIGINT) AS km_to_hanoi
    FROM pts
    """,
    tags=("scalar", "geo"),
)
def scalar_geo_haversine_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine distance (SURVEY §2.8 geo math on the listing
    lat/lng columns) from synthesized coordinates to the reference
    corpus's city (21.0N 105.8E). Output is rounded to whole km:
    trig libm implementations differ in the last ulp between the JVM
    and DuckDB, so sub-meter digits are not portable — the integer km
    is."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 30 == 0)
    lat = ((F.col("o_orderkey") * 7 % 17000) / 100.0 - 85.0).alias("lat")
    lng = ((F.col("o_orderkey") * 13 % 36000) / 100.0 - 180.0).alias("lng")
    pts = o.select("o_orderkey", lat, lng)
    dlat = F.radians(F.col("lat") - 21.0) / 2
    dlng = F.radians(F.col("lng") - 105.8) / 2
    hav = F.pow(F.sin(dlat), 2) + F.cos(F.radians(F.lit(21.0))) * F.cos(F.radians("lat")) * F.pow(F.sin(dlng), 2)
    km = 2 * 6371.0 * F.asin(F.sqrt(hav))
    return pts.select("o_orderkey", "lat", "lng", F.round(km, 0).cast("long").alias("km_to_hanoi"))


@query(
    "scalar_string_advanced",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           repeat(p_brand, 2) AS brand_twice,
           reverse(p_name) AS name_reversed,
           levenshtein(p_name, p_type) AS name_type_dist,
           split_part(p_name, ' ', 2) AS second_word,
           left(p_type, 4) AS type_head,
           right(p_type, 3) AS type_tail,
           translate(p_name, 'aeiou', 'AEIOU') AS vowels_upper
    FROM part
    WHERE p_partkey % 5 = 0
    """,
    tags=("scalar", "string"),
)
def scalar_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string family: padding, repeat, reverse, edit
    distance, split_part, left/right, translate (the diacritic-
    folding primitive for Vietnamese text normalization, SURVEY §2.8).
    """
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 5 == 0)
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.reverse("p_name").alias("name_reversed"),
        F.levenshtein("p_name", "p_type").alias("name_type_dist"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.substring("p_type", 1, 4).alias("type_head"),
        F.col("p_type").substr(F.length("p_type") - 2, F.lit(3)).alias("type_tail"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_upper"),
    )


@query(
    "scalar_map_json_construction",
    oracle="""
    SELECT p_partkey,
           map(['brand','type'], [p_brand, p_type])['brand'][1] AS brand_from_map,
           array_to_string(map_keys(map(['brand','type'], [p_brand, p_type])), ',') AS keys_csv,
           to_json(struct_pack(k := p_partkey, b := p_brand))::VARCHAR AS as_json,
           json_extract_string(to_json(struct_pack(k := p_partkey, b := p_brand)), '$.b') AS roundtrip_b
    FROM part
    WHERE p_partkey % 6 = 0
    """,
    tags=("scalar", "map", "json"),
)
def scalar_map_json_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction/access + to_json/JSON-path roundtrip (the
    flexible-props column pattern, SURVEY §2.8 map/JSON family)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 6 == 0)
    m = F.create_map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type"))
    j = F.to_json(F.struct(F.col("p_partkey").alias("k"), F.col("p_brand").alias("b")))
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_from_map"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        j.alias("as_json"),
        F.get_json_object(j, "$.b").alias("roundtrip_b"),
    )


@query(
    "array_higher_order_functions",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           CASE WHEN len(list_filter(embedding, x -> x > 0)) = 0 THEN 0.0
                ELSE list_reduce(
                    list_transform(list_filter(embedding, x -> x > 0), x -> CAST(x AS DOUBLE)),
                    (a, b) -> a + b) END AS sum_positive,
           CAST(list_max(embedding) AS DOUBLE) AS max_elem,
           CAST(list_min(embedding) AS DOUBLE) AS min_elem,
           CAST(len(list_filter(embedding, x -> abs(x) > 0.3)) > 0 AS INT) AS has_extreme,
           CAST(len(list_filter(embedding, x -> abs(x) <= 1.0)) = len(embedding) AS INT) AS all_bounded,
           CAST(list_sort(embedding)[1] AS DOUBLE) AS sorted_first
    FROM embeddings
    WHERE vec_id % 7 = 0
    """,
    tags=("scalar", "array", "hof"),
)
def array_higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (SURVEY §2.8): filter, aggregate
    (left fold — association-order-identical to the oracle's
    list_reduce), exists/forall, array_max/min, sort. Results reduced
    to scalars so float formatting never enters the comparison."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 7 == 0)
    pos = F.filter("embedding", lambda x: x > 0)
    return e.select(
        "vec_id",
        F.size(pos).alias("n_positive"),
        F.aggregate(pos, F.lit(0.0), lambda a, x: a + x.cast("double")).alias("sum_positive"),
        F.array_max("embedding").cast("double").alias("max_elem"),
        F.array_min("embedding").cast("double").alias("min_elem"),
        F.exists("embedding", lambda x: F.abs(x) > 0.3).cast("int").alias("has_extreme"),
        F.forall("embedding", lambda x: F.abs(x) <= 1.0).cast("int").alias("all_bounded"),
        F.element_at(F.array_sort("embedding"), 1).cast("double").alias("sorted_first"),
    )


@query(
    "udtf_tokenize_documents",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(list_filter(
                   string_split_regex(lower(text), '\\s+'), x -> x <> ''))) AS token
        FROM documents
    )
    SELECT token, COUNT(*) AS doc_freq
    FROM toks
    GROUP BY token
    """,
    tags=("udtf", "text"),
)
def udtf_tokenize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (1 row -> N rows, SURVEY §2.10): tokenizer exploding
    each document into distinct tokens, then document-frequency
    aggregation. For this exact job explode(split(...)) is the faster
    built-in (see dedup shingling); the UDTF exists to cover the
    table-function surface for logic that genuinely needs Python."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, token: string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:  # null doc -> no tokens (oracle: unnest(NULL) -> 0 rows)
                return
            import re

            # explicit ASCII whitespace class, matching the oracle's
            # RE2 \s ([ \t\n\f\r]). NOTE: Java's \s additionally
            # matches \x0B (vertical tab), so the F.split-based
            # queries would split on \x0B where this UDTF and the RE2
            # oracles do not — a pinned engine divergence (see
            # tests/test_degenerate_input.py \x0B coverage), not a
            # shared contract. Python's str.split() would ALSO split
            # on unicode spaces (NBSP, U+2000..) and silently diverge
            # on multilingual text — caught by the round-7 unicode
            # twin gate.
            for tok in sorted(set(t for t in re.split(r"[ \t\n\f\r]+", text.lower()) if t)):
                yield doc_id, tok

    docs = load(spark, sf_dir, "documents")
    spark.udtf.register("tokenize_udtf", Tokenize)
    docs.createOrReplaceTempView("v_docs_udtf")
    toks = spark.sql(
        "SELECT t.token FROM v_docs_udtf d, LATERAL tokenize_udtf(d.doc_id, d.text) t"
    )
    return toks.groupBy("token").agg(F.count("*").alias("doc_freq"))


# ~10% Bernoulli keep: md5 of the row's unique key maps to a bucket in
# [0, 256); keep bucket < 26. Identical arithmetic in both engines.
_TS_HEX = "0123456789abcdef"
_TS_KEEP = 26


def _ts_bucket(concat_expr: str) -> str:
    h = f"md5({concat_expr})"
    return (
        f"(instr('{_TS_HEX}', substring({h}, 1, 1)) - 1) * 16"
        f" + (instr('{_TS_HEX}', substring({h}, 2, 1)) - 1)"
    )


@query(
    "sample_tablesample",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_sampled,
           {SQL_DSUM("l_quantity")} AS sampled_qty
    FROM lineitem
    WHERE {_ts_bucket("CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)")} < {_TS_KEEP}
    GROUP BY l_returnflag
    """,
    tags=("scan", "sample"),
)
def sample_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE-equivalent Bernoulli sampling, made deterministic:
    each row's unique key (l_orderkey, l_linenumber) hashes to a bucket
    in [0, 256) and ~10% (26/256) are kept. Engine-native .sample()
    uses engine-specific RNG (unverifiable across engines and unstable
    under repartitioning); the hash filter gives the same sample on
    every run, engine, and partitioning — and is still a pure
    codegen'd scan+filter with no shuffle before the reporting
    aggregate, so sampling cost stays at the scan like TABLESAMPLE."""
    l = load(spark, sf_dir, "lineitem")
    bucket = F.expr(
        _ts_bucket("concat(CAST(l_orderkey AS STRING), '-', CAST(l_linenumber AS STRING))")
    )
    return (
        l.filter(bucket < _TS_KEEP)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_sampled"), dsum("l_quantity").alias("sampled_qty"))
    )


_HEX16 = "0123456789abcdef"
# per-stratum keep thresholds out of 256 — downsample the dominant
# language, keep the rare ones
_STRATA_RATES = {"en": 64, "de": 192, "es": 192, "fr": 192, "zh": 256}
def _bucket256(cast_type: str) -> str:
    # identical arithmetic in both engines; only the string type name
    # differs (Spark: STRING, DuckDB: VARCHAR)
    h = f"md5(CAST(doc_id AS {cast_type}))"
    return (
        f"(instr('{_HEX16}', substring({h}, 1, 1)) - 1) * 16"
        f" + (instr('{_HEX16}', substring({h}, 2, 1)) - 1)"
    )


_SQL_BUCKET256 = _bucket256("VARCHAR")
_SQL_RATE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items()
) + " ELSE 128 END"


@query(
    "sample_stratified_hash",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS min_doc_id
    FROM documents
    WHERE {_SQL_BUCKET256} < {_SQL_RATE}
    GROUP BY lang
    """,
    tags=("sample", "llm", "stratified"),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for corpus rebalancing: each
    document's md5(doc_id) maps to a bucket in [0, 256); a per-stratum
    threshold keeps ~rate/256 of that language (here: downsample the
    dominant 'en' to 25%, keep all 'zh'). Hash-based (not RNG-seeded)
    sampling is reproducible across runs, engines, and partitionings —
    the property a training-data pipeline needs so reruns produce the
    same corpus. Pure scan+filter: no shuffle before the reporting
    aggregate, and the filter is a codegen'd expression at the scan."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.expr(_bucket256("STRING"))
    rate = F.expr(_SQL_RATE)
    return (
        docs.filter(bucket < rate)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.min("doc_id").alias("min_doc_id"))
    )


def _cogroup_spend(key, cust_pdf, ord_pdf):
    """Per-customer merge of the customer row with their orders —
    arbitrary two-sided pandas logic per key (the shape for
    reconciliation / feature-join steps no SQL join expresses).
    Exactness: money summed as integer cents (float64 group-sum order
    depends on shuffle arrival; int64 does not)."""
    import pandas as pd

    n_orders = len(ord_pdf)
    spend_cents = int((ord_pdf["o_totalprice"] * 100).round().astype("int64").sum()) if n_orders else 0
    return pd.DataFrame(
        {
            "c_custkey": [int(key[0])],
            "n_orders": [n_orders],
            "total_spend": [spend_cents / 100.0],
            "acctbal": [float(cust_pdf["c_acctbal"].iloc[0])],
        }
    )


@query(
    "cogroup_customer_orders_pandas",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)), 0) AS DOUBLE) / 100.0
             AS total_spend,
           c.c_acctbal AS acctbal
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_acctbal
    """,
    tags=("udf", "pandas", "cogroup"),
)
def cogroup_customer_orders_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (SURVEY §2.10 grouped-map family): the
    customer and orders tables are co-partitioned by key and each
    key's two pandas frames are handed to one Python function — the
    Spark-native replacement for driver-side merge loops. One shuffle
    per side on the key; Arrow moves each group across the boundary.
    Oracle is the equivalent LEFT JOIN aggregate (integer-cents sum
    for cross-engine exactness)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            _cogroup_spend,
            schema="c_custkey long, n_orders long, total_spend double, acctbal double",
        )
    )
