"""Query-gated Vietnamese listing normalization (SURVEY.md §2.8/§2.10,
reference domain: CrawlData.py's Vietnamese housing-ad corpus).

The testbed has no Vietnamese listing table, so the corpus is a
shared inline VALUES list — the same rows feed `createDataFrame` on
the Spark side and a VALUES CTE in the DuckDB oracle, putting the
diacritic folding, admin-prefix stripping, and price-text parsing
(listings/vietnamese.py) under the full cross-engine value-hash gate
instead of unit tests only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.listings.vietnamese import (
    _ADMIN_PREFIX,
    _ASCII_FULL,
    _VI_FULL,
    norm_admin_key,
    parse_price_vnd,
)
from bigdata_project_spark.registry import query

# (listing_id, district, price_text) — covers every admin prefix class
# and price form the parser handles: decimal-comma tỷ, plain triệu,
# per-period suffix, negotiable (-> null), thousands-dot triệu
_VN_ROWS = [
    (1, "Quận Ba Đình", "5,6 tỷ"),
    (2, "Huyện Gia Lâm", "850 triệu"),
    (3, "Phường Cống Vị", "8 triệu/tháng"),
    (4, "Thị xã Sơn Tây", "Thỏa thuận"),
    (5, "Quận Hoàn Kiếm", "1.200 triệu"),
    (6, "Thành phố Thủ Đức", "12,5 tỷ"),
    (7, "Đường Láng Hạ", "950 triệu"),
    (8, "Xã Vân Canh", "2 tỷ"),
    (9, "Thị trấn Đông Anh", "3,25 tỷ"),
    (10, "Quận Ba Đình", "6,1 tỷ"),
]

_SQL_VALUES = ", ".join(f"({i}, '{d}', '{p}')" for i, d, p in _VN_ROWS)
# the pandas UDF's extraction regex, restricted to the units the
# corpus uses (identical RE2/Java semantics)
_NUM_RE = r"([0-9.,]+)\s*(tỷ|triệu)?"


@query(
    "vn_listing_normalize",
    oracle=f"""
    WITH listings(listing_id, district, price_text) AS (VALUES {_SQL_VALUES}),
    ex AS (
        SELECT listing_id, district,
               regexp_extract(price_text, '{_NUM_RE}', 1) AS num_s,
               regexp_extract(price_text, '{_NUM_RE}', 2) AS unit_s
        FROM listings
    )
    SELECT listing_id,
           lower(translate(regexp_replace(district, '{_ADMIN_PREFIX}', ''),
                           '{_VI_FULL}', '{_ASCII_FULL}')) AS admin_key,
           CAST(round(TRY_CAST(replace(replace(num_s, '.', ''), ',', '.') AS DOUBLE)
                      * CASE unit_s WHEN 'tỷ' THEN 1.0e9
                                    WHEN 'triệu' THEN 1.0e6
                                    ELSE 1.0e0 END) AS BIGINT) AS price_vnd
    FROM ex
    """,
    tags=("scalar", "vietnamese", "udf"),
)
def vn_listing_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference corpus's domain normalizations under the oracle
    gate: admin join key (strip 'Quận/Huyện/...' prefix, fold
    diacritics via one translate(), lower) and free-text price to VND
    (Arrow-vectorized pandas UDF — '5,6 tỷ' -> 5_600_000_000,
    'Thỏa thuận' -> null). The oracle re-derives the price in SQL
    (regexp extract + unit multiply, e-notation double constants), so
    the UDF's arithmetic is value-hash-checked, not just row-counted.
    Reference parity: CrawlData.py stores these fields raw; SURVEY
    §2.8/§2.10 declare the normalization surface."""
    df = spark.createDataFrame(_VN_ROWS, "listing_id int, district string, price_text string")
    return df.select(
        "listing_id",
        norm_admin_key(F.col("district")).alias("admin_key"),
        parse_price_vnd(F.col("price_text")).alias("price_vnd"),
    )
