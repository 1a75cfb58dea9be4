"""Deterministic count-min sketch with a measured-error audit (r11).

The count-min sketch (Cormode & Muthukrishnan 2005) is the standard
fixed-memory frequency estimator for streams and massive token
counts: d hash rows x w counters, update adds 1 to one counter per
row, estimate is the MIN over rows — never an underestimate, over by
at most the collision mass. Spark ships one behind
`count_min_sketch`, but (like `approx_count_distinct`'s HLL) its
binary sketch is not replayable in an oracle, so this module builds
the deterministic form the engine's correctness contract wants:

- d = 4 rows, w = 1024 counters; row r's position is hex chars
  3r+1..3r+3 of md5(token), decoded nibble-wise, mod 1024 (4096 is a
  multiple of 1024, so the fold is exactly uniform — no modulo
  bias). Same lambda-bound decode discipline as `bloom.py` (md5
  evaluated once per row).
- Build: ONE aggregate keyed by (row, col) — at most 4096 groups no
  matter the corpus size, perfectly map-side-combinable; counters
  are weighted by term frequency, which is identical to streaming
  the occurrences one by one.
- The AUDIT: for the top-20 exact heavy tokens, the query emits the
  exact count, the CMS estimate, and the overestimate — so the
  "never under, rarely much over" contract is MEASURED per token
  (the `join_bloom_fp_audit` discipline: sketches earn their place
  by showing their realized error, not the textbook bound). The
  exact tf table exists here to grade the sketch; a production
  consumer keeps only the 4096-counter table.

Scale: the sketch build shuffles (row, col) keys — constant 4096
cardinality at any corpus size; the sketch broadcasts (~32 KB); the
top-k side is `TakeOrderedAndProject` over the tf aggregate the
repo's token queries already ride.

Reference scope: [ext] — BASELINE north star; companion to the
HLL rows (approx distinct) and Misra-Gries (exact heavy hitters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.operators.dedup import words_col
from bigdata_project_spark.registry import REGISTRY, query
from bigdata_project_spark.tables import load_spread

_CMS_D = 4  # hash rows
_CMS_W = 1024  # counters per row
_TOP = 20  # audited heavy tokens


def _cms_pos_sql(r: int) -> str:
    """DuckDB position of row r: 3 hex chars at 3r+1, mod width."""
    terms = [
        f"(instr('0123456789abcdef', substring(md5(token), {3 * r + i + 1}, 1)) - 1)"
        f" * {16 ** (2 - i)}"
        for i in range(3)
    ]
    return "((" + " + ".join(terms) + f") % {_CMS_W})"


# Spark-side: all 4 positions from ONE md5 evaluation (lambda-bound,
# the bloom.py discipline)
_CMS_POS_ARRAY = f"""
    transform(array(md5(token)), h ->
      transform(sequence(0, {_CMS_D - 1}), r ->
        ((instr('0123456789abcdef', substring(h, r * 3 + 1, 1)) - 1) * 256
         + (instr('0123456789abcdef', substring(h, r * 3 + 2, 1)) - 1) * 16
         + (instr('0123456789abcdef', substring(h, r * 3 + 3, 1)) - 1))
        % {_CMS_W}))[0]
"""


@query(
    "agg_countmin_audit",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS token
        FROM documents
    ),
    tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count FROM toks GROUP BY token),
    entries AS (
        SELECT r.r AS r,
               CASE r.r
                 WHEN 0 THEN {_cms_pos_sql(0)}
                 WHEN 1 THEN {_cms_pos_sql(1)}
                 WHEN 2 THEN {_cms_pos_sql(2)}
                 ELSE {_cms_pos_sql(3)}
               END AS col,
               exact_count
        FROM tf, LATERAL (SELECT unnest(range({_CMS_D})) AS r) r
    ),
    sketch AS (
        SELECT r, col, CAST(SUM(exact_count) AS BIGINT) AS c
        FROM entries GROUP BY r, col
    ),
    top AS (
        SELECT token, exact_count FROM tf
        ORDER BY exact_count DESC, token DESC LIMIT {_TOP}
    ),
    probe AS (
        SELECT t.token, t.exact_count, r.r AS r,
               CASE r.r
                 WHEN 0 THEN {_cms_pos_sql(0)}
                 WHEN 1 THEN {_cms_pos_sql(1)}
                 WHEN 2 THEN {_cms_pos_sql(2)}
                 ELSE {_cms_pos_sql(3)}
               END AS col
        FROM top t, LATERAL (SELECT unnest(range({_CMS_D})) AS r) r
    )
    SELECT p.token, p.exact_count,
           CAST(MIN(s.c) AS BIGINT) AS cms_estimate,
           CAST(MIN(s.c) - p.exact_count AS BIGINT) AS overestimate
    FROM probe p JOIN sketch s ON s.r = p.r AND s.col = p.col
    GROUP BY p.token, p.exact_count
    """,
    tags=("llm", "sketch", "countmin", "audit", "scale"),
)
def agg_countmin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build + per-token error audit for the top-20
    exact heavy tokens: exact count, CMS estimate (min over the 4
    rows), and the realized overestimate. The min-over-rows contract
    (estimate >= exact, always) is value-oracled — DuckDB replays
    the identical md5-slice arithmetic bucket for bucket. Module
    docstring has the layout and the 100 TB shuffle story (constant
    4096-group build, broadcast sketch, TakeOrdered top-k)."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(F.explode(words_col(F.col("text"))).alias("token"))
    tf = toks.groupBy("token").agg(F.count("*").cast("long").alias("exact_count"))
    pos = F.expr(_CMS_POS_ARRAY)
    entries = tf.select("exact_count", F.posexplode(pos).alias("r", "col"))
    sketch = entries.groupBy("r", "col").agg(
        F.sum("exact_count").cast("long").alias("c")
    )
    top = tf.orderBy(F.desc("exact_count"), F.desc("token")).limit(_TOP)
    probe = top.select("token", "exact_count", F.posexplode(pos).alias("r", "col"))
    return (
        probe.join(F.broadcast(sketch), ["r", "col"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").cast("long").alias("cms_estimate"))
        .select(
            "token",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).cast("long").alias(
                "overestimate"
            ),
        )
    )


assert "agg_countmin_audit" in REGISTRY  # registration side effect
