"""Skew mitigation (SURVEY.md §7e: one district holds 55% of the
reference corpus; at 100 TB a hot key stalls its shuffle partition).

Two mechanisms, complementary to AQE's runtime skew-join splitting
(enabled in session.py):

- `salted_join`: explicit key salting for deterministic plans — the
  fact side gets a salt derived from an existing unique column (no
  RNG, so plans are reproducible), the dim side is replicated
  n_salts times; the join key becomes (key, salt).
- `two_stage_agg`: salt -> partial agg -> final agg, for aggregations
  whose single hot group would otherwise serialize (Catalyst's
  partial aggregation already gives this for algebraic aggregates;
  the explicit form is for when the partial state is large, e.g.
  collect-like or exact-distinct states).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt_source: str | Column | None, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) — deterministic per ROW
    VALUE, not merely per plan. Prefer a real roughly-uniform column;
    the fallback hashes ALL of the row's columns.

    Why value-determinism matters: under a fetch-failure PARTIAL stage
    retry, Spark recomputes only the lost map tasks and does NOT treat
    expression-level nondeterminism as making the stage indeterminate
    (SPARK-23207 class). A salt from monotonically_increasing_id() or
    spark_partition_id() can differ between the original and retried
    attempt, moving rows to different reduce partitions — rows then
    get double-counted (consumed by the original attempt's reducer AND
    the retry's) or lost. A salt that is a pure function of the row's
    column values lands every row in the same reduce partition on
    every attempt, so salted joins/aggregates stay exactly-once under
    partial retries. (Duplicate rows sharing a salt is fine — spread
    degrades only if the hot key's rows are near-identical across ALL
    columns, in which case no row-level salt can help and the caller
    should pre-aggregate.)"""
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    if src is None:
        src = F.struct(*[F.col(c) for c in df.columns])
    return F.pmod(F.hash(src), F.lit(n_salts))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed fact table to a dim by replicating the dim.

    The fact's salt comes from `salt_source` (any roughly-uniform
    existing column; defaults to the key's own hash mixed with a
    second column is the caller's choice) — deterministic, no rand().
    The dim is exploded n_salts times, so every (key, salt) bucket
    finds its dim row. Each hot key now spreads over n_salts shuffle
    partitions.
    """
    salted_fact = fact.withColumn("_salt", _salt_col(fact, salt_source, n_salts))
    salted_dim = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    joined = salted_fact.join(salted_dim, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


def two_stage_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 8,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Salted two-stage aggregation: groupBy(key, salt) with the
    partial expression, then groupBy(key) with the merge expression.

    `aggs` maps output name -> (partial_agg_expr, merge_agg_expr_over
    _partial); e.g. {"n": (F.count("*"), F.sum("n"))}.
    """
    salted = df.withColumn("_salt", _salt_col(df, salt_source, n_salts))
    partial = salted.groupBy(key, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(key).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


from pyspark.sql import SparkSession  # noqa: E402

from bigdata_project_spark.exact import SQL_DSUM, dcast  # noqa: E402
from bigdata_project_spark.registry import query  # noqa: E402
from bigdata_project_spark.tables import load  # noqa: E402


@query(
    "join_salted_event_weights",
    oracle=f"""
    SELECT e.event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM('e.value * w.weight')} AS weighted_value
    FROM events e
    JOIN (VALUES ('purchase', 5.0), ('signup', 3.0), ('click', 1.0),
                 ('view', 0.5), ('error', 0.0)) AS w(event_type, weight)
      ON e.event_type = w.event_type
    GROUP BY e.event_type
    """,
    tags=("join", "skew", "salted"),
)
def join_salted_event_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """salted_join under the oracle gate: a 5-value join key is the
    canonical hot-key shape (every row lands in one of 5 shuffle
    partitions without salting). The salt spreads each key over 8
    buckets; results are provably identical to the unsalted join —
    the oracle is the plain SQL."""
    ev = load(spark, sf_dir, "events")
    weights = ev.sparkSession.createDataFrame(
        [("purchase", 5.0), ("signup", 3.0), ("click", 1.0), ("view", 0.5), ("error", 0.0)],
        ["event_type", "weight"],
    )
    joined = salted_join(ev, weights, "event_type", n_salts=8, salt_source="event_id")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(dcast(F.col("value") * F.col("weight"))).cast("double").alias("weighted_value"),
    )


@query(
    "agg_two_stage_salted_flags",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {SQL_DSUM('l_quantity')} AS total_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "skew", "salted"),
)
def agg_two_stage_salted_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """two_stage_agg under the oracle gate: 3 giant groups
    (l_returnflag) each spread over 8 salt buckets, partial-aggregated
    per (key, salt), then merged per key. Decimal partial sums make
    the two-stage result bit-identical to the one-stage plain SQL."""
    li = load(spark, sf_dir, "lineitem")
    out = two_stage_agg(
        li,
        "l_returnflag",
        {
            "n": (F.count("*"), F.sum("n")),
            "total_qty": (F.sum(dcast("l_quantity")), F.sum("total_qty")),
        },
        n_salts=8,
        salt_source="l_orderkey",
    )
    return out.select("l_returnflag", "n", F.col("total_qty").cast("double").alias("total_qty"))
