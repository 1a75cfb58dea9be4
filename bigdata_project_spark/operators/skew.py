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
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    if src is None:
        src = F.spark_partition_id()  # last resort; prefer a real column
    salted_fact = fact.withColumn("_salt", F.pmod(F.hash(src), F.lit(n_salts)))
    salted_dim = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    joined = salted_fact.join(salted_dim, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


def two_stage_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 8,
    salt_source: str | Column = None,
) -> DataFrame:
    """Salted two-stage aggregation: groupBy(key, salt) with the
    partial expression, then groupBy(key) with the merge expression.

    `aggs` maps output name -> (partial_agg_expr, merge_agg_expr_over
    _partial); e.g. {"n": (F.count("*"), F.sum("n"))}.
    """
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    salted = df.withColumn("_salt", F.pmod(F.hash(src), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(key).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )
