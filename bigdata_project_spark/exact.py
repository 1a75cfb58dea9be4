"""Cross-engine exact-arithmetic helpers.

The driver verifies each query by hashing Spark's result against a
DuckDB oracle's result. Double-precision SUM/AVG are order-dependent,
and Spark's partitioned partial aggregation will not, in general, add
in the same order as DuckDB — so naive `F.sum(double)` can differ in
the last ulps and fail a value-hash even though both are "right".

Fix: aggregate through DECIMAL (exact, associative, order-free), then
cast the final value back to DOUBLE. Both engines round the same
input double to the same decimal (scale >= 4 avoids rounding-mode
ties, which require a binary-exact half at the decimal boundary —
impossible for scale 6 since 5e-7 is not a binary fraction), sum
exactly, and convert the identical decimal to the identical double.

The oracle SQL must mirror the same pattern; `SQL_DSUM`/`SQL_DAVG`
format helpers keep the two sides in lock-step.

At 100 TB this costs one widened column in the partial aggregate —
decimal(38,6) sums are still map-side-combined and whole-stage
codegen'd by Tungsten; it does not change the shuffle shape.

CAVEAT — integer-valued terms: do NOT route large-integer sums (epoch
microseconds, byte counts) through DECIMAL(38,6). The scale-6
representation multiplies by 1e6, and once the scaled integer exceeds
2^53 an engine that converts decimal->double via double(scaled_int) *
1e-6 double-rounds while one that converts the exact value in one
step rounds once — observed last-ulp drift on inter-arrival sums.
For integer terms a plain BIGINT SUM is already exact and
order-free; cast to double only at the end (sums below 2^53 convert
exactly, and the single division is IEEE-identical everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def _finite_or_error(c: Column) -> Column:
    """Fail-loudly guard for the exact-sum tier (round 7).

    DECIMAL cannot represent NaN/±Inf, and the two engines disagree on
    what the cast does: DuckDB raises a conversion error, but Spark's
    cast — even with ANSI enabled — silently returns NULL for
    non-finite doubles, so a naive SUM(CAST(x AS DECIMAL)) would drop
    poisoned rows and corrupt financial totals invisibly (the exact
    outcome the determinism contract forbids; SCALE.md "Non-finite
    doubles"). This guard raises instead, matching the oracle's
    behavior: data that bypassed the qa_nonfinite_values gate fails
    the job loudly in BOTH engines. NULLs stay in-contract: the CASE
    condition is only TRUE for genuinely non-finite values (a NULL
    condition falls through to the pass-through branch).

    Cost: one branch + isnan/abs per input row, inside whole-stage
    codegen — it does not change the partial-aggregate shuffle shape.
    """
    poisoned = F.isnan(c) | (F.abs(c) == F.lit(float("inf")))
    return F.when(
        poisoned,
        F.raise_error(
            F.concat(
                F.lit(
                    "non-finite double reached the exact-sum tier; "
                    "gate upstream with qa_nonfinite_values: "
                ),
                c.cast("string"),
            )
        ),
    ).otherwise(c)


def dcast(c: Column | str) -> Column:
    """Guarded DECIMAL cast for hand-rolled exact sums (two-stage /
    salted aggregates that can't call dsum directly): same fail-loudly
    contract, same decimal(38,6) target."""
    c = F.col(c) if isinstance(c, str) else c
    return _finite_or_error(c).cast(DEC)


def dsum(c: Column | str) -> Column:
    """Order-independent exact sum of a double column, returned as
    double. Raises on NaN/±Inf input — see `_finite_or_error`."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(_finite_or_error(c).cast(DEC)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent avg: exact decimal sum / non-null count, as
    double. Raises on NaN/±Inf input — see `_finite_or_error`."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.sum(_finite_or_error(c).cast(DEC)).cast("double") / F.count(c)).cast("double")


def SQL_DSUM(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def SPARK_SQL_DSUM(expr: str) -> str:
    """Spark-side SQL-string spelling of `dsum` for spark.sql()
    queries: same fail-loudly non-finite guard, same decimal(38,6)
    route. Needed because Spark's ANSI cast silently NULLs
    NaN/Inf->DECIMAL (DuckDB raises) — a bare CAST inside SUM in a
    spark.sql() string is the same silent-corruption defect class
    `_finite_or_error` closes for the DataFrame API (ADVICE r7: the
    SQL-string spelling was unguarded)."""
    guarded = (
        f"CASE WHEN isnan({expr}) OR abs({expr}) = double('Infinity') THEN "
        f"raise_error(CONCAT('non-finite double reached the exact-sum tier; "
        f"gate upstream with qa_nonfinite_values: ', CAST({expr} AS STRING))) "
        f"ELSE {expr} END"
    )
    return f"CAST(SUM(CAST({guarded} AS DECIMAL(38,6))) AS DOUBLE)"


def SQL_DAVG(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr}))"
