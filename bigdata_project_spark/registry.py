"""Query registry: the single source of truth for the engine's surface.

Every operator from SURVEY.md §2 is declared here as a named query —
a callable (spark, sf_dir) -> DataFrame — optionally paired with an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
`__spark_entry__.queries()` / `oracle_sql()` are thin views over this
registry, and tests iterate it.

Determinism contract (so the driver's order-insensitive value-hash
matches between Spark and DuckDB):
- sums/avgs of double columns go through DECIMAL (exact, associative)
  and are cast back to DOUBLE at the end — both engines produce the
  identical IEEE double regardless of partitioning/order;
- timestamps in outputs are emitted as epoch microseconds (BIGINT) or
  ISO date strings, never raw timestamp cells;
- every LIMIT / window-rank has a unique total-order tiebreaker so the
  selected row set is engine-independent;
- column names are aliased identically in the Spark plan and the SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)

    @property
    def doc(self) -> str:
        return (self.fn.__doc__ or "").strip()


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a named query (and its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import bigdata_project_spark.operators  # noqa: F401  (side-effect imports)
    import bigdata_project_spark.queries  # noqa: F401
    import bigdata_project_spark.streaming  # noqa: F401

    _LOADED = True
