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


def _released_build(fn: QueryFn) -> QueryFn:
    """Release the calling session's previously-tracked caches before
    building the next query. Sequential sweeps (the external harness,
    bench, the local oracle gate) materialize each query fully before
    building the next but never call release_cached themselves — so
    tracked persists would otherwise accumulate across hundreds of
    builds and eventually exhaust the driver heap (observed as a
    java.lang.OutOfMemoryError late in a 139-query x 3-scale sweep on
    a default-sized JVM). Contract: one in-flight cached query per
    session; callers that interleave builds of multiple cached queries
    should call REGISTRY[name].fn directly."""
    import functools

    from bigdata_project_spark.caching import release_cached

    @functools.wraps(fn)
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        # caches only — NOT checkpoint blocks: unpersisting a cache
        # just forces recompute if the previous query is somehow still
        # un-collected, but freeing a localCheckpoint would make a
        # built-but-not-yet-collected clustering result unrecomputable
        release_cached(spark, include_rdd_ids=False)
        return fn(spark, sf_dir)

    return build


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: _released_build(spec.fn) for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False

# Externally-verified-first ordering. The driver's correctness harness
# checks the first 50 registered queries each round. Rounds 1-3
# hash-verified 97 distinct queries (CORRECTNESS_r01-r03.json); round 4
# front-loads the 43 oracled queries that have never had a driver row
# (the events batch family, 16 scalar families, the round-3 corpus
# operators, SCD2/MERGE, PageRank, null-safe join, union-by-name,
# vn_listing_normalize), plus `sample_tablesample` (its only driver
# rows predate the determinism fix in commit 8505300) and six
# re-verification slots for r2-green queries whose modules were edited
# in r3 after their green rows (the shingle-cap and HOF rewrites).
# No-oracle queries are deliberately excluded — a rows-only row wastes
# a window slot. Queries not named here keep their registration
# (import) order after these.
_DRIVER_FIRST: tuple[str, ...] = (
    # events batch family (§2.9 batch twins) — never driver-checked
    "events_tumbling_hourly",
    "events_sliding_1h_15m",
    "events_session_30m",
    "events_dedup_first_arrival",
    "events_rate_per_type_day",
    "events_funnel_view_click_purchase",
    "events_retention_cohort",
    "events_gapfill_hourly",
    # round-3 corpus / training-data operators (§2.10) — never driver-checked
    "graph_pagerank_neardup",
    "pack_sequences_by_source",
    "pack_sequences_global",
    "contamination_ngram_overlap",
    "scrub_pii_stats",
    "split_train_val_test",
    "quality_repetition_filter",
    "dedup_incremental_merge",
    "training_corpus_manifest",
    "sample_fixed_k_per_stratum",
    "text_rarity_score",
    "multimodal_feature_knn",
    # lakehouse maintenance (§2.10) — never driver-checked
    "scd2_user_status_history",
    "lake_merge_upsert_projection",
    # scalar families (§2.8) — never driver-checked
    "scalar_string_functions",
    "scalar_date_functions",
    "scalar_math_guarded",
    "scalar_null_handling",
    "scalar_array_functions",
    "scalar_json_extraction",
    "scalar_case_conversion",
    "scalar_regexp_family",
    "scalar_url_parse",
    "scalar_csv_column_codec",
    "scalar_interval_datetime",
    "scalar_try_functions",
    "scalar_bit_binary_ops",
    "scalar_array_set_algebra",
    "scalar_date_construction",
    "scalar_map_higher_order",
    # aggregate families (§2.4) — never driver-checked
    "agg_boolean_family",
    "agg_bitwise",
    # join / setop stragglers (§2.3, §2.7) — never driver-checked
    "join_null_safe_eq",
    "setop_union_by_name_missing",
    # reference-parity normalization (§2.2) — never driver-checked
    "vn_listing_normalize",
    # deterministic since commit 8505300; prior driver rows predate the fix
    "sample_tablesample",
    # re-verification: r2-green but their modules were edited in r3
    "dedup_ngram_jaccard",
    "dedup_cluster_components",
    "corpus_clean_pipeline",
    "sim_ann_lsh_banded",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
)


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import bigdata_project_spark.operators  # noqa: F401  (side-effect imports)
    import bigdata_project_spark.queries  # noqa: F401
    import bigdata_project_spark.streaming  # noqa: F401

    _LOADED = True

    # lenient: a stale name here must reorder less, not take down the
    # whole driver contract (queries()/oracle_sql() are the product
    # surface; raising would fail every query, not just the stale one)
    missing = [n for n in _DRIVER_FIRST if n not in REGISTRY]
    if missing:
        import sys

        print(f"registry: _DRIVER_FIRST names unknown queries {missing}", file=sys.stderr)
    ordered = {n: REGISTRY[n] for n in _DRIVER_FIRST if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
