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
# checks the first 50 registered queries each round. Cumulative through
# round 6 (CORRECTNESS_r01-r06.json): 236 distinct queries driver-
# checked, 234 ever-green; the round-6 window came back 50/50 green.
# Oracle outputs are canonicalization-gated (integer SUMs CAST AS
# BIGINT, arrays stringified; tests/test_registry_hygiene.py) so the
# round-5 HUGEINT defect class cannot reappear.
#
# Round-7 window (exactly 50): the complete never-driver-checked
# backlog — all 37 oracled queries without a driver row, judge-
# verified green vs DuckDB at sf0.01 in rounds 5 and 6 — followed by
# 13 re-confirmation slots for the queries whose most recent driver
# row is oldest (round 2, the aggregate family), guarding against
# silent regression since then. No-oracle (rows-only) queries are
# excluded: their correctness gate is the +/-5%-of-exact property
# tests in tests/, not a driver hash (see COVERAGE.md).
#
# Round-8 window (exactly 50): never-checked debt first — the two
# oracled audits added AFTER the r7 window froze (judge-verified green
# at sf0.01 in r7) plus any queries newly registered THIS round — then
# the oldest-last-checked regression sweep (vintage r2/r3 from
# CORRECTNESS_r01-r07, registration order within vintage, trimmed from
# the tail to keep the window at 50).
#
# Round-9 rotation queue: FIRST the oracled queries registered after
# this window froze (never driver-checked) —
#   corpus_dsir_importance stream_quarantine_gated_daily
#   multimodal_wav_decode qa_k_anonymity
#   dedup_semantic_incremental (+ any further r8 additions
#   — at r9 start, diff all_oracles() against CORRECTNESS_r01-r08
#   row names to enumerate the exact never-checked set)
# — then oldest-last-checked: the r3-vintage names trimmed from the
# tail below —
#   join_hint_broadcast_sql sort_null_ordering
#   setop_union_all_nation_rows setop_union_distinct
#   setop_intersect_buyers_building
# — then the r3 setop/window remainder (setop_intersect_all_parts,
# setop_except_nonbuyers, setop_except_all_lineitem_extras,
# setop_union_by_name_evolution, window_* r3 vintage), then r4.
_DRIVER_FIRST: tuple[str, ...] = (
    # --- never driver-checked: post-r7-freeze audits + r8 additions ---
    "qa_nonfinite_embeddings",
    "qa_timestamp_bounds",
    "corpus_paragraph_dedup_rewrite",
    "dedup_semantic_cells",
    "silver_quarantine_split",
    # --- re-confirmation: oldest driver rows (round 2 vintage) ---
    "dedup_exact_hash",
    "dedup_simhash64",
    "dedup_fingerprint_winnow",
    "multimodal_binary_metadata",
    "multimodal_decode_features",
    "sim_knn_bruteforce",
    "sim_ann_ivf_probe",
    "sim_centroid_per_label",
    "join_salted_event_weights",
    "text_stats_quality",
    "text_langid_markers",
    "text_token_count_bpe",
    "text_quality_pandas_udf",
    "udaf_weighted_avg_discount",
    "text_tfidf_top3",
    "text_zscore_grouped_pandas",
    "text_bm25_topk",
    "sql_grouping_sets",
    "pivot_status_by_priority",
    "join_q5_regional_revenue",
    "scalar_geo_haversine_km",
    "scalar_string_advanced",
    "scalar_map_json_construction",
    "array_higher_order_functions",
    "udtf_tokenize_documents",
    "sample_stratified_hash",
    "cogroup_customer_orders_pandas",
    "window_ratio_to_report",
    # --- re-confirmation: round 3 vintage ---
    "arrow_map_component_stats",
    "arrow_grouped_label_extremes",
    "generator_posexplode_embedding_head",
    "generator_explode_outer_empty",
    "generator_stack_unpivot",
    "generator_inline_struct_array",
    "generator_unpivot_native",
    "join_revenue_per_nation",
    "join_broadcast_brand_volume",
    "join_left_outer_customer_orders",
    "join_full_outer_nation_presence",
    "join_semi_big_spenders",
    "join_anti_never_ordered",
    "join_range_price_bands",
    "join_asof_purchase_click",
    "join_cross_region_status",
    "join_shipping_priority_top10",
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
