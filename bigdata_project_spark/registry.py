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
# Round-8 final cohort: the two oracled queries added AFTER the r7
# window froze — qa_nonfinite_embeddings (vector-health audit) and
# qa_timestamp_bounds (event-time validity audit) — go FIRST in the
# r8 window so no never-checked debt survives, followed by the
# oldest-last-checked regression sweep (computed from
# CORRECTNESS_r01-r06 + this window; vintage r2/r3, registration
# order within vintage; drop the last two r3 names below to stay at
# 50):
#   r2 vintage: dedup_exact_hash dedup_simhash64
#     dedup_fingerprint_winnow multimodal_binary_metadata
#     multimodal_decode_features sim_knn_bruteforce sim_ann_ivf_probe
#     sim_centroid_per_label join_salted_event_weights
#     text_stats_quality text_langid_markers text_token_count_bpe
#     text_quality_pandas_udf udaf_weighted_avg_discount text_tfidf_top3
#     text_zscore_grouped_pandas text_bm25_topk sql_grouping_sets
#     pivot_status_by_priority join_q5_regional_revenue
#     scalar_geo_haversine_km scalar_string_advanced
#     scalar_map_json_construction array_higher_order_functions
#     udtf_tokenize_documents sample_stratified_hash
#     cogroup_customer_orders_pandas window_ratio_to_report
#   r3 vintage: arrow_map_component_stats arrow_grouped_label_extremes
#     generator_posexplode_embedding_head generator_explode_outer_empty
#     generator_stack_unpivot generator_inline_struct_array
#     generator_unpivot_native join_revenue_per_nation
#     join_broadcast_brand_volume join_left_outer_customer_orders
#     join_full_outer_nation_presence join_semi_big_spenders
#     join_anti_never_ordered join_range_price_bands
#     join_asof_purchase_click join_cross_region_status
#     join_shipping_priority_top10 join_hint_broadcast_sql
#     sort_null_ordering setop_union_all_nation_rows
#     setop_union_distinct setop_intersect_buyers_building
_DRIVER_FIRST: tuple[str, ...] = (
    # --- the 37 never-driver-checked oracled queries (full backlog) ---
    "dedup_prefix_filter_jaccard",
    "dedup_containment_pairs",
    "dedup_normalized_exact",
    "multimodal_audio_chunk_plan",
    "text_unigram_surprisal",
    "quality_duplicate_passage_share",
    "dedup_minhash_estimate_error",
    "corpus_keep_best_per_cluster",
    "corpus_quality_gate",
    "sim_truncated_dim_recall",
    "sim_maxsim_multivector",
    "sim_ann_lsh_multiprobe",
    "sim_recall_multiprobe",
    "agg_histogram_fixed",
    "scalar_string_format",
    "qa_skew_histogram",
    "qa_benford_leading_digit",
    "qa_nonfinite_values",
    "agg_correlation_matrix",
    "agg_mode_exact",
    "agg_winsorized_mean",
    "events_markov_transitions",
    "events_audience_overlap",
    "events_longest_streak",
    "events_dow_seasonality",
    "events_session_depth_histogram",
    "events_hour_profile",
    "join_range_price_bands_binned",
    "join_copurchase_lift",
    "events_autocorr_lag7",
    "events_freshness_lag",
    "events_bot_flag_rules",
    "window_forward_fill_ignore_nulls",
    "stream_daily_distinct_users",
    "stream_exactly_once_dedup",
    "stream_stream_left_outer_join",
    "stream_topk_types_daily",
    # --- 13 re-confirmation slots: oldest driver rows (round 2) ---
    "agg_collect_sorted",
    "agg_conditional",
    "agg_cube_status_priority",
    "agg_distinct_per_segment",
    "agg_median_exact",
    "agg_minmaxby",
    "agg_percentile_native",
    "agg_pricing_summary",
    "agg_regression_price_on_qty",
    "agg_rollup_region_nation",
    "agg_stats_moments",
    "agg_two_stage_salted_flags",
    "agg_user_event_entropy",
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
