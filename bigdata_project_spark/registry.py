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
# Round-9 window (exactly 50): the 7 oracled queries registered after
# the r8 window froze (never driver-checked, judge-replay green in r8)
# first, any queries newly registered THIS round inserted after them
# (tail trimmed to keep the window at 50), then oldest-last-checked:
# the r3-vintage setop/sort/sub/window/stream re-confirms, then the
# head of the r4 vintage (registration order within vintage).
#
# Round-10 window (exactly 50): round-10 additions inserted at the
# head as they land (tail trimmed to keep 50), then oldest-last-
# checked — the nine r4-vintage names trimmed from the r9 tail, the
# r4 remainder in registration order, then the r5 head.
#
# Round-11 rotation queue: FIRST any oracled queries registered after
# this window froze (diff all_oracles() against CORRECTNESS_r01-r10
# row names at r11 start), then oldest-last-checked — the 16 r4
# names trimmed from THIS window's tail during round 10 to make room
# for the sixteen r10 additions (in original order:
# events_gapfill_hourly, scalar_string_functions, scalar_date_functions,
# scalar_math_guarded, scalar_null_handling, scalar_array_functions,
# scalar_json_extraction, scalar_case_conversion, scalar_regexp_family,
# scalar_url_parse, scalar_csv_column_codec, scalar_interval_datetime,
# setop_union_by_name_missing, vn_listing_normalize, dedup_lsh_pair_recall,
# chunk_documents_overlap), then the r5
# vintage (registration order: vocab_top_terms,
# sample_quality_weighted, graph_triangle_stats,
# mixture_source_weights, quality_gopher_rules, lake_zorder_key,
# multimodal_resize_plan, sim_recall_at_k, sim_ann_ivf_nprobe2,
# sim_recall_ivf2_at_k, text_langid_confusion,
# qa_referential_integrity, qa_column_profile, scd2_snapshot_diff,
# agg_share_of_total, events_rollup_cascade, events_top_paths,
# events_rfm_segments, events_interarrival_stats,
# events_burst_detection, events_user_trend_slope,
# join_market_basket_pairs, the tpch_q* sweep,
# stream_incremental_rollup), then the r6 vintage.
# Round-12 window (exactly 50): the 10 round-12 additions first
# (never driver-checked), then the 11 names trimmed during round 11,
# then the r5-vintage remainder (tpch_q13 onward through
# stream_incremental_rollup, registration order), the r6-vintage
# streaming re-confirms, and the 4 next-oldest by last-checked round.
# Round-13 rotation queue: FIRST any oracled queries registered after
# this window froze (diff all_oracles() against CORRECTNESS_r01-r12
# row names at r13 start), then oldest-last-checked — the 3 names the
# late r12 additions trimmed from this window's tail
# (scalar_bit_binary_ops, tpch_q15_top_supplier,
# tpch_q16_supplier_part_counts), then the r6-vintage remainder not
# re-confirmed here (diff last-checked==6 names against this window;
# registration order), then the r7-vintage backlog (last-checked==7,
# registration order), then r8 onward. No-oracle (rows-only) entries
# stay excluded: the driver marks them err.
_DRIVER_FIRST: tuple[str, ...] = (
    # --- never driver-checked: round-12 additions (residual IVF-PQ
    # + refine, nprobe curve, Bernoulli NB + evals, quantile sketch
    # family, Stupid-Backoff gate; registration order) ---
    "sim_ivfpq_residual_rerank",
    "sim_recall_ivfpq_residual_rerank_at_k",
    "corpus_nb_seed_confusion",
    "sim_ivfpq_residual",
    "sim_recall_ivfpq_residual_at_k",
    "sim_ivfpq_nprobe_curve",
    "corpus_nb_quality_classifier",
    "corpus_nb_lm_agreement",
    "agg_quantile_sketch_hist",
    "agg_quantile_sketch_audit",
    "stream_quantile_incremental",
    "corpus_lm_backoff_gate",
    "corpus_lm_gate_overlap",
    # --- oldest-last-checked: the 11 names the r11 additions pushed
    # out of the r11 window (original window order) ---
    "events_user_trend_slope",
    "join_market_basket_pairs",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_priority",
    # --- r5-vintage remainder (registration order, tpch_q13 onward
    # through stream_incremental_rollup; q7/q8 already above) ---
    "tpch_q13_order_count_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_bracket_revenue",
    "tpch_q22_windfall_customers",
    "window_top3_per_segment",
    "window_rank_family",
    "window_lag_lead_price_delta",
    "window_running_spend",
    "window_range_frame_30d",
    "window_first_last_nth",
    "window_forward_fill_ignore_nulls",
    "stream_tumbling_hourly",
    "stream_dedup_user_type",
    "stream_stream_interval_join",
    "stream_sliding_30m_10m",
    "stream_session_30m",
    "stream_static_join_weighted",
    "stream_stateful_max_jump",
    "stream_incremental_rollup",
    # --- r6-vintage streaming re-confirms ---
    "stream_daily_distinct_users",
    "stream_exactly_once_dedup",
    "stream_stream_left_outer_join",
    "stream_topk_types_daily",
    "stream_quarantine_gated_daily",
    # --- next-oldest by last-checked round (r4) ---
    "agg_bitwise",
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
