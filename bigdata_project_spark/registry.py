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
# checks the first 50 registered queries each round. Rounds 1-4
# hash-verified 142 distinct queries (CORRECTNESS_r01-r04.json, r4 =
# 50/50 green). Round 5 front-loads 50 of the 54 oracled queries that
# have never had a driver row: the full TPC-H sweep (tpch_more.py +
# tpch_full.py — round 4's flagship addition, zero driver rows), the
# round-4 events/analytics family (including `events_peak_concurrency`,
# whose plan is now the two-stage sliced sweep), the QA/audit layer,
# the ANN/LSH recall evaluations, the corpus-ext operators, the
# multimodal plan queries, and the session-window / SCD2-diff /
# incremental-rollup stragglers. Deliberately deferred to the round-6
# top-up (the window holds exactly 50): `scalar_string_format`,
# `window_forward_fill_ignore_nulls`, `agg_histogram_fixed`,
# `agg_mode_exact` — all four come from families with the deepest
# existing driver coverage (16 scalar families, the window family, and
# the aggregate family are all green in r3/r4) and are the lowest-risk
# residue. No-oracle queries are excluded — a rows-only row wastes a
# window slot. Queries not named here keep registration order after.
#
# Round-6 rotation queue (added in round 5 AFTER this window was
# pinned, all judge-green at sf0.001/0.01/0.1 but no driver row yet):
# the enrichment family (point-in-time join, attribution last-touch +
# linear-ppm, sliding distinct, edit-distance, TWAP, k-fold, bounce,
# MAD, deciles, WoW, time-to-convert, cohort LTV, DAU/WAU,
# key-uniqueness), the scale-pattern family (heavy hitters, Pareto,
# geo grid, interval overlap, quantized kNN, IVM delta), simhash
# hamming pairs, token-budget fill, skew/Benford/drift audits, Markov
# transitions, collation grouping, exactly-once stream dedup, the
# as-of tolerance/forward variants, keyset pagination, weighted
# median, novelty share, audience overlap, the concentration family
# (Gini, HHI, p80), longest streak, DOW seasonality, session-depth
# histogram, the late-round-5 dedup/timeseries/audit batch
# (prefix-filter similarity join, containment pairs, CUSUM
# changepoint, lag-7 autocorrelation, freshness lag, correlation
# matrix, join-skew forecast, audio chunk plan, nearest as-of join,
# skipping-effectiveness audit, truncated-dim recall, normalized
# dedup, bot rules, left-outer stream join; the HLL sketch-merge
# rollup is rows-only by design and stays out of the window), the
# corpus-quality batch (unigram LM surprisal, duplicate passage
# share, MinHash estimator error, keep-best canonicalization,
# MaxSim late interaction, streaming top-k serving, the composite
# corpus_quality_gate, the winsorized mean, multi-probe LSH + its
# recall eval, the co-purchase lift), plus the four round-5
# deferrals above — ~70 queries, i.e. round 6's full window and most
# of round 7's.
_DRIVER_FIRST: tuple[str, ...] = (
    # TPC-H sweep (§2.3) — never driver-checked
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_priority",
    "tpch_q13_order_count_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_bracket_revenue",
    "tpch_q20_excess_shippers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_windfall_customers",
    # round-4 events / analytics family (§2.4, §2.5) — never driver-checked
    "events_rollup_cascade",
    "events_top_paths",
    "events_anomaly_daily_zscore",
    "events_cumulative_users",
    "events_rfm_segments",
    "events_interarrival_stats",
    "events_burst_detection",
    "events_user_trend_slope",
    "events_peak_concurrency",
    "agg_share_of_total",
    "join_market_basket_pairs",
    # QA / audit layer (§2.10) — never driver-checked
    "qa_referential_integrity",
    "qa_column_profile",
    # ANN / LSH recall evaluations (§2.10) — never driver-checked
    "dedup_lsh_pair_recall",
    "sim_recall_at_k",
    "sim_ann_ivf_nprobe2",
    "sim_recall_ivf2_at_k",
    # graph (§2.10) — never driver-checked
    "graph_triangle_stats",
    # corpus-ext operators (§2.10) — never driver-checked
    "chunk_documents_overlap",
    "vocab_top_terms",
    "sample_quality_weighted",
    "mixture_source_weights",
    "quality_gopher_rules",
    "index_inverted_postings",
    "lake_zorder_key",
    # text / multimodal (§2.10) — never driver-checked
    "text_langid_confusion",
    "multimodal_frame_sample_plan",
    "multimodal_resize_plan",
    # window / lakehouse / streaming stragglers — never driver-checked
    "window_session_numbering",
    "scd2_snapshot_diff",
    "stream_incremental_rollup",
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
