from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from bigdata_project_spark.session import get_spark

    s = get_spark("tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


# Slow tier (r15, see pytest.ini): named heavyweight tests — the
# statistical/e2e/bruteforce-comparison suites that individually run
# 8-15 s. They stay REQUIRED in the close-of-round full run (-m "");
# the default gate tier skips them so the driver-side timed run
# finishes inside its budget (the r14 default tier took 36 min and
# was truncated by the driver at ~37%).
_SLOW_TESTS = {
    "test_auto_converges_on_chain",
    "test_multiset_setop_complementarity",
    "test_unigram_beats_bpe_fertility",
    "test_bpe_fertility_rolls_up_token_counts",
    "test_cal_ensemble_votes_and_rebase_directions",
    "test_rollup_margins_consistent",
    "test_ndcg_consistent_with_recall_points",
    "test_stream_cms_equals_batch",
    "test_prefix_filter_lossless_on_random_corpora",
    "test_cusum_matches_python_bruteforce",
    "test_containment_matches_bruteforce_on_random_corpora",
    "test_dedup_idempotent_and_minimal",
    "test_token_count_bounds",
    "test_beam_output_shape",
    "test_residual_rerank_dominates_adc_and_hits_cell_ceiling",
    "test_build_gold_roundtrip",
    "test_semdedup_drop_rate_stays_bounded_across_scales",
    "test_incremental_merge_partitions_batch",
    "test_repetition_filter_matches_bruteforce",
    "test_stream_neardup_matches_batch_and_consumed_all_chunks",
    "test_trained_stack_recall_ge_label_stack",
    "test_consumers_stay_green_through_star_fallback",
    # full-registry sweeps hiding outside test_queries_oracle (the two
    # dominate the gate tier: 515 s and 260 s of its 25 min)
    "test_full_registry_oracle_matches_under_narrow_partitioning",
    "test_no_cartesian_product_anywhere",
    # 11-35 s statistical/bruteforce/stream-machinery tests
    "test_star_equals_minlabel_equals_bruteforce",
    "test_derived_planes_hold_bucket_load_on_4x_corpus",
    "test_recall_measured_floors",
    "test_chain_component_star_converges_where_minlabel_refuses",
    "test_bpe_matches_python_reference",
    "test_gain_and_offset_variants_hash_identically",
    "test_stream_stream_interval_join_matches_batch",
    "test_state_store_introspection",
    "test_result_invariant_under_shuffle_partition_count",
    "test_beam_max_cosine_dominates_entries",
}


def pytest_collection_modifyitems(config, items):
    """Auto-mark the slow tier: sf0.01-parametrized twins (same logic
    as their sf0.001 twin, 5-10x the runtime) and the named
    heavyweight tests above."""
    for item in items:
        base = item.nodeid.split("::")[-1].split("[")[0]
        if "sf0.01" in item.nodeid or base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
