"""queries/scale_ext.py: Misra-Gries superset guarantee on synthetic
skewed streams (where the prune actually fires), and plan shapes for
the three scale-pattern queries (no cartesian / no quadratic join
anywhere — the whole point of each rewrite)."""

from __future__ import annotations

import random
import re
from collections import Counter

from tests.test_plans import plan_of


def _mg_run(stream, cap, batch=997):
    """Feed a python stream through mg_merge in batches, like one
    partition's mapInPandas generator would."""
    from bigdata_project_spark.queries.scale_ext import mg_merge

    counts: dict = {}
    for i in range(0, len(stream), batch):
        counts = mg_merge(counts, Counter(stream[i : i + batch]).items(), cap)
    return counts


def test_mg_superset_guarantee_under_prune():
    """Vocabulary (5000) >> capacity (50): the prune fires constantly,
    yet every key with true count > n/cap must survive — the property
    the candidate stage of agg_heavy_hitters_exact stands on. Also
    check the error bound: the summary undercounts any key by at most
    n/(cap+1)."""
    rng = random.Random(20240814)
    cap = 50
    # zipf-ish: a few genuinely heavy keys on a huge light-key tail
    heavy = [f"h{i}" for i in range(8)]
    stream = []
    for i, k in enumerate(heavy):
        stream += [k] * (4000 // (i + 1))
    stream += [f"t{rng.randrange(5000)}" for _ in range(30000)]
    rng.shuffle(stream)

    true = Counter(stream)
    n = len(stream)
    summary = _mg_run(stream, cap)

    assert len(summary) <= cap + 1
    for k, c in true.items():
        if c * cap > n:  # true heavy hitter at threshold n/cap
            assert k in summary, f"heavy key {k} (count {c}, n {n}) pruned"
        if k in summary:
            assert summary[k] <= c  # never overcounts
            assert c - summary[k] <= n // (cap + 1) + 1  # bounded undercount


def test_mg_partition_union_covers_global_heavy_hitters():
    """The averaging argument across partitions: a key above n/cap
    GLOBALLY survives in at least one partition's summary, however
    the stream is split."""
    rng = random.Random(7)
    cap = 20
    stream = ["big"] * 3000 + [f"t{rng.randrange(2000)}" for _ in range(20000)]
    rng.shuffle(stream)
    n = len(stream)
    assert Counter(stream)["big"] * cap > n  # it IS a global heavy hitter

    # adversarial split sizes, not equal halves
    cuts = sorted(rng.randrange(n) for _ in range(7))
    parts = [stream[a:b] for a, b in zip([0] + cuts, cuts + [n])]
    union = set()
    for p in parts:
        union |= set(_mg_run(p, cap))
    assert "big" in union


def test_heavy_hitters_plan_no_wide_shuffle_of_raw_stream(spark, sf_dir):
    """The raw token stream must never be shuffled whole: candidates
    come from a map-side MG pass, and both verification joins are
    broadcasts. The only aggregation of raw tokens is the left-semi-
    filtered exact count (partial agg map-side first)."""
    plan = plan_of(spark, sf_dir, "agg_heavy_hitters_exact")
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # semi join + total join


def test_pareto_frontier_plan_two_stage(spark, sf_dir):
    """No NOT-EXISTS self-join shape: the skyline must be the bucketed
    sweep — windows partitioned by bucket, broadcast joins only, and
    the facts-side window input is the deduped (bucket, price) table
    (a HashAggregate below the Window)."""
    plan = plan_of(spark, sf_dir, "sort_pareto_frontier")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # carry join + facts join
    assert re.search(r"hashpartitioning\(bucket#\d+", plan)


def test_geo_grid_plan_equi_join_not_cross(spark, sf_dir):
    """The radius self-join must be the 9-cell-neighborhood EQUI join
    over exploded offsets — never a cross join + filter."""
    plan = plan_of(spark, sf_dir, "join_geo_grid_radius")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan and "explode(" in plan  # the 3x3 offset fan-out
    # join keys are the shifted integer cell ids
    assert re.search(r"ncy#\d+", plan) and re.search(r"ncx#\d+", plan)


def test_interval_overlap_plan_equi_not_nested_loop(spark, sf_dir):
    """The temporal overlap join must be the slice-binned EQUI join
    (hash-joinable on the slice id, interval predicate as residual) —
    never a BroadcastNestedLoopJoin/cartesian, which is what the raw
    range predicate alone would produce."""
    plan = plan_of(spark, sf_dir, "join_interval_overlap_binned")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the 2x slice fan-out on the views side
    assert "Generate" in plan and "explode(" in plan
    # join keys include the slice id
    assert re.search(r"slice#\d+", plan)


def test_quantized_knn_recall_vs_float(spark, sf_dir):
    """8-bit fixed-point quantization must preserve neighbor quality:
    per-component error < 1/256, so top-5 sets vs float32 brute force
    overlap heavily. Computed fully in-engine (no collect of vectors)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdata_project_spark.registry import REGISTRY
    from bigdata_project_spark.tables import load

    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["sim_knn_quantized_int8"].fn(spark, sf_dir).collect()
    }

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("fdot"), "vec_id")
    exact = {
        (r["query_id"], r["vec_id"])
        for r in emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", dot.alias("fdot"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .collect()
    }
    recall = len(quant & exact) / len(exact)
    assert recall >= 0.8, f"quantized recall@5 {recall}"


def test_simhash_hamming_plan_pigeonhole_equi_join(spark, sf_dir):
    """The hamming-radius search must be the pigeonhole block EQUI
    join (hashpartitioning on block index + block value) — never an
    all-pairs signature comparison."""
    plan = plan_of(spark, sf_dir, "dedup_simhash_hamming_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"hashpartitioning\(b#\d+, bk#\d+", plan) or re.search(
        r"\[b#\d+, bk#\d+\]", plan
    )


def test_weighted_median_plan_two_stage(spark, sf_dir):
    """The weighted median must be the bucketed two-stage form: the
    median-bucket lookup joins back by BROADCAST (never a shuffle
    join), and no cartesian appears. The only full-fact operations
    are map-combined aggregates; the value-level sweep window runs on
    the post-join (single-bucket) aggregate."""
    plan = plan_of(spark, sf_dir, "agg_weighted_median_exact")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_concentration_family_plans(spark, sf_dir):
    """Gini / p80: the two-stage rank plans must join their carry
    tables by BROADCAST (no shuffle join of facts against facts) and
    plan no cartesian; HHI is one aggregate — no Window at all."""
    for name in ("agg_gini_spend_concentration", "events_users_for_p80"):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name
    hhi = plan_of(spark, sf_dir, "agg_hhi_market_concentration")
    assert "Window" not in hhi
    assert "CartesianProduct" not in hhi


def test_binned_band_join_is_equi_not_nested_loop(spark, sf_dir):
    """The bucketized band join must plan a HASH-joinable equi join
    on the bucket id — the whole point vs the broadcast nested loop
    its sibling join_range_price_bands uses for tiny band tables."""
    plan = plan_of(spark, sf_dir, "join_range_price_bands_binned")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert re.search(r"bucket#\d+", plan)
