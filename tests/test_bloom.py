"""Bloom prefilter: no false negatives, measured FP rate, and the
scale contract (1-row broadcast probe, big side unshuffled until the
verify join)."""

from __future__ import annotations

import contextlib
import io


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bloom_prefilter_equals_exact_semi(spark, sf_dir):
    """Prefilter + exact verify returns EXACTLY the exact semi join —
    the no-false-negative contract, checked against a plain Spark
    semi join (the driver oracle re-checks vs DuckDB)."""
    from pyspark.sql import functions as F

    from bigdata_project_spark.registry import all_queries
    from bigdata_project_spark.tables import load

    got = {
        r["o_orderkey"]
        for r in all_queries()["join_bloom_prefilter"](spark, sf_dir).collect()
    }
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    keys = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    want = {
        r["o_orderkey"]
        for r in orders.join(
            keys, orders.o_orderkey == keys.l_orderkey, "left_semi"
        ).collect()
    }
    assert got == want and len(got) > 0


def test_bloom_pass_superset_and_audit_coherence(spark, sf_dir):
    """The bloom-pass set is a SUPERSET of the true-match set (no
    false negatives at the filter itself, before the verify join),
    and the audit row's counts reconcile with it exactly."""
    from bigdata_project_spark.operators.bloom import _bloom_candidates
    from bigdata_project_spark.registry import all_queries

    keys, cand = _bloom_candidates(spark, sf_dir)
    rows = cand.select("o_orderkey", "pass").collect()
    passed = {r["o_orderkey"] for r in rows if r["pass"] == 1}
    true_keys = {r["l_orderkey"] for r in keys.collect()}
    true_hits = {r["o_orderkey"] for r in rows} & true_keys
    assert true_hits <= passed  # every true match passes the filter

    audit = all_queries()["join_bloom_fp_audit"](spark, sf_dir).collect()[0]
    assert audit["n_probe"] == len(rows)
    assert audit["n_pass"] == len(passed)
    assert audit["n_true"] == len(true_hits)
    assert audit["n_false_pos"] == len(passed) - len(true_hits)
    assert 0.0 <= audit["fp_rate"] < 1.0


def test_bloom_probe_side_is_broadcast_only(spark, sf_dir):
    """Scale contract: the orders probe is a 1-row
    BroadcastNestedLoopJoin (the whitelisted tiny-build pattern) —
    the filter travels to the data; only pass=1 survivors reach the
    verify join's exchange."""
    from bigdata_project_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    plan = _plan(REGISTRY["join_bloom_prefilter"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
