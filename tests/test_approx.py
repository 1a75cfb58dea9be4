"""Accuracy bound for the HLL++ sketch queries: a rows-only driver
check would accept a wildly wrong estimate, so the bound is enforced
here against the exact count computed in the same query."""

from __future__ import annotations

from bigdata_project_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_approx_count_distinct_within_rsd_bound(spark, sf_dir):
    rows = REGISTRY["agg_approx_count_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact = r["exact_orders"]
        approx = r["approx_orders"]
        # rsd=0.01 requested; allow 5 sigma plus integer slack for tiny groups
        assert abs(approx - exact) <= max(0.05 * exact, 2), (
            f"HLL estimate {approx} vs exact {exact} out of bound for {r}"
        )
