"""Matryoshka dimension-budget recall curve (operators/matryoshka.py).

The oracle gate proves the per-dim rankings and recall joins
bit-exactly; these pin the curve-shape properties the hash can't.
"""

from __future__ import annotations

import pytest

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def _rows(spark, sf):
    from bigdata_project_spark.registry import all_queries

    return all_queries()["sim_recall_dim_curve"](spark, sf).collect()


@pytest.mark.parametrize("sf", SFS)
def test_dim64_is_exact_self_check(spark, sf):
    """The 64-dim row reproduces the truth metric itself: recall is
    exactly 1.0 and n_hits exactly 10 for every query — a theorem of
    the construction (same chain, same tiebreak), not an empirical
    observation."""
    rows = _rows(spark, sf)
    d64 = [r for r in rows if r["dim"] == 64]
    assert len(d64) == 3
    assert all(r["n_hits"] == 10 and r["recall"] == 1.0 for r in d64), d64


@pytest.mark.parametrize("sf", SFS)
def test_dim_curve_aggregate_monotone(spark, sf):
    """Summed over the query set, recall is weakly monotone in the
    dimension budget. Per-query monotonicity is NOT a theorem for
    embeddings that were not Matryoshka-trained (the testbed vectors
    are synthetic, and a 16-dim prefix can luck into a true neighbor
    the 32-dim prefix re-ranks out — observed at sf0.001), so the
    pin is the aggregate curve a pipeline actually reads."""
    rows = _rows(spark, sf)
    total = {d: 0 for d in (16, 32, 64)}
    for r in rows:
        total[r["dim"]] += r["n_hits"]
    assert total[16] <= total[32] <= total[64] == 30, total


@pytest.mark.parametrize("sf", SFS)
def test_dim_curve_shape(spark, sf):
    """3 dims x 3 queries, hits within [0, 10], recall = hits/10."""
    rows = _rows(spark, sf)
    assert len(rows) == 9
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert r["recall"] == r["n_hits"] / 10.0
