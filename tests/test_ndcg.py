"""nDCG@k (operators/retrieval.py) + NB calibration
(operators/nb.py) quality properties.

The oracle gates prove the integer DCG arithmetic and the
calibration rollup bit-exactly; these pin what the hash can't.
"""

from __future__ import annotations

import pytest

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def _ndcg_rows(spark, sf):
    from bigdata_project_spark.registry import all_queries

    return all_queries()["retrieval_ndcg_at_k"](spark, sf).collect()


@pytest.mark.parametrize("sf", SFS)
def test_ndcg_bounded_and_rerank_dominates(spark, sf):
    """0 <= nDCG <= 1 everywhere, and the refined residual stack's
    nDCG >= the raw residual ADC's per query: rerank re-sorts a
    SUPERSET shortlist by exact cosine, and a gain-ordered metric
    cannot get worse when the picks are chosen and ordered by true
    relevance."""
    rows = _ndcg_rows(spark, sf)
    assert rows
    by = {(r["system"], r["query_id"]): r["ndcg"] for r in rows}
    assert all(0.0 <= v <= 1.0 for v in by.values()), by
    qids = {q for (_s, q) in by}
    for q in qids:
        assert by[("ivfpq_residual_rerank", q)] >= by[("ivfpq_residual", q)], (
            q,
            by,
        )


def test_ndcg_consistent_with_recall_points(spark, sf_dir):
    """Consistency with the registered recall family: a system/query
    with perfect nDCG recovered all 10 true neighbors (its recall
    row says 10), and a system that missed hits cannot reach 1."""
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    ndcg = {(r["system"], r["query_id"]): r["ndcg"] for r in _ndcg_rows(spark, sf_dir)}
    recall = {
        "pq_adc": {
            r["query_id"]: r["n_hits"]
            for r in qs["sim_recall_pq_at_k"](spark, sf_dir).collect()
        },
        "ivfpq_residual": {
            r["query_id"]: r["n_hits"]
            for r in qs["sim_recall_ivfpq_residual_at_k"](spark, sf_dir).collect()
        },
        "ivfpq_residual_rerank": {
            r["query_id"]: r["n_hits"]
            for r in qs["sim_recall_ivfpq_residual_rerank_at_k"](spark, sf_dir).collect()
        },
    }
    for (sys_, q), v in ndcg.items():
        hits = recall[sys_][q]
        if v == 1.0:
            assert hits == 10, (sys_, q, hits)
        if hits < 10:
            assert v < 1.0, (sys_, q, v)


@pytest.mark.parametrize(
    "sf",
    ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"),
)
def test_nb_calibration_monotone(spark, sf):
    """Empirical positive rate is weakly monotone across the 8-bit
    score bins at all three SFs — the reliability property that makes
    a threshold chosen on this table meaningful. (Measured, not
    assumed: 4-bit bins showed a 1.0 -> 0.972 wobble at sf0.01, which
    is why _CAL_W = 8.)"""
    from bigdata_project_spark.registry import all_queries

    rows = sorted(
        all_queries()["corpus_nb_calibration"](spark, sf).collect(),
        key=lambda r: r["bin"],
    )
    assert rows
    rates = [r["empirical_rate"] for r in rows]
    assert all(a <= b for a, b in zip(rates, rates[1:])), rates
    for r in rows:
        assert 0.0 <= r["implied_posterior"] <= 1.0
        assert r["lo_bits"] == r["bin"] * 8
