"""Isotonic (PAV) calibration + calibrated gate (operators/nb.py,
round 14).

The oracle gates prove the minimax fit and the gate join
value-exactly; these pin the PAV theorems and the measured pooling
behavior the hash can't.
"""

from __future__ import annotations

import pytest

SFS3 = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


def _iso(spark, sf):
    from bigdata_project_spark.registry import all_queries

    return (
        all_queries()["corpus_nb_isotonic_calibration"](spark, sf)
        .orderBy("bin")
        .collect()
    )


@pytest.mark.parametrize("sf", SFS3)
def test_iso_monotone_by_construction(spark, sf):
    """iso_rate is weakly increasing across bins at every SF — a
    THEOREM of the minimax form (larger i widens the max's index set
    and narrows the min's), so a violation here means the fit is
    implemented wrong, not that the data moved."""
    rows = _iso(spark, sf)
    rates = [r["iso_rate"] for r in rows]
    assert all(a <= b for a, b in zip(rates, rates[1:])), rates
    assert all(0.0 <= v <= 1.0 for v in rates)


@pytest.mark.parametrize("sf", SFS3)
def test_iso_preserves_total(spark, sf):
    """PAV preserves the weighted total: sum(n_docs * iso_rate) ==
    sum(n_seed_pos) (each pooled block's fitted value is the block's
    pooled mean). Doubles, so compared to 1e-6 absolute."""
    rows = _iso(spark, sf)
    fitted = sum(r["n_docs"] * r["iso_rate"] for r in rows)
    truth = sum(r["n_seed_pos"] for r in rows)
    assert abs(fitted - truth) < 1e-6, (fitted, truth)


def test_pooling_exercised_at_sf001(spark):
    """At sf0.01 the 4-bit table has the wobble r13 measured
    (empirical 1.0 then 0.972 across adjacent bins); the fit must
    POOL there — at least one bin's iso_rate differs from its
    empirical rate. Guards against a vacuous identity fit."""
    rows = _iso(spark, "/root/testdata/sf0.01")
    pooled = [r for r in rows if abs(r["iso_rate"] - r["empirical_rate"]) > 1e-12]
    assert pooled, [(r["bin"], r["empirical_rate"]) for r in rows]
    # and pooling never moves a bin past its neighbors' envelope
    lo = min(r["empirical_rate"] for r in rows)
    hi = max(r["empirical_rate"] for r in rows)
    assert all(lo <= r["iso_rate"] <= hi for r in rows)


@pytest.mark.parametrize("sf", SFS3[:2])
def test_calibrated_gate_consistency(spark, sf):
    """cal_keep == (calibrated_p >= 0.5) row by row; all docs in one
    bin share one verdict; support equals the classifier's support;
    and the measured under-confidence flip exists (the NB's raw
    log-odds gate drops docs whose bins are empirically >= 50%
    positive — the calibrated gate keeps them)."""
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    rows = qs["corpus_nb_calibrated_gate"](spark, sf).collect()
    nb_rows = qs["corpus_nb_quality_classifier"](spark, sf).count()
    assert len(rows) == nb_rows
    by_bin = {}
    flips = 0
    for r in rows:
        assert r["cal_keep"] == int(r["calibrated_p"] >= 0.5), r
        by_bin.setdefault(r["bin"], set()).add(
            (r["cal_keep"], round(r["calibrated_p"], 12))
        )
        if r["nb_keep"] == 0 and r["cal_keep"] == 1:
            flips += 1
    assert all(len(v) == 1 for v in by_bin.values()), by_bin
    assert flips > 0, "under-confidence flip disappeared from the testbed"
