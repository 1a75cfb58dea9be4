"""Quality ensemble gate (operators/nb.py) + duplicate-line signals
(operators/corpus.py) quality properties — the oracle gates prove
the values; these pin the structural claims.
"""

from __future__ import annotations

import pytest

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


@pytest.mark.parametrize("sf", SFS)
def test_ensemble_between_intersection_and_union(spark, sf):
    """2-of-3 voting keeps everything all three keep and nothing all
    three reject — the ensemble's keep set sits between the
    components' intersection and union; votes match the components
    cell for cell."""
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["corpus_quality_ensemble_gate"](spark, sf).collect()
    assert rows
    for r in rows:
        votes = r["gopher_keep"] + r["nb_keep"] + r["lm_keep"]
        assert r["n_votes"] == votes
        assert r["ensemble_keep"] == int(votes >= 2)
        if votes == 3:
            assert r["ensemble_keep"] == 1
        if votes == 0:
            assert r["ensemble_keep"] == 0


def test_ensemble_disagrees_with_some_component(spark, sf_dir):
    """The ensemble is not a relabeling of any single component: at
    test scale there exist docs where the ensemble verdict differs
    from at least one component's (otherwise the vote adds nothing)."""
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["corpus_quality_ensemble_gate"](spark, sf_dir).collect()
    for comp in ("gopher_keep", "nb_keep", "lm_keep"):
        assert any(r["ensemble_keep"] != r[comp] for r in rows), comp


def test_dupline_signals_match_seeded_structure(spark, sf_dir):
    """Exactly the %5-seeded docs carry the duplicated line pair;
    every fraction is a valid proportion; line counts reflect the
    seeding arithmetic."""
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["quality_dupline_signals"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        d = r["doc_id"]
        expected_lines = 1 + (d % 3 == 0) + 2 * (d % 5 == 0)
        assert r["n_lines"] == expected_lines, (d, r)
        if d % 5 == 0:
            assert r["n_dup_lines"] == 2, (d, r)
        else:
            assert r["n_dup_lines"] == 0, (d, r)
        assert 0.0 <= r["dup_line_fraction"] <= 1.0
        assert 0.0 <= r["dup_char_fraction"] <= 1.0


def test_cal_ensemble_votes_and_rebase_directions(spark, sf_dir):
    """The r14 calibrated ensemble: vote arithmetic exact per row,
    keep set between component intersection and union (2-of-3
    theorem), and the two re-bases pull opposite directions as
    measured — the calibrated NB keeps >= the raw NB's keep count
    (under-confidence flip) while full Gopher keeps <= the base
    rules' count — with the composed verdict actually differing from
    the base ensemble somewhere."""
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    cal_rows = qs["corpus_quality_ensemble_cal_gate"](spark, sf_dir).collect()
    assert cal_rows
    for r in cal_rows:
        votes = r["gopher_full_keep"] + r["cal_keep"] + r["lm_keep"]
        assert r["n_votes"] == votes
        assert r["ensemble_keep"] == int(votes >= 2)
        if r["gopher_full_keep"] and r["cal_keep"] and r["lm_keep"]:
            assert r["ensemble_keep"] == 1
        if not (r["gopher_full_keep"] or r["cal_keep"] or r["lm_keep"]):
            assert r["ensemble_keep"] == 0
    base_rows = qs["corpus_quality_ensemble_gate"](spark, sf_dir).collect()
    base = {r["doc_id"]: r for r in base_rows}
    n_cal_nb = sum(r["cal_keep"] for r in cal_rows)
    n_raw_nb = sum(r["nb_keep"] for r in base_rows)
    n_full_g = sum(r["gopher_full_keep"] for r in cal_rows)
    n_base_g = sum(r["gopher_keep"] for r in base_rows)
    assert n_cal_nb >= n_raw_nb, (n_cal_nb, n_raw_nb)
    assert n_full_g <= n_base_g, (n_full_g, n_base_g)
    diffs = [
        r["doc_id"]
        for r in cal_rows
        if r["doc_id"] in base
        and r["ensemble_keep"] != base[r["doc_id"]]["ensemble_keep"]
    ]
    assert diffs, "re-based ensemble never differs from the base one"
