"""Full Gopher rule gate (operators/corpus_ext.py, round 14).

The oracle gate proves every ratio and bit value-exactly; these pin
the gate-composition theorems and non-degeneracy the hash can't.
"""

from __future__ import annotations

import pytest

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")

_OK_BITS = (
    "ok_alpha_words",
    "ok_symbol_word_ratio",
    "ok_ellipsis_lines",
    "ok_stop_kinds",
    "ok_dup_lines",
    "ok_dup_chars",
)


def _rows(spark, sf):
    from bigdata_project_spark.registry import all_queries

    return all_queries()["quality_gopher_full_rules"](spark, sf).collect()


@pytest.mark.parametrize("sf", SFS)
def test_full_keep_is_conjunction(spark, sf):
    """full_keep == base_keep AND every new rule bit, row by row —
    the composition is arithmetic, not approximated."""
    for r in _rows(spark, sf):
        expect = int(r["base_keep"] == 1 and all(r[b] == 1 for b in _OK_BITS))
        assert r["full_keep"] == expect, r


@pytest.mark.parametrize("sf", SFS)
def test_full_gate_tightens_base_not_degenerate(spark, sf):
    """The full gate is a PROPER subset of the base gate on the
    testbed (it must only ever tighten — a theorem of conjunction —
    and measured it actually does), and it is not degenerate: some
    docs survive, some don't."""
    rows = _rows(spark, sf)
    n_base = sum(r["base_keep"] for r in rows)
    n_full = sum(r["full_keep"] for r in rows)
    assert 0 < n_full < n_base, (n_full, n_base)
    assert all(r["base_keep"] == 1 for r in rows if r["full_keep"] == 1)


@pytest.mark.parametrize("sf", SFS)
def test_stop_kinds_bounds_and_ratios(spark, sf):
    """n_stop_kinds within [0, 5] (five stopword kinds exist),
    ok_stop_kinds == (n_stop_kinds >= 2), and every ratio sits in
    its domain."""
    for r in _rows(spark, sf):
        assert 0 <= r["n_stop_kinds"] <= 5
        assert r["ok_stop_kinds"] == int(r["n_stop_kinds"] >= 2)
        assert 0.0 <= r["alpha_word_fraction"] <= 1.0
        assert 0.0 <= r["ellipsis_line_fraction"] <= 1.0
        assert r["hash_ellipsis_per_word"] >= 0.0
