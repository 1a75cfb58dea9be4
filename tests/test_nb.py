"""Bernoulli Naive-Bayes quality classifier (operators/nb.py)
properties.

The oracle gate proves weights, constants, and decisions bit-exactly
against the SQL replay; these pin what the hash can't:

- the classifier actually separates the classes it was trained on:
  negative-seed recall >= 0.9 and positive-seed recall >= 0.7 at two
  scale factors (measured 0.97-1.0 / 0.81-0.85) — the multinomial
  variant measurably degenerated to keep-everything on this corpus
  (absence-blind; module docstring), so this floor is the evidence
  the Bernoulli choice earns its place;
- predictions are non-degenerate (both keep decisions occur);
- the score decomposition holds row-for-row (nb_bits = present +
  absent + prior; nb_keep = nb_bits > 0) and the absence constant
  is corpus-level (identical on every row);
- the agreement audit covers exactly the LM gate's support (every
  >= 2-token doc appears in one confusion cell).
"""

from __future__ import annotations

import pytest

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


@pytest.mark.parametrize("sf", SFS)
def test_seed_recall_floors(spark, sf):
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["corpus_nb_quality_classifier"](spark, sf).collect()
    pos = [r for r in rows if r["seed_label"] == 1]
    neg = [r for r in rows if r["seed_label"] == 0]
    assert pos and neg, "seed must have both classes"
    neg_recall = sum(1 for r in neg if r["nb_keep"] == 0) / len(neg)
    pos_recall = sum(1 for r in pos if r["nb_keep"] == 1) / len(pos)
    assert neg_recall >= 0.9, neg_recall
    assert pos_recall >= 0.7, pos_recall
    assert {r["nb_keep"] for r in rows} == {0, 1}


def test_score_decomposition_and_constant_absence(spark, sf_dir):
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["corpus_nb_quality_classifier"](spark, sf_dir).collect()
    assert rows
    assert len({r["absent_bits"] for r in rows}) == 1
    assert len({r["prior_bits"] for r in rows}) == 1
    for r in rows:
        assert r["nb_bits"] == r["present_bits"] + r["absent_bits"] + r["prior_bits"]
        assert r["nb_keep"] == int(r["nb_bits"] > 0)


def test_seed_confusion_matches_classifier_rows(spark, sf_dir):
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    rows = qs["corpus_nb_quality_classifier"](spark, sf_dir).collect()
    expect: dict[tuple[int, int], int] = {}
    for r in rows:
        k = (r["nb_keep"], r["seed_label"])
        expect[k] = expect.get(k, 0) + 1
    cells = {
        (r["nb_keep"], r["seed_label"]): r["n_docs"]
        for r in qs["corpus_nb_seed_confusion"](spark, sf_dir).collect()
    }
    assert cells == expect


def test_agreement_covers_lm_support(spark, sf_dir):
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    cells = qs["corpus_nb_lm_agreement"](spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in cells)
    lm_rows = qs["corpus_lm_perplexity_gate"](spark, sf_dir).count()
    assert total == lm_rows
