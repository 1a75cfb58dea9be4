"""Stupid-Backoff LM gate (operators/lm.py round-12 section)
properties.

The oracle gate proves counts, code lengths, and keep bits
bit-exactly against the SQL replay; these pin what the hash can't:

- the TRAIN SPLIT is real: even-doc_id documents (the model's own
  training half) never back off — every one of their bigrams is in
  the pair table by construction — while some held-out documents
  do, so the backoff branch is exercised, not dead code;
- the two smoothers RANK documents consistently: Spearman rank
  correlation between backoff and Laplace bits/bigram >= 0.3 at two
  scale factors (measured ~0.44; they differ by design — pure count
  ratios on a half-corpus model vs add-one on the full corpus — so
  moderate, positive, and stable is the honest expectation);
- both gates keep at most half the corpus (the shared tie-bucket
  contract), and the overlap matrix covers exactly the common
  support.
"""

from __future__ import annotations

import numpy as np
import pytest

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def _gate_rows(spark, sf, name):
    from bigdata_project_spark.registry import all_queries

    return all_queries()[name](spark, sf).collect()


@pytest.mark.parametrize("sf", SFS)
def test_train_split_backoff_structure(spark, sf):
    rows = _gate_rows(spark, sf, "corpus_lm_backoff_gate")
    even = [r for r in rows if r["doc_id"] % 2 == 0]
    odd = [r for r in rows if r["doc_id"] % 2 != 0]
    assert even and odd
    assert all(r["n_backoff"] == 0 for r in even)
    assert any(r["n_backoff"] > 0 for r in odd)


@pytest.mark.parametrize("sf", SFS)
def test_rank_correlation_with_laplace_gate(spark, sf):
    bo = {r["doc_id"]: r["bits_per_bigram"]
          for r in _gate_rows(spark, sf, "corpus_lm_backoff_gate")}
    la = {r["doc_id"]: r["bits_per_bigram"]
          for r in _gate_rows(spark, sf, "corpus_lm_perplexity_gate")}
    common = sorted(set(bo) & set(la))
    assert len(common) == len(bo) == len(la)
    x = np.array([bo[d] for d in common])
    y = np.array([la[d] for d in common])
    rx = np.argsort(np.argsort(x)).astype(float)
    ry = np.argsort(np.argsort(y)).astype(float)
    rho = float(np.corrcoef(rx, ry)[0, 1])
    assert rho >= 0.3, rho


def test_keep_share_and_overlap_coverage(spark, sf_dir):
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    bo = _gate_rows(spark, sf_dir, "corpus_lm_backoff_gate")
    kept = sum(r["keep"] for r in bo)
    assert 2 * kept <= len(bo)
    cells = qs["corpus_lm_gate_overlap"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in cells) == len(bo)
