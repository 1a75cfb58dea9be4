"""Bigram LM perplexity gate (operators/lm.py) properties.

The oracle gate proves the scores bit-exactly against the SQL
replay; these pin what the hash can't:

- the gate keeps at most half the scored corpus and never zero;
- the signal actually sees word ORDER (the thing unigram surprisal
  can't): on a handcrafted corpus, a document whose bigrams repeat
  scores strictly fewer bits/bigram than one over the same token
  multiset with all-distinct bigrams;
- documents with fewer than two tokens carry no bigram evidence and
  are absent (the text_unigram_surprisal contract).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def test_keep_share_at_most_half_and_nonzero(spark, sf_dir):
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["corpus_lm_perplexity_gate"](spark, sf_dir).collect()
    assert rows
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept * 2 <= len(rows), (kept, len(rows))
    # every doc's le_count/n_all is consistent with its keep bit
    for r in rows:
        assert r["keep"] == int(2 * r["le_count"] <= r["n_all"]), dict(r.asDict())


def _tiny_corpus(tmp_path, docs):
    d = tmp_path / "tiny"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(docs))),
                "source": ["src0"] * len(docs),
                "lang": ["en"] * len(docs),
                "text": docs,
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_bigram_model_rewards_repeated_structure(spark, tmp_path):
    """Same token multiset, different order: 'a b a b a b a b' has
    one dominant bigram (a->b, b->a) while 'a a a a b b b b' spends
    most transitions on once-seen pairs — the repeated-structure doc
    must score strictly fewer bits/bigram. A unigram model scores
    both identically, so this pins the bigram-ness of the signal."""
    from bigdata_project_spark.registry import REGISTRY

    sf = _tiny_corpus(
        tmp_path, ["a b a b a b a b", "a a a a b b b b", "c d e f g h i j"]
    )
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["corpus_lm_perplexity_gate"].fn(spark, sf).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert rows[0]["bits_per_bigram"] < rows[1]["bits_per_bigram"], (
        rows[0]["bits_per_bigram"],
        rows[1]["bits_per_bigram"],
    )
    # the all-distinct-bigram doc is the most surprising of the three
    assert rows[2]["bits_per_bigram"] >= rows[1]["bits_per_bigram"]


def test_short_docs_have_no_bigram_evidence(spark, tmp_path):
    from bigdata_project_spark.registry import REGISTRY

    sf = _tiny_corpus(tmp_path, ["solo", "", "  ", "two tokens here"])
    rows = REGISTRY["corpus_lm_perplexity_gate"].fn(spark, sf).collect()
    assert {r["doc_id"] for r in rows} == {3}


def test_perplexity_buckets_coherent_with_gate(spark, sf_dir):
    """CCNet terciles: every doc gets exactly one bucket, each pool
    holds at most a third of docs (up to score-tie granularity:
    boundary value-buckets land whole), head docs are always
    keep=1 under the median gate and tail docs always keep=0 —
    the two queries share one estimator by construction."""
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    buckets = {
        r["doc_id"]: r["bucket"]
        for r in qs["corpus_lm_perplexity_buckets"](spark, sf_dir).collect()
    }
    keeps = {
        r["doc_id"]: r["keep"]
        for r in qs["corpus_lm_perplexity_gate"](spark, sf_dir).collect()
    }
    assert set(buckets) == set(keeps) and buckets
    n = len(buckets)
    counts = {b: sum(1 for v in buckets.values() if v == b) for b in ("head", "middle", "tail")}
    assert sum(counts.values()) == n
    assert counts["head"] <= n // 3
    assert counts["head"] + counts["middle"] <= 2 * n // 3
    for doc_id, b in buckets.items():
        if b == "head":
            assert keeps[doc_id] == 1, doc_id
        if b == "tail":
            assert keeps[doc_id] == 0, doc_id
