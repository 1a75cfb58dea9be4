"""Property-based invariants for the corpus-preparation operators
(operators/corpus.py) on arbitrary generated corpora — structural
truths the DuckDB oracle gate can't probe beyond the fixed testdata.
"""

from __future__ import annotations

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_settings = settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))

# corpora of small docs over a tiny vocabulary (forces repeats/dups)
_doc = st.lists(st.sampled_from("red blue fish cat dog".split()), min_size=0, max_size=30).map(
    " ".join
)
corpus_strategy = st.lists(_doc, min_size=1, max_size=25)


def _write_docs(spark, tmpdir, texts):
    rows = [(i, t, "lang", f"src{i % 3}", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return tmpdir


@given(texts=corpus_strategy)
@_settings
def test_packing_invariants(spark, tmp_path_factory, texts):
    from bigdata_project_spark.operators.corpus import _CTX_TOKENS, pack_sequences_by_source

    d = _write_docs(spark, str(tmp_path_factory.mktemp("pk")), texts)
    rows = pack_sequences_by_source(spark, d).collect()
    assert len(rows) == len(texts)
    by_source: dict[str, list] = collections.defaultdict(list)
    for r in rows:
        by_source[r["source"]].append(r)
    for docs in by_source.values():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in docs:
            # pack ids re-derivable from the running count, monotone
            assert r["pack_id"] == cum // _CTX_TOKENS
            straddle = int(
                r["n_tokens"] > 0
                and cum // _CTX_TOKENS != (cum + r["n_tokens"] - 1) // _CTX_TOKENS
            )
            assert r["straddles"] == straddle
            cum += r["n_tokens"]


@given(texts=corpus_strategy)
@_settings
def test_repetition_filter_matches_bruteforce(spark, tmp_path_factory, texts):
    from bigdata_project_spark.operators.corpus import quality_repetition_filter

    d = _write_docs(spark, str(tmp_path_factory.mktemp("rep")), texts)
    got = {r["doc_id"]: r for r in quality_repetition_filter(spark, d).collect()}
    for i, t in enumerate(texts):
        words = [w for w in t.lower().split() if w]
        grams = [" ".join(words[j : j + 2]) for j in range(len(words) - 1)]
        if not grams:
            assert i not in got  # <2 tokens -> excluded
            continue
        freq = collections.Counter(grams)
        assert got[i]["n_grams2"] == len(grams)
        assert got[i]["max_gram_freq"] == max(freq.values())


@given(texts=corpus_strategy)
@_settings
def test_incremental_merge_partitions_batch(spark, tmp_path_factory, texts):
    from bigdata_project_spark.operators.corpus import _BATCH_MOD, dedup_incremental_merge

    d = _write_docs(spark, str(tmp_path_factory.mktemp("inc")), texts)
    rows = {r["doc_id"]: r for r in dedup_incremental_merge(spark, d).collect()}
    batch_ids = [i for i in range(len(texts)) if i % _BATCH_MOD == _BATCH_MOD - 1]
    assert set(rows) == set(batch_ids)
    corpus_text = {i: t for i, t in enumerate(texts) if i % _BATCH_MOD != _BATCH_MOD - 1}
    for i in batch_ids:
        r = rows[i]
        corpus_dups = [j for j, t in corpus_text.items() if t == texts[i]]
        batch_dups = [j for j in batch_ids if j < i and texts[j] == texts[i]]
        if corpus_dups:  # the existing-corpus keeper wins over a batch sibling
            assert r["is_new_unique"] == 0
            assert r["dup_of"] == min(corpus_dups)
        elif batch_dups:
            assert r["is_new_unique"] == 0
            assert r["dup_of"] == min(batch_dups)
        else:
            assert r["is_new_unique"] == 1
            assert r["dup_of"] is None
