"""BPE tokenizer induction: greedy-merge semantics, pure-python
replay equality, compositional merges, and token-count coherence."""

from __future__ import annotations

import collections
import re

import duckdb


def _write_docs(spark, tmpdir, texts):
    rows = [(i, t, "lang", f"src{i % 3}", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return tmpdir


def _py_bpe(texts, iters):
    """Reference implementation: Sennrich get_stats + greedy merge."""
    vocab = collections.Counter()
    for t in texts:
        for wd in re.split(r"\s+", t.lower()):
            if wd:
                vocab[wd] += 1
    seqs = {wd: list(wd) for wd in vocab}
    merges = []
    for k in range(iters):
        cnt = collections.Counter()
        for wd, f in vocab.items():
            s = seqs[wd]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt:
            break
        (l, r), c = max(cnt.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        merges.append((k, l, r, l + r, c))
        for wd in vocab:
            s, out, i = seqs[wd], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[wd] = out
    return merges, {wd: len(s) for wd, s in seqs.items()}


def test_bpe_matches_python_reference(spark, tmp_path_factory):
    """Full merge table AND per-doc token counts equal the reference
    implementation on a corpus exercising greedy same-symbol runs
    ('aaaa' + (a,a) -> two merges, never three), compositional
    merges, and ties."""
    from bigdata_project_spark.operators.bpe import _BPE_ITERS
    from bigdata_project_spark.registry import all_queries

    texts = [
        "aaaa aaaa aaaa b",  # run-of-same-symbol greedy case
        "the these them theme",  # shared 'th'/'the' prefixes compose
        "xy xy xy zq zq zq",  # tie between (x,y) and (z,q)
        "u v w",  # single-char words: no pairs contributed
    ]
    d = _write_docs(spark, str(tmp_path_factory.mktemp("bpe")), texts)
    qs = all_queries()
    got = [
        (r["rank"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in sorted(
            qs["vocab_bpe_merges"](spark, d).collect(), key=lambda r: r["rank"]
        )
    ]
    want, final_lens = _py_bpe(texts, _BPE_ITERS)
    assert got == want
    # the greedy case merged twice: (a,a)->aa then (aa,aa)->aaaa
    assert ("a", "a", "aa") in {(l, r, m) for _, l, r, m, _ in got}
    assert final_lens["aaaa"] == 1  # fully merged, not ["aa","a","a"]

    counts = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in qs["vocab_bpe_token_count"](spark, d).collect()
    }
    for doc_id, t in enumerate(texts):
        words = [w for w in t.lower().split() if w]
        assert counts[doc_id] == (
            len(words),
            sum(final_lens[w] for w in words),
        ), doc_id


def test_bpe_oracle_parity_on_crafted_corpus(spark, tmp_path_factory):
    """The DuckDB island-parity derivation of greedy merging agrees
    with the Spark fold on the crafted corpus too (the testbed
    parity is the driver gate; this pins the adversarial shapes)."""
    from bigdata_project_spark.registry import REGISTRY, all_queries

    texts = ["aaaa aaaa aaaa b", "ababab ababab", "the these them"]
    d = _write_docs(spark, str(tmp_path_factory.mktemp("bpeo")), texts)
    got = sorted(
        tuple(r) for r in all_queries()["vocab_bpe_merges"](spark, d).collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
        )
        want = sorted(
            tuple(r) for r in con.sql(REGISTRY["vocab_bpe_merges"].oracle).fetchall()
        )
    finally:
        con.close()
    assert got == want


def test_bpe_merge_table_shape_on_testdata(spark, sf_dir):
    """On the real testbed the table has dense ranks, positive
    counts, and consistent merged symbols. (Compositional >2-char
    merges are corpus-dependent — sf0.01 learns 'm'+'er' at rank 5,
    sf0.001 stays in character pairs for 6 rounds — so composition
    is pinned by the crafted-corpus reference test above, where
    'aa'+'aa' -> 'aaaa' is forced.)"""
    from bigdata_project_spark.operators.bpe import _BPE_ITERS
    from bigdata_project_spark.registry import all_queries

    rows = sorted(
        all_queries()["vocab_bpe_merges"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(_BPE_ITERS))
    assert all(r["pair_count"] > 0 for r in rows)
    assert all(r["merged"] == r["left_sym"] + r["right_sym"] for r in rows)


def test_bpe_token_count_bounds(spark, sf_dir):
    """Tokenizing never inflates below word granularity (every word
    is >= 1 subword) and the merges genuinely compress: the corpus
    BPE token total is strictly below the character total."""
    from pyspark.sql import functions as F

    from bigdata_project_spark.operators.dedup import words_col
    from bigdata_project_spark.registry import all_queries
    from bigdata_project_spark.tables import load

    rows = all_queries()["vocab_bpe_token_count"](spark, sf_dir).collect()
    assert rows
    assert all(r["n_words"] <= r["n_bpe_tokens"] for r in rows)
    n_chars = (
        load(spark, sf_dir, "documents")
        .select(F.explode(words_col(F.col("text"))).alias("w"))
        .agg(F.sum(F.length("w")))
        .collect()[0][0]
    )
    assert sum(r["n_bpe_tokens"] for r in rows) < n_chars


def test_bpe_fertility_rolls_up_token_counts(spark, sf_dir):
    """The per-language fertility table is exactly the roll-up of the
    per-doc billing table joined to doc languages — shared trained
    segmentation, so the two cannot disagree."""
    from bigdata_project_spark.registry import all_queries
    from bigdata_project_spark.tables import load

    qs = all_queries()
    fert = {r["lang"]: r for r in qs["vocab_bpe_fertility_by_lang"](spark, sf_dir).collect()}
    percounts = {
        r["doc_id"]: r for r in qs["vocab_bpe_token_count"](spark, sf_dir).collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    }
    agg = {}
    for doc_id, r in percounts.items():
        lang = langs[doc_id]
        a = agg.setdefault(lang, [0, 0, 0])
        a[0] += 1
        a[1] += r["n_words"]
        a[2] += r["n_bpe_tokens"]
    assert set(agg) == set(fert)
    for lang, (n_docs, n_words, n_bpe) in agg.items():
        f = fert[lang]
        assert (f["n_docs"], f["n_words"], f["n_bpe_tokens"]) == (n_docs, n_words, n_bpe)
        assert f["fertility"] >= 1.0
