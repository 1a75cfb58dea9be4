"""Prefix-filter similarity join + containment (operators/dedup_ext.py).

The DuckDB oracle already proves output correctness at each scale
factor; these tests pin the two properties the oracle can't see:
(1) the prefix join generates strictly FEWER candidate pairs than the
    share-a-shingle join — the point of the operator — while losing
    nothing (exactness cross-checked against dedup_ngram_jaccard
    filtered to the same threshold, engine-internally);
(2) containment is asymmetric and hits 1.0 for a doc fully embedded
    in a larger one — the case symmetric Jaccard misses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_project_spark.registry import all_queries


def test_prefix_filter_matches_bruteforce_at_threshold(spark, sf_dir):
    qs = all_queries()
    pf = {
        (r["doc_a"], r["doc_b"], r["n_common"])
        for r in qs["dedup_prefix_filter_jaccard"](spark, sf_dir).collect()
    }
    brute = {
        (r["doc_a"], r["doc_b"], r["n_common"])
        for r in qs["dedup_ngram_jaccard"](spark, sf_dir)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert pf == brute  # prefix filtering is lossless AND adds nothing


def test_prefix_join_generates_fewer_candidates(spark, sf_dir):
    """The prefix equi-join must touch fewer candidate pairs than the
    full share-a-shingle join — measured on the real corpus, not the
    plan. (Equal would mean the prefix computation is pure overhead.)"""
    from bigdata_project_spark.operators.dedup import shingle_df_capped
    from pyspark.sql.window import Window

    sh = shingle_df_capped(spark, sf_dir)
    df_tbl = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = sh.join(df_tbl, "shingle").select(
        "doc_id",
        "shingle",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "shingle")).alias("r"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n_sh"),
    )
    prefix = ranked.filter(F.col("r") <= F.col("n_sh") - F.expr("(n_sh + 1) div 2") + 1)

    def n_pairs(t):
        a, b = t.alias("a"), t.alias("b")
        return (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )

    full, pref = n_pairs(sh), n_pairs(prefix)
    assert pref < full, (pref, full)


@pytest.fixture(scope="module")
def containment_dir(spark, tmp_path_factory):
    body = " ".join(f"w{i}" for i in range(20))
    docs = [
        (1, body),  # fully contained in 2
        (2, body + " " + " ".join(f"x{i}" for i in range(40))),
        (3, "totally different words " + " ".join(f"z{i}" for i in range(30))),
    ]
    d = tmp_path_factory.mktemp("containment")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_containment_is_directional(spark, containment_dir):
    rows = all_queries()["dedup_containment_pairs"](spark, containment_dir).collect()
    got = {(r["contained_doc"], r["container_doc"]): r["containment"] for r in rows}
    assert got[(1, 2)] == 1.0  # every shingle of 1 appears in 2
    assert (2, 1) not in got  # 2 is NOT 80% contained in 1
    assert not any(3 in k for k in got)


# ---------------------------- property-based losslessness (hypothesis)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_settings = settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))

# tiny vocabulary + doc lengths straddling the 5-gram boundary force
# heavy shingle overlap, df ties (stress for the rarity total order),
# empty shingle sets, and exact duplicates
_doc = st.lists(st.sampled_from("red blue fish cat dog".split()), min_size=0, max_size=14).map(
    " ".join
)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _write_docs(spark, tmpdir, texts):
    rows = [(i, t, "lang", f"src{i % 3}", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return tmpdir


def _shingles(text: str, n: int = 5) -> set:
    words = [w for w in text.split() if w]
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


@given(texts=_corpus)
@_settings
def test_prefix_filter_lossless_on_random_corpora(spark, tmp_path_factory, texts):
    """Prefix filtering must emit EXACTLY the J >= 1/2 pairs on any
    corpus — the AllPairs prefix-length bound proved by brute force
    over adversarial inputs (df ties, sub-5-gram docs, exact dups),
    beyond the three fixed-testdata oracle corpora."""
    from bigdata_project_spark.registry import all_queries

    d = _write_docs(spark, str(tmp_path_factory.mktemp("pf")), texts)
    got = {
        (r["doc_a"], r["doc_b"], r["n_common"])
        for r in all_queries()["dedup_prefix_filter_jaccard"](spark, d).collect()
    }
    sh = {i: _shingles(t) for i, t in enumerate(texts)}
    want = set()
    for i in sh:
        for j in sh:
            if i < j and (sh[i] or sh[j]):
                inter = len(sh[i] & sh[j])
                union = len(sh[i] | sh[j])
                if union and 2 * inter >= union:
                    want.add((i, j, inter))
    assert got == want


@given(texts=_corpus)
@_settings
def test_containment_matches_bruteforce_on_random_corpora(spark, tmp_path_factory, texts):
    from bigdata_project_spark.registry import all_queries

    d = _write_docs(spark, str(tmp_path_factory.mktemp("ct")), texts)
    got = {
        (r["contained_doc"], r["container_doc"], r["n_common"])
        for r in all_queries()["dedup_containment_pairs"](spark, d).collect()
    }
    sh = {i: _shingles(t) for i, t in enumerate(texts)}
    want = set()
    for i in sh:
        for j in sh:
            if i != j and sh[i]:
                inter = len(sh[i] & sh[j])
                if inter and 5 * inter >= 4 * len(sh[i]):
                    want.add((i, j, inter))
    assert got == want


def test_selfrepeat_spans_semantics(spark, tmp_path_factory):
    """dedup_selfrepeat_substring_spans (round 9): a >= K-token run
    repeated twice NON-OVERLAPPING within one document is flagged
    (both copies), a periodic run shorter than 2K (overlapping
    self-matches only — one physical region) is NOT, cross-doc
    repeats still are, and the full output matches the DuckDB oracle
    on the constructed corpus."""
    import duckdb

    from bigdata_project_spark.registry import REGISTRY, all_queries

    K = 20
    uniq = iter(f"u{i}" for i in range(10_000))

    def filler(n):
        return [next(uniq) for _ in range(n)]

    run = [f"r{i}" for i in range(K)]
    shared = [f"s{i}" for i in range(K)]
    texts = [
        # doc 0: self-repeat, two copies K tokens apart -> 2 spans, 2K dup tokens
        " ".join(filler(30) + run + filler(25) + run + filler(10)),
        # doc 1: 30-token periodic run -> window spread 10 < K, no second copy
        " ".join(["rep"] * 30),
        # doc 2: 45-token periodic run -> spread 25 >= K, fully covered
        " ".join(["per"] * 45),
        # docs 3,4: cross-doc repeat (parity with the cross-doc operator)
        " ".join(filler(22) + shared + filler(21)),
        " ".join(filler(25) + shared + filler(30)),
        # doc 5: no repeats
        " ".join(filler(40)),
    ]
    d = _write_docs(spark, str(tmp_path_factory.mktemp("selfrep")), texts)
    rows = {
        r["doc_id"]: r
        for r in all_queries()["dedup_selfrepeat_substring_spans"](spark, d).collect()
    }
    assert rows[0]["n_spans"] == 2 and rows[0]["n_dup_tokens"] == 2 * K
    assert rows[0]["n_tokens"] == 105
    assert rows[1]["n_dup_tokens"] == 0
    assert rows[2]["n_dup_tokens"] == 45 and rows[2]["dup_token_share"] == 1.0
    assert rows[3]["n_dup_tokens"] == K and rows[4]["n_dup_tokens"] == K
    assert rows[5]["n_dup_tokens"] == 0

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
        )
        want = {
            r[0]: r
            for r in con.sql(
                REGISTRY["dedup_selfrepeat_substring_spans"].oracle
            ).fetchall()
        }
    finally:
        con.close()
    for doc_id, r in rows.items():
        assert (
            r["n_tokens"],
            r["n_spans"],
            r["n_dup_tokens"],
            r["dup_token_share"],
        ) == tuple(want[doc_id][1:]), doc_id


def test_selfrepeat_rewrite_semantics(spark, tmp_path_factory):
    """dedup_selfrepeat_rewrite: a doc's own duplicated run is cut
    (both copies — consistent with the cross-doc rewrite's cut-every-
    detected-run contract), a sub-2K periodic run is untouched, and
    the whole output matches the DuckDB oracle, with removal counts
    agreeing with the detect side."""
    import duckdb

    from bigdata_project_spark.registry import REGISTRY, all_queries

    K = 20
    uniq = iter(f"w{i}" for i in range(10_000))

    def filler(n):
        return [next(uniq) for _ in range(n)]

    run = [f"q{i}" for i in range(K)]
    texts = [
        " ".join(filler(10) + run + filler(25) + run + filler(5)),  # self-repeat
        " ".join(["loop"] * 30),  # sub-2K periodic: untouched
        " ".join(filler(30)),  # clean
    ]
    d = _write_docs(spark, str(tmp_path_factory.mktemp("selfrw")), texts)
    qs = all_queries()
    rw = {r["doc_id"]: r for r in qs["dedup_selfrepeat_rewrite"](spark, d).collect()}
    det = {
        r["doc_id"]: r
        for r in qs["dedup_selfrepeat_substring_spans"](spark, d).collect()
    }
    assert rw[0]["n_removed"] == 2 * K == det[0]["n_dup_tokens"]
    assert "q0" not in rw[0]["text_clean"]
    assert rw[0]["n_tokens"] == 80 and len(rw[0]["text_clean"].split()) == 40
    assert rw[1]["n_removed"] == 0 and rw[1]["text_clean"] == " ".join(["loop"] * 30)
    assert rw[2]["n_removed"] == 0
    # detect/remove coherence holds corpus-wide on the twin
    for doc_id in rw:
        assert rw[doc_id]["n_removed"] == det[doc_id]["n_dup_tokens"], doc_id

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
        )
        want = {
            r[0]: r
            for r in con.sql(REGISTRY["dedup_selfrepeat_rewrite"].oracle).fetchall()
        }
    finally:
        con.close()
    for doc_id, r in rw.items():
        assert (r["n_tokens"], r["n_removed"], r["text_clean"]) == tuple(
            want[doc_id][1:]
        ), doc_id
