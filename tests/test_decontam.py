"""contamination_decontam_rewrite: span excision pinned to the screen.

The rewrite must (a) cut exactly the benchmark-overlapping spans —
any offset, any case, overlapping windows merged — and (b) agree
with `contamination_ngram_overlap` on WHICH docs are contaminated
(the detect/remove coherence discipline of the selfrepeat pair).
"""

from __future__ import annotations

import duckdb


def _write_docs(spark, tmpdir, docs):
    """docs: list of (doc_id, text) — explicit ids so the % 50 bench
    split is controllable."""
    rows = [(i, t, "lang", f"src{i % 3}", len(t)) for i, t in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return tmpdir


def test_decontam_rewrite_semantics(spark, tmp_path_factory):
    """Planted corpus: an embedded benchmark 5-gram (case-varied) is
    excised exactly; a 7-token benchmark run merges its 3 overlapping
    windows into ONE 7-token cut; clean and sub-5-token docs pass
    through; the whole output matches the DuckDB oracle; and the
    contaminated-doc set equals the screen's."""
    from bigdata_project_spark.registry import REGISTRY, all_queries

    uniq = iter(f"w{i}" for i in range(10_000))

    def filler(n):
        return [next(uniq) for _ in range(n)]

    bench_a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    bench_b = "kilo lima mike november oscar papa quebec romeo sierra tango"
    # doc 1 embeds bench_a's first 5-gram UPPERCASED (matching is
    # case-insensitive, output preserves original case)
    planted5 = "ALPHA BRAVO CHARLIE DELTA ECHO"
    # doc 2 embeds a 7-token run from bench_b: 3 overlapping windows
    # that must merge into one 7-token island
    planted7 = "kilo lima mike november oscar papa quebec"
    docs = [
        (0, bench_a),  # bench (doc_id % 50 == 0)
        (50, bench_b),  # bench
        (1, " ".join(filler(10) + planted5.split() + filler(10))),
        (2, " ".join(filler(4) + planted7.split() + filler(6))),
        (3, " ".join(filler(30))),  # clean
        (4, "tiny doc here"),  # < 5 tokens: no windows at all
    ]
    d = _write_docs(spark, str(tmp_path_factory.mktemp("decontam")), docs)
    qs = all_queries()
    rw = {
        r["doc_id"]: r
        for r in qs["contamination_decontam_rewrite"](spark, d).collect()
    }
    assert set(rw) == {1, 2, 3, 4}  # bench docs are not rewritten
    assert rw[1]["n_removed"] == 5
    assert "ALPHA" not in rw[1]["text_clean"]
    assert rw[1]["text_clean"] == " ".join(
        docs[2][1].split()[:10] + docs[2][1].split()[15:]
    )
    assert rw[2]["n_removed"] == 7  # merged island, not 3 x 5 fragments
    assert "kilo" not in rw[2]["text_clean"]
    assert rw[3]["n_removed"] == 0 and rw[3]["text_clean"] == docs[4][1]
    assert rw[4]["n_removed"] == 0 and rw[4]["text_clean"] == docs[5][1]

    # detect/remove coherence: contaminated iff the screen says so
    det = {
        r["doc_id"]: r["n_contaminated"]
        for r in qs["contamination_ngram_overlap"](spark, d).collect()
    }
    for doc_id, r in rw.items():
        assert (r["n_removed"] > 0) == (det.get(doc_id, 0) > 0), doc_id

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
        )
        want = {
            r[0]: r
            for r in con.sql(
                REGISTRY["contamination_decontam_rewrite"].oracle
            ).fetchall()
        }
    finally:
        con.close()
    assert set(want) == set(rw)
    for doc_id, r in rw.items():
        assert (r["n_tokens"], r["n_removed"], r["text_clean"]) == tuple(
            want[doc_id][1:]
        ), doc_id


def test_decontam_screen_equivalence_on_testdata(spark, sf_dir):
    """On the real testbed the set of docs the rewrite touches equals
    the set the screen flags (n_contaminated > 0) — the df cap and
    bench split are shared, so neither side can see evidence the
    other misses."""
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    removed = {
        r["doc_id"]
        for r in qs["contamination_decontam_rewrite"](spark, sf_dir).collect()
        if r["n_removed"] > 0
    }
    flagged = {
        r["doc_id"]
        for r in qs["contamination_ngram_overlap"](spark, sf_dir).collect()
        if r["n_contaminated"] > 0
    }
    assert removed == flagged
