"""corpus_source_kl_audit: the code-length KL reads zero for a
source that matches the blend and large for a disjoint one."""

from __future__ import annotations


def _write_docs(spark, tmpdir, texts):
    rows = [(i, t, "lang", f"src{i % 3}", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return tmpdir


def test_kl_separates_shifted_source(spark, tmp_path_factory):
    """src0 and src1 carry IDENTICAL text (same distribution, same
    KL by symmetry); src2 is vocabulary-disjoint. The audit must
    score src2 strictly above the twins, and the twins equal."""
    from bigdata_project_spark.registry import all_queries

    shared = "alpha beta gamma delta alpha beta gamma delta"
    alien = "zork zork quux quux zork blarg blarg blarg"
    # doc_id % 3 picks the source: 0->src0, 1->src1, 2->src2
    texts = [shared, shared, alien] * 4
    d = _write_docs(spark, str(tmp_path_factory.mktemp("kl")), texts)
    rows = {
        r["source"]: r
        for r in all_queries()["corpus_source_kl_audit"](spark, d).collect()
    }
    assert set(rows) == {"src0", "src1", "src2"}
    assert rows["src0"]["kl_bits_per_token"] == rows["src1"]["kl_bits_per_token"]
    assert (
        rows["src2"]["kl_bits_per_token"] > rows["src0"]["kl_bits_per_token"]
    )
    assert rows["src2"]["kl_bits_per_token"] >= 1.0  # disjoint vocab: real bits
    for r in rows.values():
        assert r["bits_global"] >= r["bits_own"]  # blend never codes tighter


def test_kl_on_testdata_bounded(spark, sf_dir):
    """Real testbed: every per-token KL is within whole-bit noise of
    non-negative and far below the vocabulary's code length."""
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["corpus_source_kl_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["kl_bits_per_token"] <= 32.0, r
