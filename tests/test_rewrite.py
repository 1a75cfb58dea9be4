"""Remove-side passage-dedup rewrite (operators/rewrite.py).

The registered chunk-unit query is oracle-gated by the driver and the
full-registry twin sweeps; these tests cover what those can't:
the CCNet-literal "line" unit on newline-STRUCTURED documents (the
testbed is single-line, so the line unit is vacuous there), and the
reassembly contract of the chunk unit.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle import compare


_LINE_DOCS = [
    # (doc_id, text): boilerplate header/footer shared across docs,
    # unique bodies; doc 4 is ALL boilerplate; doc 5 empty; doc 6 NULL;
    # blank-line paragraph separators and stray indentation mix in
    (1, "SHARED HEADER\nunique body one\n\n  shared footer line  \n"),
    (2, "SHARED HEADER\nunique body two\nshared footer line"),
    (3, "unique body three\n\n\nOnly doc three says this."),
    (4, "shared header\n shared footer line "),  # lowercase + padding: still dup
    (5, ""),
    (6, None),
]

_LINE_ORACLE = """
    WITH w AS (
        SELECT doc_id,
               list_filter(
                   list_transform(string_split_regex(text, '\\n+'), x -> trim(x)),
                   x -> x <> '') AS lines
        FROM docs
    ),
    idx AS (
        SELECT doc_id, lines, unnest(range(len(lines))) AS i
        FROM w WHERE len(lines) > 0
    ),
    h AS (
        SELECT doc_id, i AS pos, lines[i + 1] AS passage,
               md5(lower(lines[i + 1])) AS phash
        FROM idx
    ),
    spread AS (SELECT phash, COUNT(DISTINCT doc_id) AS n_docs FROM h GROUP BY phash),
    k AS (SELECT h.doc_id, h.pos, h.passage, s.n_docs FROM h JOIN spread s USING (phash)),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_passages,
               CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
               string_agg(CASE WHEN n_docs < 2 THEN passage END, chr(10) ORDER BY pos)
                 AS text_clean
        FROM k GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_passages, 0) AS n_passages,
           COALESCE(a.n_dropped, 0) AS n_dropped,
           COALESCE(a.text_clean, '') AS text_clean
    FROM docs d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


@pytest.fixture(scope="module")
def line_docs(spark):
    return spark.createDataFrame(_LINE_DOCS, "doc_id long, text string")


def test_line_unit_rewrite_matches_duckdb(spark, line_docs, tmp_path_factory):
    """The CCNet-literal unit: newline-group passages, trimmed,
    case-insensitively hashed, dropped when shared by >= 2 docs,
    reassembled with a single newline — vs an independent DuckDB
    evaluation of the same contract on newline-structured docs."""
    from bigdata_project_spark.operators.rewrite import passage_rewrite

    d = tmp_path_factory.mktemp("linedocs")
    line_docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/docs.parquet")
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW docs AS SELECT * FROM '{d}/docs.parquet/*.parquet'")
        res = compare(
            "line_unit_rewrite", passage_rewrite(line_docs, unit="line"), con, _LINE_ORACLE
        )
        assert res.ok, res.detail
    finally:
        con.close()


def test_line_unit_rewrite_semantics(spark, line_docs):
    """Pin the observable contract on the hand-built corpus: shared
    header/footer removed from every copy (case-insensitively, despite
    trim-able padding), unique bodies preserved in order, all-boiler
    doc rewritten to '', empty/NULL docs emit 0/0/'' rows."""
    from bigdata_project_spark.operators.rewrite import passage_rewrite

    got = {
        r["doc_id"]: (r["n_passages"], r["n_dropped"], r["text_clean"])
        for r in passage_rewrite(line_docs, unit="line").collect()
    }
    assert got == {
        1: (3, 2, "unique body one"),
        2: (3, 2, "unique body two"),
        3: (2, 0, "unique body three\nOnly doc three says this."),
        4: (2, 2, ""),
        5: (0, 0, ""),
        6: (0, 0, ""),
    }


def test_chunk_unit_reassembly_is_whitespace_normalized_identity(spark, sf_dir):
    """Chunk-unit contract: for every document with n_dropped = 0 the
    rewrite must be the whitespace-normalized original (lossless tail
    included), and n_passages must be ceil(n_tokens / 10) — asserted
    in one pass via except_all against the equivalent expression."""
    from pyspark.sql import functions as F

    from bigdata_project_spark.registry import all_queries
    from bigdata_project_spark.tables import load

    rewritten = all_queries()["corpus_paragraph_dedup_rewrite"](spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    words = F.array_remove(F.split(F.coalesce("text", F.lit("")), r"\s+"), "")
    expected = docs.select(
        "doc_id",
        F.concat_ws(" ", words).alias("norm_text"),
        F.ceil(F.size(words) / F.lit(10)).cast("long").alias("exp_passages"),
    )
    j = rewritten.join(expected, "doc_id")
    bad_counts = j.filter(F.col("n_passages") != F.col("exp_passages")).count()
    assert bad_counts == 0
    undropped = j.filter(F.col("n_dropped") == 0)
    assert undropped.count() > 0  # non-vacuous: some docs survive intact
    mismatches = undropped.filter(F.col("text_clean") != F.col("norm_text")).count()
    assert mismatches == 0
    # and the rewrite is non-vacuous the other way: something was cut
    assert j.agg(F.sum("n_dropped")).first()[0] > 0
