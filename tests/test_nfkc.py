"""NFKC-casefold boundary normalizer (text_nfkc_casefold) gates.

Rows-only query (DuckDB has no NFKC/casefold), so this file IS its
correctness gate: golden mappings for every divergent character the
round-7 unicode probe documented, idempotence, and a direct
cross-check against CPython's unicodedata over a multilingual corpus.
"""

from __future__ import annotations

import unicodedata

import pytest


_GOLDEN = [
    # (input, NFKC-casefolded) — the r7 divergent-case-mapping set
    ("ß", "ss"),                  # sharp s full fold
    ("ẞ", "ss"),                  # capital sharp s
    ("İ", "i̇"),                  # dotted capital I -> i + combining dot
    ("ﬁ", "fi"),                  # ligature decomposes under NFKC
    ("ΑΣ", "ασ"),                 # casefold maps final-position Σ to σ
    ("ς", "σ"),                   # casefold canonicalizes final sigma
    ("１２３", "123"),              # fullwidth digits
    ("½", "1⁄2"),                 # compatibility fraction
    ("Ⅸ", "ix"),                  # roman numeral compatibility + fold
    ("ＡＢＣ", "abc"),              # fullwidth letters + fold
    ("CAFÉ", "café"),             # plain diacritic fold
]


@pytest.fixture(scope="module")
def normalized(spark, tmp_path_factory):
    from bigdata_project_spark.registry import all_queries

    rows = [(i, t, "xx", "s", 0) for i, (t, _) in enumerate(_GOLDEN)]
    rows.append((900, None, "xx", "s", 0))
    rows.append((901, "", "xx", "s", 0))
    d = tmp_path_factory.mktemp("nfkc")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        r["doc_id"]: (r["text_norm"], r["changed"])
        for r in all_queries()["text_nfkc_casefold"](spark, str(d)).collect()
    }
    return out


def test_golden_mappings(normalized):
    for i, (src, want) in enumerate(_GOLDEN):
        got, changed = normalized[i]
        assert got == want, f"{src!r}: {got!r} != {want!r}"
        assert changed == (1 if want != src else 0)


def test_null_and_empty_contract(normalized):
    assert normalized[900] == (None, None)
    assert normalized[901] == ("", 0)


def test_idempotent_and_matches_unicodedata_on_corpus(spark, sf_dir):
    """Over the real testbed corpus: applying the operator's contract
    twice equals once, and every row equals a direct CPython
    evaluation (the operator must be exactly unicodedata, not an
    approximation of it)."""
    from bigdata_project_spark.registry import all_queries
    from bigdata_project_spark.tables import load

    out = {
        r["doc_id"]: r["text_norm"]
        for r in all_queries()["text_nfkc_casefold"](spark, sf_dir).collect()
    }
    src = {r["doc_id"]: r["text"] for r in load(spark, sf_dir, "documents").collect()}
    assert set(out) == set(src)
    for doc_id, t in src.items():
        want = unicodedata.normalize("NFKC", t).casefold()
        assert out[doc_id] == want
        assert unicodedata.normalize("NFKC", want).casefold() == want  # idempotent
