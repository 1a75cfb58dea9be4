"""DSIR importance weighting (operators/dsir.py) semantics.

The oracle gate proves cross-engine parity on the testbed, where all
sources share a vocabulary and discrimination is weak (correctly
signed: target sources mean -0.183 vs -0.198 per token at sf0.01).
This pins the SEMANTIC on a hand-built corpus with real domain
separation: a held-out document written in the target domain's
vocabulary must outrank one written in the raw-majority vocabulary.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle import compare


def _mk_docs(spark, tmp_path_factory):
    # src0/src1 = target domain (physics words); src5.. = raw majority
    # (finance words); docs 100/101 are HELD-OUT mixtures from sources
    # outside the target set — 100 speaks physics, 101 speaks finance
    physics = "quantum neutron boson lattice spin entangle flux decay orbit"
    finance = "market price stock yield bond hedge margin trade index"
    rows = [
        (1, physics + " quark", "en", "src0", 0),
        (2, physics + " meson", "en", "src1", 0),
        (3, finance + " swap", "en", "src5", 0),
        (4, finance + " option", "en", "src6", 0),
        (5, finance + " future", "en", "src7", 0),
        (100, physics, "en", "src9", 0),
        (101, finance, "en", "src9", 0),
    ]
    d = tmp_path_factory.mktemp("dsir")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


def test_target_domain_doc_outranks_raw_domain_doc(spark, tmp_path_factory):
    from bigdata_project_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    d = _mk_docs(spark, tmp_path_factory)
    spec = REGISTRY["corpus_dsir_importance"]
    got = {r["doc_id"]: r["importance_per_token"] for r in spec.fn(spark, d).collect()}
    # the physics-speaking held-out doc must be strictly more
    # target-like than the finance-speaking one
    assert got[100] > got[101], got
    # and the in-target docs outrank the raw-majority docs
    assert min(got[1], got[2]) > max(got[3], got[4], got[5]), got

    # cross-engine parity holds on this corpus too (structured, not
    # the uniform testbed)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
        )
        res = compare("dsir_hand_corpus", spec.fn(spark, d), con, spec.oracle)
        assert res.ok, res.detail
    finally:
        con.close()
