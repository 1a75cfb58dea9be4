"""corpus_k_anonymize_release (queries/audit_ext.py, round 9).

The DuckDB oracle pins value equality at each scale factor; these
tests pin the PRIVACY GUARANTEE itself — the released set is
k-anonymous on every input, including inputs that force the deeper
generalization levels the fixed testdata never reaches (level-2
full suppression and the record-drop last resort).
"""

from __future__ import annotations

import duckdb

from bigdata_project_spark.registry import REGISTRY, all_queries

_K = 5


def _release(spark, d):
    return all_queries()["corpus_k_anonymize_release"](spark, d).collect()


def _write_customers(spark, tmpdir, rows):
    spark.createDataFrame(
        [(i, f"c{i}", nk, 0.0, seg) for i, (nk, seg) in enumerate(rows)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/customer.parquet")
    return str(tmpdir)


def _oracle_rows(d):
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW customer AS SELECT * FROM '{d}/customer.parquet/*.parquet'"
        )
        return con.sql(REGISTRY["corpus_k_anonymize_release"].oracle).fetchall()
    finally:
        con.close()


def test_release_is_k_anonymous_on_testdata(spark, sf_dir):
    rows = _release(spark, sf_dir)
    assert rows, "release must not be empty on the testbed"
    assert all(r["at_risk"] == 0 for r in rows)
    assert all(r["group_size"] >= _K for r in rows)
    # every class the audit flags at-risk must have been generalized:
    # no released level-0 row may carry an at-risk (nation, segment)
    flagged = {
        (str(r["c_nationkey"]), r["c_mktsegment"])
        for r in all_queries()["qa_k_anonymity"](spark, sf_dir).collect()
        if r["at_risk"] == 1
    }
    level0 = {
        (r["qi_nation"], r["qi_segment"])
        for r in rows
        if r["generalization_level"] == 0
    }
    assert flagged.isdisjoint(level0)


def test_level2_and_record_suppression(spark, tmp_path_factory):
    """Forced deep generalization: nation 1 has 6 singleton-segment
    rows (level 1 suffices: the (1, '*') class has 6 >= k members);
    nations 2 and 3 have 3 singleton rows between them (level 1
    classes still < k -> level 2), and the corpus-wide ('*', '*')
    class would hold only those 3 < k rows -> they are DROPPED;
    nation 4's 7-row segment class releases untouched at level 0."""
    rows_in = (
        [(1, f"s{i}") for i in range(6)]
        + [(2, "t0"), (2, "t1"), (3, "u0")]
        + [(4, "BIG")] * 7
    )
    d = _write_customers(spark, tmp_path_factory.mktemp("kanon1"), rows_in)
    rows = _release(spark, d)
    assert len(rows) == 13  # 16 in, 3 suppressed
    by_level = {}
    for r in rows:
        by_level.setdefault(r["generalization_level"], []).append(r)
    assert len(by_level[0]) == 7 and {
        (r["qi_nation"], r["qi_segment"]) for r in by_level[0]
    } == {("4", "BIG")}
    assert len(by_level[1]) == 6 and {
        (r["qi_nation"], r["qi_segment"]) for r in by_level[1]
    } == {("1", "*")}
    assert 2 not in by_level
    assert all(r["at_risk"] == 0 and r["group_size"] >= _K for r in rows)
    want = sorted(_oracle_rows(d))
    got = sorted(
        (
            r["c_custkey"],
            r["qi_nation"],
            r["qi_segment"],
            r["generalization_level"],
            r["group_size"],
            r["at_risk"],
        )
        for r in rows
    )
    assert got == want


def test_level2_class_released_when_big_enough(spark, tmp_path_factory):
    """When the level-2 rows alone reach k, they release as one
    corpus-wide ('*', '*') class instead of being dropped."""
    rows_in = [(2, "t0"), (2, "t1"), (3, "u0"), (5, "v0"), (5, "v1")] + [
        (4, "BIG")
    ] * 5
    d = _write_customers(spark, tmp_path_factory.mktemp("kanon2"), rows_in)
    rows = _release(spark, d)
    assert len(rows) == 10  # nothing suppressed
    star = [r for r in rows if r["generalization_level"] == 2]
    assert len(star) == 5
    assert {(r["qi_nation"], r["qi_segment"]) for r in star} == {("*", "*")}
    assert all(r["at_risk"] == 0 for r in rows)
    want = sorted(_oracle_rows(d))
    got = sorted(
        (
            r["c_custkey"],
            r["qi_nation"],
            r["qi_segment"],
            r["generalization_level"],
            r["group_size"],
            r["at_risk"],
        )
        for r in rows
    )
    assert got == want
