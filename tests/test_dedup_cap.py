"""Hot-shingle document-frequency cap (operators/dedup.py).

At the shipped test scale factors no shingle exceeds the cap (max df
is 3-4), so the driver's oracle gate can't exercise it; this test
builds an adversarial corpus where one boilerplate shingle appears in
every document and asserts the cap removes it from candidate
generation — the property that keeps the shingle self-join bounded
(<= max_df² pairs per shingle) at corpus scale.
"""

from __future__ import annotations

import pytest

from bigdata_project_spark.operators.dedup import shingle_df_capped

# 70 docs (> MAX_SHINGLE_DF = 64) sharing one boilerplate 5-gram;
# docs 0/1 additionally share a genuine near-dup body.
_N_DOCS = 70
_BOILER = "subscribe to our newsletter today friends"
_DOCS = [
    (0, f"{_BOILER} alpha beta gamma delta epsilon zeta eta theta"),
    (1, f"{_BOILER} alpha beta gamma delta epsilon zeta eta iota"),
] + [(i, f"{_BOILER} unique{i} filler{i} pad{i} words{i} here{i}") for i in range(2, _N_DOCS)]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("hotshingle")
    spark.createDataFrame(_DOCS, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_cap_drops_hot_shingles_only(spark, corpus_dir):
    capped = shingle_df_capped(spark, corpus_dir).collect()
    shingles = {r["shingle"] for r in capped}
    # the pure-boilerplate 5-gram (df = 70 > 64) must be gone; genuine
    # body shingles (df <= 2) must survive
    assert "subscribe to our newsletter today" not in shingles
    assert any("alpha beta gamma" in s for s in shingles)


def test_capped_join_excludes_boilerplate_pairs(spark, corpus_dir):
    from bigdata_project_spark.registry import all_queries

    pairs = all_queries()["dedup_ngram_jaccard"](spark, corpus_dir).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # docs 2..69 share ONLY hot boilerplate shingles -> no candidate pair;
    # without the cap this would be all C(70,2)=2415 pairs
    assert (2, 3) not in got
    # the genuine near-dup pair survives via its body shingles
    assert (0, 1) in got


def test_cap_is_noop_at_test_scale(spark, sf_dir):
    from bigdata_project_spark.operators.dedup import shingle_df

    n_all = shingle_df(spark, sf_dir).count()
    n_capped = shingle_df_capped(spark, sf_dir).count()
    assert n_all == n_capped  # max df at test SF is 3-4, cap is 64


def test_fast_minhash_finds_all_exact_duplicate_pairs(spark, tmp_path_factory):
    """xxhash64 variant invariant: identical documents have identical
    signatures under ANY hash function, so exact-duplicate pairs MUST
    collide in every band — both the oracled md5 variant and the fast
    path report them with jaccard 1.0."""
    from bigdata_project_spark.caching import release_cached
    from bigdata_project_spark.registry import all_queries

    base = "one two three four five six seven eight nine ten"
    alt = "zz yy xx ww vv uu tt ss rr qq"
    docs = [
        (0, f"{base} alpha"),
        (1, f"{base} alpha"),   # dup of 0
        (2, f"{alt} beta"),
        (3, f"{alt} beta"),     # dup of 2
        (4, f"{base} gamma delta epsilon zeta eta theta"),
        (5, f"{alt} iota kappa lambda mu nu xi"),
    ]
    d = tmp_path_factory.mktemp("fastmh")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    qs = all_queries()
    for name in ("dedup_minhash_lsh", "dedup_minhash_lsh_fast"):
        exact = {
            (r["doc_a"], r["doc_b"])
            for r in qs[name](spark, str(d)).collect()
            if r["jaccard"] == 1.0
        }
        release_cached(spark)
        assert {(0, 1), (2, 3)} <= exact, name
