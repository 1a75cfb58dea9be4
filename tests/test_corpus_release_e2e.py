"""End-to-end corpus RELEASE: compose the registered operators into an
actual on-disk training-data release (sharded parquet + manifest) and
assert the cross-operator invariants no single-query oracle can see —
that the pieces fit together the way a user of the engine would chain
them.

Chain: training_corpus_manifest (keep bits) -> dedup_normalized_exact
(reformatting-dupe keepers) -> pack_sequences_by_source (shard/pack
assignment) -> partitioned parquet write + summary manifest.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from bigdata_project_spark.registry import all_queries
from bigdata_project_spark.tables import load


def test_corpus_release_roundtrip(spark, sf_dir, tmp_path):
    qs = all_queries()
    docs = load(spark, sf_dir, "documents")

    manifest = qs["training_corpus_manifest"](spark, sf_dir).select(
        "doc_id", "in_training_corpus"
    )
    norm_keep = (
        qs["dedup_normalized_exact"](spark, sf_dir)
        .select(F.col("keeper_doc_id").alias("doc_id"))
        .distinct()
    )
    packs = qs["pack_sequences_by_source"](spark, sf_dir).select("doc_id", "pack_id")

    release = (
        docs.join(manifest, "doc_id")
        .join(norm_keep.withColumn("norm_keeper", F.lit(1)), "doc_id", "left")
        .join(packs, "doc_id")
        .filter((F.col("in_training_corpus") == 1) & F.col("norm_keeper").isNotNull())
        .select("doc_id", "source", "pack_id", "text")
    )
    out = str(tmp_path / "release")
    release.write.partitionBy("source").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    n_released = back.count()
    assert n_released > 0

    # 1. release is dedup-clean under BOTH hash regimes: no two docs
    #    share a raw or normalized content hash
    norm = F.md5(
        F.trim(F.regexp_replace(F.regexp_replace(F.lower("text"), r"[^a-z0-9 ]", ""), " +", " "))
    )
    dupes = (
        back.select(norm.alias("h"))
        .groupBy("h")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0

    # 2. the partitioned layout matches the source column exactly
    src_dirs = {p.split("source=")[1] for p in glob.glob(f"{out}/source=*")}
    src_col = {r["source"] for r in back.select("source").distinct().collect()}
    assert src_dirs == src_col

    # 3. released rows are a subset of the manifest's keep set, and
    #    every kept-and-norm-unique doc made it in (no silent drops)
    keep_ids = {
        r["doc_id"]
        for r in manifest.filter(F.col("in_training_corpus") == 1)
        .join(norm_keep, "doc_id", "left_semi")
        .collect()
    }
    got_ids = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert got_ids == keep_ids

    # 4. pack ids in the release are dense enough to be usable: every
    #    (source, pack_id) present in the release exists in the pack
    #    assignment, with identical membership
    rel_packs = {(r["pack_id"], r["doc_id"]) for r in back.select("pack_id", "doc_id").collect()}
    all_packs = {
        (r["pack_id"], r["doc_id"])
        for r in packs.join(back.select("doc_id"), "doc_id", "left_semi").collect()
    }
    assert rel_packs == all_packs
