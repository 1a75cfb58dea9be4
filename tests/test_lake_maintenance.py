"""Lake maintenance patterns at the parquet layer (SURVEY.md §2.1
sinks, SCALE.md): dynamic partition overwrite (idempotent daily
re-runs touch only their partition) and small-file compaction."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dynamic_partition_overwrite(spark, tmp_path):
    lake = str(tmp_path / "lake")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        day1 = spark.createDataFrame([(1, "2025-01-01"), (2, "2025-01-01")], ["id", "d"])
        day2 = spark.createDataFrame([(3, "2025-01-02")], ["id", "d"])
        day1.write.partitionBy("d").mode("overwrite").parquet(lake)
        day2.write.partitionBy("d").mode("overwrite").parquet(lake)
        # re-run of day1 with corrected data must not clobber day2
        fix1 = spark.createDataFrame([(9, "2025-01-01")], ["id", "d"])
        fix1.write.partitionBy("d").mode("overwrite").parquet(lake)
        back = spark.read.parquet(lake)
        # partition values are type-inferred (string -> date) on read
        assert {(r["id"], str(r["d"])) for r in back.collect()} == {(9, "2025-01-01"), (3, "2025-01-02")}
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_small_file_compaction(spark, sf_dir, tmp_path):
    import glob

    from bigdata_project_spark.tables import load

    src = load(spark, sf_dir, "orders")
    shattered = str(tmp_path / "shattered")
    compacted = str(tmp_path / "compacted")
    src.repartition(16).write.parquet(shattered)
    n_small = len(glob.glob(f"{shattered}/*.parquet"))
    assert n_small >= 16
    # compaction: coalesce to few large files without a shuffle
    spark.read.parquet(shattered).coalesce(2).write.parquet(compacted)
    n_big = len(glob.glob(f"{compacted}/*.parquet"))
    assert n_big <= 2
    assert spark.read.parquet(compacted).count() == src.count()
    # content preserved
    a = spark.read.parquet(compacted).agg(F.sum("o_orderkey")).first()[0]
    assert a == src.agg(F.sum("o_orderkey")).first()[0]


def test_storage_format_matrix(spark, sf_dir, tmp_path):
    """The lake speaks more than parquet: ORC round-trip, zstd vs
    snappy parquet codecs, and JSON — same DataFrame, same values,
    different storage trade-offs (codec choice is a write option, not
    a code change)."""
    from bigdata_project_spark.tables import load

    src = load(spark, sf_dir, "nation")
    expected = sorted((r["n_nationkey"], r["n_name"]) for r in src.collect())

    orc_path = str(tmp_path / "orc")
    src.write.orc(orc_path)
    got_orc = spark.read.orc(orc_path)
    assert sorted((r["n_nationkey"], r["n_name"]) for r in got_orc.collect()) == expected

    for codec in ("snappy", "zstd"):
        p = str(tmp_path / f"pq_{codec}")
        src.write.option("compression", codec).parquet(p)
        got = spark.read.parquet(p)
        assert sorted((r["n_nationkey"], r["n_name"]) for r in got.collect()) == expected

    json_path = str(tmp_path / "json")
    src.write.json(json_path)
    got_json = spark.read.schema(src.schema).json(json_path)
    assert sorted((r["n_nationkey"], r["n_name"]) for r in got_json.collect()) == expected


def test_text_and_wholetext_sources(spark, tmp_path):
    """line-oriented and whole-file text sources — the raw-ingest edge
    for documents that arrive as plain files."""
    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("solo line\n")

    lines = spark.read.text(str(d))
    assert lines.count() == 3

    whole = spark.read.text(str(d), wholetext=True)
    texts = sorted(r["value"] for r in whole.collect())
    assert len(texts) == 2 and texts[0].startswith("line one")
