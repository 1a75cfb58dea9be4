"""Custom Python DataSource over the reference landing zone: parity
with the built-in multiLine JSON reader + metadata columns."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

CORPUS_ROOT = "/root/reference/data_input/house"

pytestmark = pytest.mark.skipif(not os.path.isdir(CORPUS_ROOT), reason="reference corpus not present")


@pytest.fixture(scope="module")
def listing_df(spark):
    from bigdata_project_spark.listings.datasource import ListingJsonDataSource

    spark.dataSource.register(ListingJsonDataSource)
    return (
        spark.read.format("listing_json")
        .option("path", CORPUS_ROOT)
        .option("bundle_size", "32")
        .load()
        .cache()
    )


def test_row_count_and_metadata(listing_df):
    assert listing_df.count() == 317
    dates = [r["ingest_date"] for r in listing_df.select("ingest_date").distinct().collect()]
    assert dates == ["2025-12-12"]
    assert listing_df.filter(F.col("source_file").startswith("house_")).count() == 317


def test_parity_with_builtin_json_reader(spark, listing_df):
    from bigdata_project_spark.listings import read_listings_json

    builtin = read_listings_json(spark, f"{CORPUS_ROOT}/2025-12-12/house_*.json")
    a = sorted(
        map(tuple, listing_df.select(*builtin.columns).collect())
    )
    b = sorted(map(tuple, builtin.collect()))
    assert a == b


def test_partition_parallelism(listing_df):
    # 317 files at bundle_size 32 -> 10 input partitions
    assert listing_df.rdd.getNumPartitions() == 10


def test_writer_roundtrip(spark, listing_df, tmp_path):
    """Write with the per-record JSON sink (reference contract:
    CrawlData.py:129-134) and read back via the same format."""
    from pyspark.sql import functions as F2

    out = str(tmp_path / "landing")
    subset = listing_df.filter(F2.col("id") % 10 == 0).drop("source_file", "ingest_date")
    (
        subset.write.format("listing_json")
        .option("path", out)
        .option("ingest_date", "2026-08-13")
        .mode("append")
        .save()
    )
    back = spark.read.format("listing_json").option("path", out).load()
    assert back.count() == subset.count()
    assert [r["ingest_date"] for r in back.select("ingest_date").distinct().collect()] == ["2026-08-13"]
    cols = [c for c in subset.columns]
    assert sorted(map(tuple, back.select(*cols).collect())) == sorted(map(tuple, subset.collect()))


def test_stream_reader_tails_landing_zone(spark, listing_df, tmp_path):
    """Streaming read of the same landing zone via simpleStreamReader:
    multiple offset-bounded micro-batches, exactly the batch row set."""
    from bigdata_project_spark.listings.datasource import ListingJsonDataSource

    spark.dataSource.register(ListingJsonDataSource)
    stream = (
        spark.readStream.format("listing_json")
        .option("path", CORPUS_ROOT)
        .option("max_files_per_batch", "100")  # 317 files -> 4 micro-batches
        .load()
    )
    import time

    expected = listing_df.count()
    q = (
        stream.writeStream.format("memory")
        .queryName("t_listing_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline and spark.table("t_listing_stream").count() < expected:
        time.sleep(0.5)
    q.stop()
    got = spark.table("t_listing_stream")
    assert got.count() == expected
    got_ids = {r["id"] for r in got.select("id").collect()}
    batch_ids = {r["id"] for r in listing_df.select("id").collect()}
    assert got_ids == batch_ids
    # offset progression proves incremental micro-batches (317 files
    # at 100/batch), not one big read
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2
