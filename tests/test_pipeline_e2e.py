"""EP1 end-to-end (SURVEY.md §3): crawl (fake transport) -> normalize
-> silver -> date-partitioned lake -> read back -> flagship-style
analytics — the reference's whole production DAG, distributed."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_project_spark.listings.crawl import crawl_to_dataframe
from bigdata_project_spark.listings.ingest import silver_transform, write_lake
from tests.test_crawl import make_fake_api


def test_crawl_to_lake_to_analytics(spark, tmp_path):
    lake = str(tmp_path / "lake")
    bronze = crawl_to_dataframe(spark, limit_rows=40, fetcher=make_fake_api(45), sleep_s=0)
    silver = silver_transform(bronze)
    write_lake(silver, lake, mode="overwrite")

    back = spark.read.parquet(lake)
    # partition pruning works on the date layout
    assert "ingest_date" in back.columns
    # flagship-style question over the lake: avg price_per_m2 and
    # count per district, ordered (SURVEY §7 step 1)
    top = (
        back.groupBy("district")
        .agg(F.count("*").alias("n"), F.avg("price_per_m2").alias("avg_ppm2"))
        .orderBy(F.desc("n"), "district")
        .collect()
    )
    assert top and top[0]["n"] == back.count()  # single fake district
    # silver invariants: ids unique, event_time populated
    assert back.select("id").distinct().count() == back.count()
    assert back.filter(F.col("event_time").isNull()).count() == 0
