"""Golden-fixture parity tests on the reference corpus (SURVEY.md §5.2)
plus unit tests for the raw-API normalization edge cases."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_project_spark.listings import (
    extract_from_api,
    read_listings_csv,
    read_listings_json,
    silver_transform,
)
from bigdata_project_spark.listings.schema import RAW_AD_SCHEMA

CORPUS = "/root/reference/data_input/house/2025-12-12"

pytestmark = pytest.mark.skipif(not os.path.isdir(CORPUS), reason="reference corpus not present")


@pytest.fixture(scope="module")
def json_df(spark):
    return read_listings_json(spark, f"{CORPUS}/house_*.json").cache()


@pytest.fixture(scope="module")
def csv_df(spark):
    return read_listings_csv(spark, f"{CORPUS}/house_data_*.csv").cache()


def test_json_corpus_shape(json_df):
    assert json_df.count() == 317
    assert len(json_df.columns) == 16


def test_csv_corpus_shape(csv_df):
    # multiLine parse: 292/317 descriptions contain newlines; a naive
    # line-based read would explode the row count
    assert csv_df.count() == 317


def test_id_sets_match_across_formats(json_df, csv_df):
    jids = {r.id for r in json_df.select("id").collect()}
    cids = {r.id for r in csv_df.select("id").collect()}
    assert jids == cids and len(jids) == 317


def test_price_per_m2_reproduction(json_df):
    """price_per_m2 == price/area exactly (CrawlData.py:69) on all rows
    where the guard fires; null where it doesn't."""
    recomputed = json_df.withColumn(
        "expected",
        F.when(
            F.col("price").isNotNull()
            & (F.col("price") != 0)
            & F.col("area_m2").isNotNull()
            & (F.col("area_m2") > 0),
            F.col("price").cast("double") / F.col("area_m2"),
        ),
    )
    mismatches = recomputed.filter(
        ~(
            (F.col("price_per_m2").isNull() & F.col("expected").isNull())
            | (F.col("price_per_m2") == F.col("expected"))
        )
    ).count()
    assert mismatches == 0


def test_property_type_all_null(json_df):
    assert json_df.filter(F.col("property_type").isNotNull()).count() == 0


def test_silver_transform(json_df):
    silver = silver_transform(json_df)
    assert silver.count() == 317  # ids unique in corpus
    row = silver.select("event_time", "ingest_date").first()
    assert row.event_time is not None and str(row.ingest_date) == "2025-12-12"


def test_extract_from_api_parity(spark):
    """extract_one edge cases (CrawlData.py:60-88): zero price/area ->
    null ppm2 (Python truthiness), missing images -> 0, missing ad
    -> row dropped."""
    rows = [
        Row(ad=Row(list_id=1, subject="t", body="b", price=100, area=4, region_name="r",
                   area_name="d", ward_name="w", street_name="s", latitude=1.0, longitude=2.0,
                   property_type=None, category=1010, list_time=1765504156000, images=["a", "b"])),
        Row(ad=Row(list_id=2, subject=None, body=None, price=0, area=4, region_name=None,
                   area_name=None, ward_name=None, street_name=None, latitude=None, longitude=None,
                   property_type=None, category=None, list_time=None, images=None)),
        Row(ad=Row(list_id=3, subject=None, body=None, price=100, area=0, region_name=None,
                   area_name=None, ward_name=None, street_name=None, latitude=None, longitude=None,
                   property_type=None, category=None, list_time=None, images=[])),
        Row(ad=None),
    ]
    raw = spark.createDataFrame(rows, RAW_AD_SCHEMA)
    out = {r.id: r for r in extract_from_api(raw).collect()}
    assert set(out) == {1, 2, 3}  # ad=None dropped (:62-63)
    assert out[1].price_per_m2 == 25.0 and out[1].images == 2
    assert out[2].price_per_m2 is None  # price=0 falsy (:67-69)
    assert out[3].price_per_m2 is None  # area=0 fails area>0
    assert out[2].images == 0  # len(None or []) == 0 (:87)
    assert out[3].images == 0


def test_lake_roundtrip(tmp_path, spark, json_df):
    from bigdata_project_spark.listings.ingest import write_lake

    lake = str(tmp_path / "lake")
    write_lake(silver_transform(json_df), lake, mode="overwrite")
    back = spark.read.parquet(lake)
    assert back.count() == 317
    assert "ingest_date" in back.columns  # partition column survives
