"""Vietnamese normalization unit tests, partly against the real
reference-corpus district/ward values."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdata_project_spark.listings.vietnamese import (
    fold_diacritics,
    norm_admin_key,
    parse_price_vnd,
    strip_admin_prefix,
)

CORPUS = "/root/reference/data_input/house/2025-12-12"


def test_fold_and_strip(spark):
    df = spark.createDataFrame(
        [("Quận Ba Đình",), ("Huyện Đông Anh",), ("Phường Cống Vị",), ("Đường Nguyễn Trãi",)],
        ["name"],
    )
    out = df.select(
        fold_diacritics(F.col("name")).alias("folded"),
        strip_admin_prefix(F.col("name")).alias("stripped"),
        norm_admin_key(F.col("name")).alias("key"),
    ).collect()
    assert out[0]["folded"] == "Quan Ba Dinh"
    assert out[0]["stripped"] == "Ba Đình"
    assert out[0]["key"] == "ba dinh"
    assert out[3]["key"] == "nguyen trai"


def test_parse_price_vnd(spark):
    cases = [
        ("5,6 tỷ", 5_600_000_000),
        ("850 triệu", 850_000_000),
        ("8 triệu/tháng", 8_000_000),
        ("1.200 triệu", 1_200_000_000),  # dot as thousands separator
        ("2 tỷ 500", 2_000_000_000),  # leading amount wins
        ("Thỏa thuận", None),
        ("120k", 120_000),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], ["txt"])
    got = [r["vnd"] for r in df.select(parse_price_vnd(F.col("txt")).alias("vnd")).collect()]
    assert got == [v for _, v in cases]


@pytest.mark.skipif(not os.path.isdir(CORPUS), reason="reference corpus not present")
def test_norm_key_on_reference_districts(spark):
    from bigdata_project_spark.listings import read_listings_json

    df = read_listings_json(spark, f"{CORPUS}/house_*.json")
    keys = df.select(norm_admin_key(F.col("district")).alias("k")).distinct().collect()
    # all 23 corpus districts fold to pure-ASCII lowercase keys
    assert len(keys) == 23
    for r in keys:
        assert r["k"] == r["k"].lower()
        assert all(ord(c) < 128 for c in r["k"]), r["k"]
