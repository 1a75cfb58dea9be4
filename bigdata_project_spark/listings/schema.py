"""Listing record schema (SURVEY.md §1.2).

The reference defines the schema implicitly via the dict literal in
`extract_one` (/root/reference/CrawlData.py:71-88); we make it an
explicit StructType enforced on read — no sampling inference in
production paths. Types are the observed corpus types (317 records,
data_input/house/2025-12-12/).
"""

from __future__ import annotations

from pyspark.sql import types as T

# field order mirrors the reference dict literal (CrawlData.py:71-88)
LISTING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),  # ad.list_id (:72)
        T.StructField("title", T.StringType()),  # ad.subject (:73)
        T.StructField("description", T.StringType()),  # ad.body (:74)
        T.StructField("price", T.LongType()),  # ad.price (:67,75), VND
        T.StructField("area_m2", T.LongType()),  # ad.area (:68,76)
        T.StructField("price_per_m2", T.DoubleType()),  # computed (:69,77)
        T.StructField("region", T.StringType()),  # ad.region_name (:78)
        T.StructField("district", T.StringType()),  # ad.area_name (:79)
        T.StructField("ward", T.StringType()),  # ad.ward_name (:80)
        T.StructField("street", T.StringType()),  # ad.street_name (:81)
        T.StructField("lat", T.DoubleType()),  # ad.latitude (:82)
        T.StructField("lng", T.DoubleType()),  # ad.longitude (:83)
        T.StructField("property_type", T.StringType()),  # ad.property_type (:84); all-null in corpus
        T.StructField("category", T.IntegerType()),  # ad.category (:85)
        T.StructField("post_time", T.LongType()),  # ad.list_time (:86), epoch ms
        T.StructField("images", T.IntegerType()),  # len(ad.images) (:87)
    ]
)

# nested upstream payload (`raw["ad"]`, CrawlData.py:65) — the subset
# of API fields extract_one touches
RAW_AD_SCHEMA = T.StructType(
    [
        T.StructField(
            "ad",
            T.StructType(
                [
                    T.StructField("list_id", T.LongType()),
                    T.StructField("subject", T.StringType()),
                    T.StructField("body", T.StringType()),
                    T.StructField("price", T.LongType()),
                    T.StructField("area", T.LongType()),
                    T.StructField("region_name", T.StringType()),
                    T.StructField("area_name", T.StringType()),
                    T.StructField("ward_name", T.StringType()),
                    T.StructField("street_name", T.StringType()),
                    T.StructField("latitude", T.DoubleType()),
                    T.StructField("longitude", T.DoubleType()),
                    T.StructField("property_type", T.StringType()),
                    T.StructField("category", T.IntegerType()),
                    T.StructField("list_time", T.LongType()),
                    T.StructField("images", T.ArrayType(T.StringType())),
                ]
            ),
        )
    ]
)
