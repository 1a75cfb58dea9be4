"""Testbed table loading (driver contract: /root/testdata/sf*/<name>.parquet).

`load` is the single scan entry point for the relational queries, so
partitioning/caching policy lives in one place. All reads are plain
`spark.read.parquet` — Catalyst's vectorized parquet reader gives us
column pruning + predicate pushdown for free; at 100 TB the same call
reads a partitioned lake directory and prunes partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables small enough to always broadcast in joins at any realistic
# scale factor (dimension tables in the star schema).
BROADCAST_DIMS = {"region", "nation", "supplier"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testbed table as a temp view for spark.sql queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
