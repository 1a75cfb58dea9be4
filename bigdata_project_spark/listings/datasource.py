"""Custom Python DataSource: the reference's per-record-JSON landing
zone as a first-class Spark source (SURVEY.md §2.1 'JSON record
source').

The reference materializes one pretty-printed JSON file per listing
(`house_{id}_{ts}.json`, CrawlData.py:129-134) under date-partition
directories. Spark's built-in JSON reader handles this fine
(multiLine), but a landing zone is also the natural place for a
custom source: this DataSource presents the directory as a table
with file-level partition parallelism and filename-derived metadata
columns (source_file, ingest_date from the directory name) — the
pattern to extend for formats Spark has no reader for (proprietary
blobs, WARC, tar-of-images, ...).

Register + use:

    spark.dataSource.register(ListingJsonDataSource)
    df = (spark.read.format("listing_json")
          .option("path", "/root/reference/data_input/house")
          .load())

Scale note: `partitions()` returns one InputPartition per file
bundle (capped fan-out), so a million-file landing zone spreads
across the cluster; each task parses only its bundle. Everything the
reader needs ships pickled — no repo import required on workers.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA_DDL = (
    "id long, title string, description string, price long, area_m2 long, "
    "price_per_m2 double, region string, district string, ward string, "
    "street string, lat double, lng double, property_type string, "
    "category int, post_time long, images int, "
    "source_file string, ingest_date string"
)


class _FileBundle(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class ListingJsonReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("listing_json requires option 'path'")
        self.bundle_size = int(options.get("bundle_size", "64"))

    def partitions(self):
        import glob
        import os

        files = sorted(glob.glob(os.path.join(self.path, "**", "house_*.json"), recursive=True))
        bundles = [files[i : i + self.bundle_size] for i in range(0, len(files), self.bundle_size)]
        return [_FileBundle(b) for b in bundles] or [_FileBundle([])]

    def read(self, partition: _FileBundle):
        import json
        import os

        fields = [
            "id", "title", "description", "price", "area_m2", "price_per_m2",
            "region", "district", "ward", "street", "lat", "lng",
            "property_type", "category", "post_time", "images",
        ]
        for path in partition.files:
            with open(path, encoding="utf-8") as f:
                rec = json.load(f)
            ingest_date = os.path.basename(os.path.dirname(path))
            yield tuple(rec.get(k) for k in fields) + (os.path.basename(path), ingest_date)


class ListingJsonDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "listing_json"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> ListingJsonReader:
        return ListingJsonReader(self.options)
