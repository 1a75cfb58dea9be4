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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

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
        for path in partition.files:
            yield _parse_listing_file(path)


_FIELD_ORDER = [
    "id", "title", "description", "price", "area_m2", "price_per_m2",
    "region", "district", "ward", "street", "lat", "lng",
    "property_type", "category", "post_time", "images",
]


def _parse_listing_file(path: str) -> tuple:
    import json
    import os

    with open(path, encoding="utf-8") as f:
        rec = json.load(f)
    ingest_date = os.path.basename(os.path.dirname(path))
    return tuple(rec.get(k) for k in _FIELD_ORDER) + (os.path.basename(path), ingest_date)


class ListingJsonStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of the landing zone: each micro-batch picks up
    files that arrived since the last committed offset — the
    reference's declared Kafka edge (README.md:9-13) without a
    broker, with the same exactly-once contract (the offset is the
    position in the sorted file list; `readBetweenOffsets` replays a
    committed range deterministically on recovery).

    Scale note: the simple-reader API reads on the driver — right for
    a control-plane-sized trickle of landing files (and for tests).
    A firehose belongs on the partition-parallel batch reader per
    micro-batch (file-source semantics) or a real Kafka topic; same
    downstream pipeline either way."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("listing_json requires option 'path'")
        self.max_files = int(options.get("max_files_per_batch", "100"))

    def _files(self) -> list[str]:
        import glob
        import os

        return sorted(glob.glob(os.path.join(self.path, "**", "house_*.json"), recursive=True))

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start):
        files = self._files()
        i = int(start["idx"])
        j = min(len(files), i + self.max_files)
        # a list, not a generator: the simple-reader protocol pickles
        # the prefetched rows into the micro-batch plan
        return [_parse_listing_file(p) for p in files[i:j]], {"idx": j}

    def readBetweenOffsets(self, start, end):
        files = self._files()
        return [_parse_listing_file(p) for p in files[int(start["idx"]) : int(end["idx"])]]


class _WroteFiles(WriterCommitMessage):
    def __init__(self, n: int):
        self.n = n


class ListingJsonWriter(DataSourceWriter):
    """Per-record JSON sink with the reference's exact file contract
    (CrawlData.py:129-134): one pretty-printed UTF-8 JSON object per
    listing, filename `house_{id}_{timestamp}.json`, under a
    date-partition directory (:111-113). Each task writes its own
    partition's records — the sink is embarrassingly parallel (file-
    per-record is an anti-pattern at scale; this exists for landing-
    zone/fixture parity — see write_lake for the production sink)."""

    _FIELDS = [
        "id", "title", "description", "price", "area_m2", "price_per_m2",
        "region", "district", "ward", "street", "lat", "lng",
        "property_type", "category", "post_time", "images",
    ]

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("listing_json write requires option 'path'")
        self.ingest_date = options.get("ingest_date", "1970-01-01")

    def write(self, rows):
        import json
        import os
        from datetime import datetime, timezone

        out_dir = os.path.join(self.path, self.ingest_date)
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for row in rows:
            rec = {k: row[k] for k in self._FIELDS if k in row.__fields__}
            ts = datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%S")
            fname = os.path.join(out_dir, f"house_{rec['id']}_{ts}.json")
            with open(fname, "w", encoding="utf-8") as f:
                json.dump(rec, f, ensure_ascii=False, indent=2)
            n += 1
        return _WroteFiles(n)


class ListingJsonDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "listing_json"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> ListingJsonReader:
        return ListingJsonReader(self.options)

    def writer(self, schema, overwrite: bool) -> ListingJsonWriter:
        return ListingJsonWriter(self.options)

    def simpleStreamReader(self, schema) -> ListingJsonStreamReader:
        return ListingJsonStreamReader(self.options)


# DataSource classes are shipped to Python workers by pickle; classes
# in an importable module are pickled BY REFERENCE, which breaks when
# the worker doesn't have this repo on its path (the driver may run
# from any cwd). Registering the module for by-value pickling embeds
# the code in the pickle instead.
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
