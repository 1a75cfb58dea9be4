"""SparkSession factory with scale-oriented defaults.

Local-mode testing config that mirrors what we'd set on a real
cluster: AQE (runtime coalesce + skew-join handling), Arrow for any
pandas interchange, UTC session time zone so epoch arithmetic is
location-independent, and shuffle partitions sized to the local core
count instead of the 200 default (on a 1000-executor cluster this
would instead be ~2-3x total cores, or left to AQE's
coalescePartitions with a high initial value).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "bigdata_project_spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python UDTFs evaluate row-at-a-time (BatchEvalPythonUDTF)
        # unless Arrow transfer is opted in — the only non-Arrow
        # Python boundary left without this flag (audited fleet-wide
        # in tests/test_plan_audit.py)
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # the generated-class LRU defaults to 100 entries; a session
        # that runs the whole 150+-query surface (bench, oracle sweep,
        # the external harness) cycles far more distinct plans than
        # that and would re-pay janino compiles on eviction
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        # testbed events.parquet stores TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects; read as long and convert in load()
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # bucketed-table tests write managed tables; keep them off the repo
        .config("spark.sql.warehouse.dir", os.path.join(tempfile.gettempdir(), "spark_graft_warehouse"))
    )
    return builder.getOrCreate()
