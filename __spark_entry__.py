"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``bigdata_project_spark.registry`` — every operator
from SURVEY.md §2 is registered there as a named query plus (where
SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable no matter where the driver launches from —
# both in this process and in Spark Python workers (PYTHONPATH is what
# the worker processes inherit; sys.path edits don't propagate).
import os  # noqa: E402

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
if _REPO not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from bigdata_project_spark.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return all_queries()["agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only check)."""
    return all_oracles()
