"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive multiset of canonicalized rows. Stricter than any
reasonable hasher: floats must match bit-exactly (our determinism
contract in registry.py makes that achievable), so if this passes,
the driver's hash comparison passes too.
"""

from __future__ import annotations

import math
import os
from collections import Counter
from dataclasses import dataclass

import duckdb

from bigdata_project_spark.tables import TABLES


def _oracle_mem_limit() -> str:
    """Oracle memory cap: env-overridable, else min(16GB, 50% of
    detected RAM). Under a JVM-heavy test process DuckDB's
    auto-detected limit can be far too small for the largest nested
    oracles (the IVF-PQ curve's prelude + BF OOM'd at the default),
    but a hardcoded 16GB would exceed physical memory on small CI
    hosts — cap by what the machine actually has."""
    env = os.environ.get("SPARK_GRAFT_ORACLE_MEM")
    if env:
        return env
    try:
        pages = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        half_gb = max(1, pages // (2 * 1024**3))
    except (ValueError, OSError):
        half_gb = 16
    return f"{min(16, half_gb)}GB"


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{_oracle_mem_limit()}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    """Type-tagged canonical cell value.

    int and float are tagged separately even though 2 == 2.0 in
    Python: the driver's hasher may stringify cells, and a Spark
    BIGINT next to a DuckDB DOUBLE ('2' vs '2.0') must be caught as
    a mismatch here, not there.
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        # repr is shortest-roundtrip: bit-exact for every finite double
        # and, unlike the raw float (hash(-0.0) == hash(0.0) makes
        # Counter conflate them), it distinguishes signed zeros — a
        # stringifying driver hasher sees '-0.0' != '0.0', so this
        # comparator must too (round-7 negative-zero gate).
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    # dates, datetimes, decimals, strings -> canonical string
    return ("s", str(v))


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int
    ok: bool
    detail: str = ""


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    s_cols = sorted(spark_df.columns)
    s_rows = [tuple(_canon(r[c]) for c in s_cols) for r in spark_df.collect()]

    rel = con.sql(sql)
    d_cols_raw = list(rel.columns)
    d_idx = [d_cols_raw.index(c) for c in sorted(d_cols_raw)]
    d_rows = [tuple(_canon(row[i]) for i in d_idx) for row in rel.fetchall()]

    if sorted(d_cols_raw) != s_cols:
        return CompareResult(name, len(s_rows), len(d_rows), False, f"columns differ: spark={s_cols} duckdb={sorted(d_cols_raw)}")
    if len(s_rows) != len(d_rows):
        return CompareResult(name, len(s_rows), len(d_rows), False, "row count differs")
    sc, dc = Counter(s_rows), Counter(d_rows)
    if sc != dc:
        only_s = list((sc - dc).items())[:3]
        only_d = list((dc - sc).items())[:3]
        return CompareResult(name, len(s_rows), len(d_rows), False, f"values differ; spark-only={only_s} duckdb-only={only_d}")
    return CompareResult(name, len(s_rows), len(d_rows), True)
