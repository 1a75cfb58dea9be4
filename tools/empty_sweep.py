"""Degenerate-input sweep: every oracled query on ZERO-ROW tables.

The round-6 advisor found a real bug of this class (the A/B z-flag
query returned 0 rows on Spark but 1 row of NULLs on DuckDB when one
variant was empty). Empty input is the sharpest degenerate case —
scalar subqueries, cross joins of 1-row aggregates, window frames,
and COALESCE defaults all behave differently on zero rows — so this
sweep runs the full registry against a schema-identical zero-row
testbed and compares Spark vs DuckDB exactly like the driver does.

Usage: python tools/empty_sweep.py [--trace]  (writes /tmp/empty_sf)
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

EMPTY_DIR = "/tmp/empty_sf"


def build_empty_testbed(src: str = "/root/testdata/sf0.001", dst: str = EMPTY_DIR) -> None:
    import pyarrow.parquet as pq

    from bigdata_project_spark.tables import TABLES

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), f"{dst}/{t}.parquet")


def main() -> int:
    build_empty_testbed()

    from bigdata_project_spark.registry import REGISTRY, _ensure_loaded, all_queries
    from bigdata_project_spark.session import get_spark
    from oracle import compare, duckdb_con

    _ensure_loaded()
    # the engine's canonical session config (Arrow UDTFs, codegen
    # cache headroom, UTC, warehouse dir) — sweeping under a
    # different config than the gates it mirrors would be misleading
    spark = get_spark("empty-sweep", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    con = duckdb_con(EMPTY_DIR)
    bad: list[str] = []
    for i, (name, spec) in enumerate(REGISTRY.items()):
        try:
            df = qs[name](spark, EMPTY_DIR)
            if spec.oracle is None:
                df.collect()  # crash check only
                status = "rows-only ok"
            else:
                res = compare(name, df, con, spec.oracle)
                status = "ok" if res.ok else f"MISMATCH s={res.spark_rows} d={res.oracle_rows} {res.detail[:200]}"
                if not res.ok:
                    bad.append(f"{name}: {status}")
        except Exception as e:  # noqa: BLE001
            status = f"ERROR {type(e).__name__}: {str(e)[:160]}"
            bad.append(f"{name}: {status}")
            if "--trace" in sys.argv:
                traceback.print_exc()
        print(f"[{i + 1}/{len(REGISTRY)}] {name}: {status}", flush=True)
    print(f"\n=== {len(bad)} divergent/erroring on empty input ===")
    for b in bad:
        print(b)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
