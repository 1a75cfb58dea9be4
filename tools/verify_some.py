"""Targeted oracle verification for a named subset of queries — the
fast inner loop after touching an operator (tools/verify_all.py stays
the full-registry closing gate).

Usage: python tools/verify_some.py QUERY [QUERY...] [--sf SF_DIR ...]
Default scales: sf0.001 and sf0.01. Exit 0 iff every named oracled
query value-matches at every scale (rows-only queries are executed as
a crash check).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def main() -> int:
    argv = sys.argv[1:]
    sfs: list[str] = []
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            i += 1
            while i < len(argv) and not argv[i].startswith("--"):
                sfs.append(argv[i])
                i += 1
        else:
            names.append(argv[i])
            i += 1
    sfs = sfs or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    from bigdata_project_spark.registry import REGISTRY, _ensure_loaded, all_queries
    from bigdata_project_spark.session import get_spark
    from oracle import compare, duckdb_con

    _ensure_loaded()
    spark = get_spark("verify-some")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    failed = False
    for sf in sfs:
        con = duckdb_con(sf)
        for name in names:
            spec = REGISTRY[name]
            try:
                df = qs[name](spark, sf)
                if spec.oracle is None:
                    df.collect()
                    print(f"{sf} {name}: rows-only ok", flush=True)
                    continue
                res = compare(name, df, con, spec.oracle)
                status = "ok" if res.ok else f"MISMATCH s={res.spark_rows} d={res.oracle_rows} {res.detail[:200]}"
                print(f"{sf} {name}: {status}", flush=True)
                failed = failed or not res.ok
            except Exception as e:  # noqa: BLE001
                print(f"{sf} {name}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)
                failed = True
        con.close()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
