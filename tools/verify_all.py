"""Full-registry oracle verification at every testbed scale, one command.

Replays what the external harness does — every `queries()` entry vs
its `oracle_sql()` DuckDB twin, row-count + columns + order-insensitive
canonical value multiset — across all three scale factors. This is the
closing check each round runs after any query/oracle change; ~2-4 min
per small scale, ~10 min at sf0.1.

Usage: python tools/verify_all.py [sf_dir ...]   (default: all three)
Exit code 0 iff every oracled query matches at every scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    from bigdata_project_spark.registry import REGISTRY, _ensure_loaded, all_queries
    from bigdata_project_spark.session import get_spark
    from oracle import compare, duckdb_con

    _ensure_loaded()
    spark = get_spark("verify-all")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    sfs = sys.argv[1:] or DEFAULT_SFS
    failed = False
    for sf in sfs:
        con = duckdb_con(sf)
        bad: list[str] = []
        for name, spec in REGISTRY.items():
            try:
                df = qs[name](spark, sf)
                if spec.oracle is None:
                    df.collect()  # rows-only: crash check
                    continue
                res = compare(name, df, con, spec.oracle)
                if not res.ok:
                    bad.append(f"  {name}: s={res.spark_rows} d={res.oracle_rows} {res.detail[:160]}")
            except Exception as e:  # noqa: BLE001
                bad.append(f"  {name}: {type(e).__name__}: {str(e)[:160]}")
        con.close()
        print(f"{sf}: {len(REGISTRY) - len(bad)}/{len(REGISTRY)} ok", flush=True)
        if bad:
            failed = True
            print("\n".join(bad), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
