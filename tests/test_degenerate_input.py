"""Degenerate-input gate: the full registry on ZERO-ROW tables.

Empty input is the sharpest cross-engine divergence probe — global
vs grouped aggregates (1 row vs 0), rollup/cube grand-total rows,
scalar subqueries feeding cross joins, COALESCE defaults, window
frames — and a bug of exactly this class shipped in round 5
(`events_ab_test_zflag`: Spark's inner cross-join of two 1-row
variant aggregates returned 0 rows while the oracle's
scalar-subquery form returned 1 row of NULLs when a variant was
empty; found by the round-6 advisor, fixed via conditional
aggregation over the 2-row rollup). This gate runs every registered
query AND its DuckDB oracle over a schema-identical zero-row
testbed and requires the same answer from both engines, so the next
degenerate-case divergence is a local red, not an advisor finding.

Scale note: this is pure semantics hygiene — no plan on real data
changes — but it is what lets an operator library be trusted inside
a 1000-table pipeline where *some* intermediate genuinely is empty
(a filter that matched nothing, a day with no events).
"""

from __future__ import annotations

import pytest

from bigdata_project_spark.registry import REGISTRY, _ensure_loaded, all_queries

from tests.oracle import compare, duckdb_con

_ensure_loaded()


def _tools_module(name: str):
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parent.parent / "tools" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir) -> str:
    """Zero-row parquet twin of the testbed (schema from the suite's
    sf_dir), built by the same code as the standalone auditor so the
    gate and the tool cannot drift."""
    dst = tmp_path_factory.mktemp("empty_sf")
    _tools_module("empty_sweep").build_empty_testbed(src=sf_dir, dst=str(dst))
    return str(dst)


def _sweep(spark, sf_dir: str) -> list[str]:
    qs = all_queries()
    con = duckdb_con(sf_dir)
    bad: list[str] = []
    try:
        for name, spec in REGISTRY.items():
            try:
                df = qs[name](spark, sf_dir)
                if spec.oracle is None:
                    df.collect()  # rows-only queries: crash check
                    continue
                res = compare(name, df, con, spec.oracle)
                if not res.ok:
                    bad.append(
                        f"{name}: spark={res.spark_rows} oracle={res.oracle_rows} {res.detail[:160]}"
                    )
            except Exception as e:  # noqa: BLE001
                bad.append(f"{name}: {type(e).__name__}: {str(e)[:160]}")
    finally:
        con.close()
    return bad


def test_every_query_agrees_with_oracle_on_empty_input(spark, empty_sf_dir):
    bad = _sweep(spark, empty_sf_dir)
    assert not bad, "zero-row divergences:\n" + "\n".join(bad)


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory, sf_dir) -> str:
    """Twin of the suite's sf_dir with deterministic NULLs in payload
    columns (never keys / ordering columns / event-time — see
    tools/null_sweep.py for the injection map and rationale)."""
    dst = tmp_path_factory.mktemp("null_sf")
    _tools_module("null_sweep").build_null_testbed(src=sf_dir, dst=str(dst))
    return str(dst)


def test_every_query_agrees_with_oracle_on_null_payloads(spark, null_sf_dir):
    """The driver testbed has ZERO nulls in any column, so the 270
    oracle matches prove nothing about null handling. This gate found
    8 real defects on first run: 3 Python-worker crashes (bytes(None)
    in the multimodal decode UDF, text.lower() on None in the
    tokenizer UDTF), a NaN seeding `best` in the stateful max-jump
    (NaN then poisons every later comparison), vacuously-undominated
    NULL rows in the Pareto skyline, DuckDB LEAST() silently skipping
    NULL args in the quality score, a null-poisoned map_filter count,
    and a COALESCE swallowing NULL input in the regexp family."""
    bad = _sweep(spark, null_sf_dir)
    assert not bad, "null-input divergences:\n" + "\n".join(bad)
