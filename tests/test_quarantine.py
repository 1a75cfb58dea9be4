"""Quarantine gate queries on poisoned twins.

The full-registry degenerate sweeps deliberately have NO time-poisoned
twin: out-of-window timestamps are where the engines' bucketing idioms
genuinely diverge (floor vs truncate pre-epoch), so the windowed tier
is GATED from that range rather than hardened to it. The gate queries
are the one part of the registry that must stay oracle-green ON the
poisoned data itself — that is their job — so they get their own twin
here (batch summary + the streaming gate whose clean side feeds a
watermarked window).
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle import compare


@pytest.fixture(scope="module")
def timepoison_sf_dir(tmp_path_factory, sf_dir) -> str:
    """Twin with ~2% pre-epoch ts (seconds-vs-micros parser confusion),
    ~1% far-future ts (watermark poison), ~2% NaN value, ~1% NULL ts —
    all four routing classes populated."""
    from bigdata_project_spark.tables import TABLES

    dst = tmp_path_factory.mktemp("timepoison_sf")
    con = duckdb.connect()
    try:
        for t in TABLES:
            if t != "events":
                con.execute(
                    f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
                )
        con.execute(f"""
            COPY (
                SELECT * REPLACE (
                    CASE
                        WHEN hash(CAST(event_id AS VARCHAR) || 'tp') % 100 < 2
                            THEN TIMESTAMP '1969-12-31 22:30:00'
                        WHEN hash(CAST(event_id AS VARCHAR) || 'tp') % 100 < 3
                            THEN TIMESTAMP '2036-06-01 00:00:00'
                        WHEN hash(CAST(event_id AS VARCHAR) || 'tp') % 100 < 4
                            THEN NULL
                        ELSE ts
                    END AS ts,
                    CASE
                        -- bucket 2 overlaps: far-future ts AND NaN value,
                        -- so the documented 'ts_out_of_bounds wins over
                        -- nonfinite_measure' precedence is exercised
                        -- cross-engine, not just disjoint classes
                        WHEN hash(CAST(event_id AS VARCHAR) || 'tp') % 100 = 2
                          OR hash(CAST(event_id AS VARCHAR) || 'tp') % 100 BETWEEN 4 AND 5
                            THEN 'NaN'::DOUBLE
                        ELSE value
                    END AS value
                ) FROM '{sf_dir}/events.parquet'
            ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """)
    finally:
        con.close()
    return str(dst)


@pytest.mark.parametrize(
    "name", ["silver_quarantine_split", "stream_quarantine_gated_daily"]
)
def test_gate_queries_stay_green_on_time_poisoned_twin(spark, timepoison_sf_dir, name):
    from bigdata_project_spark.registry import REGISTRY, all_queries
    from tests.oracle import duckdb_con

    con = duckdb_con(timepoison_sf_dir)
    try:
        df = all_queries()[name](spark, timepoison_sf_dir)
        res = compare(name, df, con, REGISTRY[name].oracle)
        assert res.ok, res.detail
        rows = df.collect()
    finally:
        con.close()
    reasons = {r["reason"] for r in rows}
    # every routing class is exercised, not vacuously green
    assert "ts_out_of_bounds" in reasons
    assert "nonfinite_measure:value" in reasons
    assert "clean" in reasons


def test_streaming_gate_protects_the_watermark(spark, timepoison_sf_dir):
    """The clean side of the streaming gate must count EVERY in-bounds
    event — i.e. the far-future sentinels did NOT advance the
    watermark and evict legitimate rows (run ungated, they would)."""
    import pyspark.sql.functions as F

    from bigdata_project_spark.registry import all_queries
    from bigdata_project_spark.tables import load

    out = all_queries()["stream_quarantine_gated_daily"](spark, timepoison_sf_dir)
    clean_total = (
        out.filter(F.col("reason") == "clean").agg(F.sum("n_rows")).first()[0]
    )
    expected = (
        load(spark, timepoison_sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & (F.col("ts") >= F.lit("1990-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2035-01-01").cast("timestamp"))
            & ~(F.isnan("value") | (F.abs("value") == F.lit(float("inf"))))
        )
        .count()
    )
    assert clean_total == expected
