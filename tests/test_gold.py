"""Gold layer build: materialized tables equal their source queries
and round-trip through parquet; plus the CSV sink parity row
(SURVEY.md §2.1) — header + quoted multi-line text survives."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_project_spark.gold import GOLD_TABLES, build_gold
from bigdata_project_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_build_gold_roundtrip(spark, sf_dir, tmp_path):
    paths = build_gold(spark, sf_dir, str(tmp_path / "gold"))
    assert set(paths) == set(GOLD_TABLES.values())
    key = lambda row: tuple(str(v) for v in row)  # noqa: E731  (rollup rows contain None)
    for query_name, table in GOLD_TABLES.items():
        back = spark.read.parquet(paths[table])
        src = REGISTRY[query_name].fn(spark, sf_dir)
        assert sorted(map(tuple, back.collect()), key=key) == sorted(map(tuple, src.collect()), key=key), table


def test_csv_sink_multiline_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "one line", 5.0), (2, "two\nlines, with comma", None), (3, 'quote " inside', 7.5)],
        ["id", "description", "score"],
    )
    out = str(tmp_path / "csv")
    df.coalesce(1).write.option("header", True).option("escape", '"').csv(out)
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .schema(df.schema)
        .csv(out)
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # null round-trips as empty string -> null (reference CSV convention)
    assert back.filter(F.col("score").isNull()).count() == 1
