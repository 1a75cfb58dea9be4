"""SQL catalog as the serving layer (SURVEY.md §2.1 'MongoDB serving
sink' [intent]): gold tables registered in the metastore and queried
through plain SQL — the Spark-native form of the reference's declared
"fast querying & analytics" store (reference README.md:29-32).
Managed parquet tables + DML (CTAS, INSERT INTO) + catalog
introspection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_project_spark.tables import load


@pytest.fixture()
def gold_table(spark, sf_dir):
    name = "gold_district_stats"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    load(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("revenue"),
    ).write.saveAsTable(name)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_save_as_table_and_sql_read(spark, sf_dir, gold_table):
    got = {r["o_orderstatus"]: r["n"] for r in spark.sql(f"SELECT * FROM {gold_table}").collect()}
    expected = {
        r["o_orderstatus"]: r["n"]
        for r in load(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    assert got == expected


def test_insert_into_appends(spark, gold_table):
    before = spark.table(gold_table).count()
    spark.sql(f"INSERT INTO {gold_table} VALUES ('Z', 0, 0.0)")
    after = spark.table(gold_table)
    assert after.count() == before + 1
    assert after.filter(F.col("o_orderstatus") == "Z").first()["n"] == 0


def test_ctas_from_catalog_table(spark, gold_table):
    spark.sql("DROP TABLE IF EXISTS gold_big_status")
    spark.sql(
        f"CREATE TABLE gold_big_status USING parquet AS "
        f"SELECT o_orderstatus, n FROM {gold_table} WHERE n > 0"
    )
    try:
        assert spark.table("gold_big_status").count() > 0
        # catalog introspection the BI layer relies on
        cols = {c.name for c in spark.catalog.listColumns("gold_big_status")}
        assert cols == {"o_orderstatus", "n"}
        tables = {t.name for t in spark.catalog.listTables()}
        assert "gold_big_status" in tables
    finally:
        spark.sql("DROP TABLE IF EXISTS gold_big_status")


def test_describe_and_show_create(spark, gold_table):
    desc = spark.sql(f"DESCRIBE TABLE {gold_table}").collect()
    assert {r["col_name"] for r in desc} >= {"o_orderstatus", "n", "revenue"}
    ddl = spark.sql(f"SHOW CREATE TABLE {gold_table}").first()[0]
    assert "parquet" in ddl.lower()
