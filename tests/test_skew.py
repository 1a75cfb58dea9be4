"""Salting operators: results must equal the unsalted plans while
spreading hot keys over n_salts shuffle buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_project_spark.exact import dsum
from bigdata_project_spark.operators.skew import salted_join, two_stage_agg
from bigdata_project_spark.tables import load


def test_salted_join_equals_plain(spark, sf_dir):
    ev = load(spark, sf_dir, "events")  # user_id-heavy fact stand-in
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 5.0), ("signup", 3.0), ("error", 0.0)],
        ["event_type", "weight"],
    )
    plain = (
        ev.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value") * F.col("weight")).alias("wv"))
    )
    salted = (
        salted_join(ev, dim, key="event_type", n_salts=8, salt_source="event_id")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value") * F.col("weight")).alias("wv"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_stage_agg_equals_plain(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    plain = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.countDistinct("user_id").alias("nu")
    )
    # exact distinct via salted two-stage: partial collect_set, merge
    # as distinct-of-union (the case partial aggregation can't shrink)
    staged = two_stage_agg(
        ev,
        key="event_type",
        aggs={
            "n": (F.count("*"), F.sum("n")),
            "nu_set": (F.collect_set("user_id"), F.size(F.array_distinct(F.flatten(F.collect_list("nu_set"))))),
        },
        n_salts=8,
        salt_source="event_id",
    ).withColumnRenamed("nu_set", "nu")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, staged.collect()))


def test_salted_join_spreads_key(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    dim = spark.createDataFrame([("click", 1.0)], ["event_type", "weight"])
    out = salted_join(ev, dim, key="event_type", n_salts=8, salt_source="event_id")
    # the single hot key actually uses multiple salt buckets
    n_buckets = (
        ev.join(dim, "event_type")
        .withColumn("_salt", F.pmod(F.hash("event_id"), F.lit(8)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets == 8
    assert out.count() == ev.filter(F.col("event_type") == "click").count()
