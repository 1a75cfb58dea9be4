"""Property-based spot checks (SURVEY.md §5.5): structural invariants
that must hold for arbitrary inputs — rollup margin consistency,
multiset set-op complementarity, dedup idempotence, rank bijection.
Few examples per property (each example is a Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

rows_strategy = st.lists(
    st.tuples(st.sampled_from("abc"), st.sampled_from("xy"), st.integers(-1000, 1000)),
    min_size=1,
    max_size=30,
)

_settings = settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))


@given(rows=rows_strategy)
@_settings
def test_rollup_margins_consistent(spark, rows):
    df = spark.createDataFrame(rows, ["g1", "g2", "v"])
    rolled = {
        (r["g1"], r["g2"]): r["s"]
        for r in df.rollup("g1", "g2").agg(F.sum("v").alias("s")).collect()
    }
    plain = df.groupBy("g1", "g2").agg(F.sum("v").alias("s")).collect()
    # leaf cells match plain groupBy
    for r in plain:
        assert rolled[(r["g1"], r["g2"])] == r["s"]
    # level-1 margins are sums of their leaves; grand total sums everything
    by_g1 = df.groupBy("g1").agg(F.sum("v").alias("s")).collect()
    for r in by_g1:
        assert rolled[(r["g1"], None)] == r["s"]
    assert rolled[(None, None)] == sum(v for _, _, v in rows)


@given(
    a=st.lists(st.integers(0, 5), min_size=0, max_size=20),
    b=st.lists(st.integers(0, 5), min_size=0, max_size=20),
)
@_settings
def test_multiset_setop_complementarity(spark, a, b):
    # |A| == |A INTERSECT ALL B| + |A EXCEPT ALL B|
    dfa = spark.createDataFrame([(x,) for x in a], "v int") if a else spark.createDataFrame([], "v int")
    dfb = spark.createDataFrame([(x,) for x in b], "v int") if b else spark.createDataFrame([], "v int")
    inter = dfa.intersectAll(dfb).count()
    diff = dfa.exceptAll(dfb).count()
    assert inter + diff == len(a)


@given(rows=rows_strategy)
@_settings
def test_dedup_idempotent_and_minimal(spark, rows):
    df = spark.createDataFrame(rows, ["g1", "g2", "v"])
    d1 = df.dropDuplicates(["g1", "g2"])
    assert d1.count() == d1.dropDuplicates(["g1", "g2"]).count()
    assert d1.count() == len({(g1, g2) for g1, g2, _ in rows})


@given(rows=rows_strategy)
@_settings
def test_row_number_is_per_group_bijection(spark, rows):
    df = spark.createDataFrame(list(enumerate(rows)), "idx int, r struct<g1:string,g2:string,v:int>").select(
        "idx", "r.g1", "r.v"
    )
    w = W.partitionBy("g1").orderBy("v", "idx")
    out = df.select("g1", F.row_number().over(w).alias("rn")).collect()
    per_group: dict[str, list[int]] = {}
    for r in out:
        per_group.setdefault(r["g1"], []).append(r["rn"])
    for g, rns in per_group.items():
        assert sorted(rns) == list(range(1, len(rns) + 1))
