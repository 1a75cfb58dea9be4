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


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
@_settings
def test_morton_key_is_bijective_and_order_preserving(spark, pts):
    # the Z-order key must be collision-free over distinct (x, y) and
    # each coordinate must be recoverable from its even/odd bits
    from bigdata_project_spark.operators.corpus_ext import _morton_sql

    df = spark.createDataFrame(pts, ["x", "y"])
    keyed = df.selectExpr("x", "y", f"({_morton_sql('x', 'y')}) AS z").collect()
    seen = set()
    for r in keyed:
        assert r["z"] not in seen
        seen.add(r["z"])
        x_back = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(16))
        y_back = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (x_back, y_back) == (r["x"], r["y"])


@given(
    dims=st.lists(
        st.tuples(st.integers(1, 4096), st.integers(1, 4096)),
        min_size=1,
        max_size=40,
    )
)
@_settings
def test_resize_plan_bounds_and_aspect(spark, dims):
    # scaled outputs never exceed the box, never hit zero, and keep
    # aspect ratio within the 1-pixel floor tolerance
    df = spark.createDataFrame(dims, ["src_w", "src_h"])
    out = df.selectExpr(
        "src_w",
        "src_h",
        "CASE WHEN greatest(src_w, src_h) <= 224 THEN src_w "
        "ELSE greatest((src_w * 224) div greatest(src_w, src_h), 1) END AS out_w",
        "CASE WHEN greatest(src_w, src_h) <= 224 THEN src_h "
        "ELSE greatest((src_h * 224) div greatest(src_w, src_h), 1) END AS out_h",
    ).collect()
    for r in out:
        assert 0 < r["out_w"] <= max(224, r["src_w"])
        assert 0 < r["out_h"] <= max(224, r["src_h"])
        if max(r["src_w"], r["src_h"]) > 224:
            assert max(r["out_w"], r["out_h"]) == 224
            if min(r["out_w"], r["out_h"]) == 1:
                continue  # clamped degenerate aspect; ratio check n/a
            # floor(w*224/m) / floor(h*224/m) ~ w/h within 1px slack
            assert abs(r["out_w"] * r["src_h"] - r["out_h"] * r["src_w"]) <= max(
                r["src_w"], r["src_h"]
            )


@given(
    counts=st.lists(st.integers(1, 50), min_size=4, max_size=12),
    x=st.integers(1, 500),
)
@_settings
def test_anomaly_integer_inequality_matches_float_zscore(spark, counts, x):
    # the division-free integer form must agree with the float z-score
    # formulation except exactly at the boundary (where float is
    # implementation-defined and the integer form is the spec)
    n = len(counts)
    s = sum(counts)
    q = sum(c * c for c in counts)
    lhs = (n * x - s) ** 2 * (n - 1)
    rhs = 4 * n * (n * q - s * s)
    mean = s / n
    var = (q - s * s / n) / (n - 1)
    if var > 0:
        z2 = (x - mean) ** 2 / var
        if abs(z2 - 4.0) > 1e-9:  # away from the boundary they must agree
            assert (lhs > rhs) == (z2 > 4.0)
