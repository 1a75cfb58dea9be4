"""Trained IVF coarse quantizer (operators/kmeans.py) quality
properties.

The oracle gate proves the seeded init, both Lloyd iterations, and
the final assignment bit-exactly against the SQL replay; these pin
what the hash can't:

- training EARNS its place: aggregate recall@10 of the trained-cell
  IVF search >= the label-cell search at identical k=10, nprobe=2,
  and in-cell top-5 (the reason FAISS trains the coarse quantizer
  instead of partitioning by metadata) — measured at two SFs.
- Lloyd iterations IMPROVE the objective: total within-cell squared
  distance is non-increasing from the assignment against the seeded
  centroids to the final assignment (the k-means descent property,
  measured on the actual pipeline, allowing exact ties).
- the partition is real: every cell non-empty at test scale, every
  vector assigned exactly once, cells within 0..k-1.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def _hits(df):
    return {r["query_id"]: r["n_hits"] for r in df.collect()}


@pytest.mark.parametrize("sf", SFS)
def test_trained_cells_beat_label_cells_at_same_budget(spark, sf):
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    trained = _hits(qs["sim_recall_ivf_trained_at_k"](spark, sf))
    label = _hits(qs["sim_recall_ivf2_at_k"](spark, sf))
    assert set(trained) == set(label)
    assert sum(trained.values()) >= sum(label.values()), (trained, label)


def test_lloyd_iterations_do_not_increase_objective(spark, sf_dir):
    from bigdata_project_spark.operators.kmeans import (
        _km_assign,
        _km_trained,
    )
    from bigdata_project_spark.caching import tracked_persist
    from bigdata_project_spark.operators.pq import _pq_unit
    from bigdata_project_spark.operators.kmeans import _K

    unit = tracked_persist(_pq_unit(spark, sf_dir).select("vec_id", "u"))
    from pyspark.sql.window import Window as W

    seeded = unit.select(
        "vec_id", "u", F.md5(F.col("vec_id").cast("string")).alias("h")
    ).orderBy("h", "vec_id").limit(_K)
    w10 = W.orderBy("h", "vec_id")
    cent0 = seeded.select(
        (F.row_number().over(w10) - 1).alias("cid"), F.col("u").alias("c_arr")
    )
    obj0 = (
        _km_assign(unit, cent0, keep_dist=True)
        .agg(F.sum("dist"))
        .first()[0]
    )
    cent, unit2 = _km_trained(spark, sf_dir)
    objN = (
        _km_assign(unit2, cent, keep_dist=True).agg(F.sum("dist")).first()[0]
    )
    assert objN <= obj0, (objN, obj0)


def test_trained_partition_is_total_and_in_range(spark, sf_dir):
    from bigdata_project_spark.operators.kmeans import _K
    from bigdata_project_spark.registry import all_queries
    from bigdata_project_spark.tables import load

    cells = all_queries()["sim_ivf_trained_cells"](spark, sf_dir)
    rows = cells.collect()
    n_vec = load(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vec  # every vector assigned exactly once
    seen = {r["cell"] for r in rows}
    assert seen == set(range(_K)), seen  # all cells live, in range
    assert all(r["dist"] >= 0.0 for r in rows)
