"""Graph ANN: k-NN-graph build + beam search (operators/graph_ann.py,
round 14).

The oracle gates prove edges, walks, and recall joins value-exactly;
these pin the graph invariants, the beam-monotonicity theorem, and
the measured recall floors (everything is deterministic, so the pins
are exact)."""

from __future__ import annotations

import math

import pytest

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def _q(spark, name, sf):
    from bigdata_project_spark.registry import all_queries

    return all_queries()[name](spark, sf).collect()


@pytest.mark.parametrize("sf", SFS)
def test_graph_invariants(spark, sf):
    """Degree cap respected with contiguous ranks, no self-edges, no
    duplicate edges, cosines in [-1, 1], and (on this testbed, where
    every node has >= G candidates) out-degree exactly G."""
    rows = _q(spark, "sim_graph_knn_build", sf)
    by_src = {}
    seen = set()
    for r in rows:
        assert r["vec_id"] != r["nbr_id"]
        assert -1.0 - 1e-12 <= r["cosine"] <= 1.0 + 1e-12
        assert (r["vec_id"], r["nbr_id"]) not in seen
        seen.add((r["vec_id"], r["nbr_id"]))
        by_src.setdefault(r["vec_id"], []).append(r["rank"])
    from bigdata_project_spark.operators.graph_ann import _G

    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, _G + 1)), (src, ranks)


@pytest.mark.parametrize("sf", SFS)
def test_beam_max_cosine_dominates_entries(spark, sf):
    """The best final result is at least as good as the best entry
    point, per query — a THEOREM of top-B pruning (the best-so-far
    candidate never drops out of a top-B beam, and entries are the
    hop-0 candidates)."""
    import duckdb

    from bigdata_project_spark.operators.graph_ann import _ENTRIES
    from bigdata_project_spark.operators.similarity import _QUERY_IDS

    rows = _q(spark, "sim_graph_beam_search", sf)
    best = {}
    for r in rows:
        q = r["query_id"]
        best[q] = max(best.get(q, -2.0), r["cosine"])
    emb = {
        v: e
        for v, e in duckdb.sql(
            f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet'"
        ).fetchall()
    }

    def cos(a, b):
        # the same left-associated chain the engines use
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
            na += float(x) * float(x)
            nb += float(y) * float(y)
        return dot / (math.sqrt(na) * math.sqrt(nb))

    for q in _QUERY_IDS:
        entry_best = max(
            cos(emb[q], emb[e]) for e in _ENTRIES if e in emb and e != q
        )
        assert best[q] >= entry_best - 1e-12, (q, best[q], entry_best)


def test_recall_measured_floors(spark):
    """Exact measured recall pins (deterministic end to end): the
    graph walk recovers 26/30 true neighbors at sf0.001 and 29/30 at
    sf0.01 — and at the same testbed it BEATS the trained-IVF
    nprobe=2 search (13/30 at sf0.01) while scoring at most
    |entries| + HOPS * (B + B*G) ~ 1.9k candidates per query vs the
    IVF's ~2 cells of the corpus: the equal-budget comparison the
    graph family ships on."""
    hits = {
        sf: sum(r["n_hits"] for r in _q(spark, "sim_recall_graph_at_k", sf))
        for sf in SFS
    }
    assert hits["/root/testdata/sf0.001"] == 26, hits
    assert hits["/root/testdata/sf0.01"] == 29, hits
    ivf = sum(
        r["n_hits"]
        for r in _q(spark, "sim_recall_ivf_trained_at_k", "/root/testdata/sf0.01")
    )
    assert hits["/root/testdata/sf0.01"] > ivf, (hits, ivf)


@pytest.mark.parametrize("sf", SFS)
def test_beam_output_shape(spark, sf):
    """Exactly top-10 rows per query, ranks contiguous, never the
    query itself, ordered by (cosine DESC, vec_id) within query."""
    rows = _q(spark, "sim_graph_beam_search", sf)
    by_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"], r["neighbor_id"]))
    assert len(by_q) == 3
    for q, lst in by_q.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, 11)), (q, lst)
        cosines = [x[1] for x in lst]
        assert cosines == sorted(cosines, reverse=True)
