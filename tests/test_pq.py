"""Product-quantization index (operators/pq.py) quality properties.

The oracle gate proves codes, ADC ranking, rerank, and both recall
evals bit-exactly against the SQL replay; these pin what the hash
can't:

- the refine stage can only help: rerank recall >= raw-ADC recall
  per query is a THEOREM (ADC top-k is a subset of the shortlist,
  and exact rescoring surfaces every ground-truth member the
  shortlist contains), so a violation means the pipeline is wired
  wrong even if each stage hashes clean;
- the shipped two-stage search clears a recall floor on the
  deterministic testbed (quality regression guard);
- the codebook is actually used: every (subspace, codeword) bin is
  populated at sf0.01, so the argmin isn't degenerate.
"""

from __future__ import annotations


def _rows(df):
    return {r["query_id"]: (r["n_hits"], r["recall"]) for r in df.collect()}


def test_rerank_recall_dominates_adc_recall(spark, sf_dir):
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    adc = _rows(qs["sim_recall_pq_at_k"](spark, sf_dir))
    rr = _rows(qs["sim_recall_pq_rerank_at_k"](spark, sf_dir))
    assert set(adc) == set(rr)
    for q in adc:
        assert rr[q][0] >= adc[q][0], (q, adc[q], rr[q])


def test_rerank_recall_floor(spark, sf_dir):
    """Observed 0.6/0.9/0.7 at sf0.01 and 0.6/0.4/0.5 at sf0.001
    (different data draws); the testbeds are deterministic, so pin a
    conservative floor as a quality-regression guard."""
    from bigdata_project_spark.registry import all_queries

    rr = _rows(all_queries()["sim_recall_pq_rerank_at_k"](spark, sf_dir))
    assert all(rec >= 0.4 for _n, rec in rr.values()), rr


def test_codes_populate_every_bin(spark, sf_dir):
    """All 4 subspaces x 16 codewords appear among the encoded
    corpus at sf0.01 — the codebook isn't collapsing to a few
    degenerate cells."""
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["sim_pq_codes"](spark, sf_dir).collect()
    assert len(rows) == 500
    for j in range(4):
        vals = {r[f"c{j}"] for r in rows}
        assert vals == set(range(16)), (j, sorted(vals))


def test_ivfpq_candidates_confined_to_probed_cell(spark, sf_dir):
    """The composed search must never score a vector outside the
    query's probed cell — the scan-fraction claim is structural, not
    statistical. Re-derive each query's probed cell from the
    registered IVF probe and check every IVF-PQ neighbor lives there."""
    from bigdata_project_spark.registry import all_queries
    from bigdata_project_spark.tables import load

    qs = all_queries()
    # probed cell per query via the IVF probe's candidates' labels
    labels = {
        r["vec_id"]: r["label"]
        for r in load(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    ivf = qs["sim_ann_ivf_probe"](spark, sf_dir).collect()
    cell_of = {}
    for r in ivf:
        cell_of.setdefault(r["query_id"], labels[r["vec_id"]])
    got = qs["sim_ivfpq_search"](spark, sf_dir).collect()
    assert got
    for r in got:
        assert labels[r["neighbor_id"]] == cell_of[r["query_id"]], dict(r.asDict())


def test_ivfpq_rerank_recovers_cell_ceiling(spark, sf_dir):
    """With the in-cell shortlist covering the whole cell at test
    scale, the refined IVF-PQ recall must (a) dominate the raw
    composed recall and (b) equal the IVF-alone cell ceiling: every
    ground-truth neighbor the probed cell contains is recovered, so
    the PQ quantization loss is fully refunded by the refine stage."""
    from bigdata_project_spark.registry import all_queries
    from bigdata_project_spark.tables import load

    qs = all_queries()
    raw = _rows(qs["sim_recall_ivfpq_at_k"](spark, sf_dir))
    ref = _rows(qs["sim_recall_ivfpq_rerank_at_k"](spark, sf_dir))
    assert set(raw) == set(ref)
    for q in raw:
        assert ref[q][0] >= raw[q][0], (q, raw[q], ref[q])
    # cell ceiling: |probed cell ∩ GT top-10| per query, re-derived
    labels = {
        r["vec_id"]: r["label"]
        for r in load(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    gt = {}
    for r in qs["sim_knn_bruteforce"](spark, sf_dir).collect():
        gt.setdefault(r["query_id"], set()).add(r["vec_id"])
    cell_of = {}
    for r in qs["sim_ann_ivf_probe"](spark, sf_dir).collect():
        cell_of.setdefault(r["query_id"], labels[r["vec_id"]])
    for q, (n_hits, _rec) in ref.items():
        ceiling = sum(1 for v in gt[q] if labels[v] == cell_of[q])
        assert n_hits == ceiling, (q, n_hits, ceiling)


def test_nprobe2_recall_dominates_nprobe1(spark, sf_dir):
    """Probing a second cell can only add candidates (each corpus
    vector lives in exactly one cell, so the nprobe=1 pool is a
    subset of the nprobe=2 pool), and the refine stage rescores
    exactly — so refined recall at nprobe=2 must dominate nprobe=1
    per query. A violation means the probe stage is wired wrong."""
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    p1 = _rows(qs["sim_recall_ivfpq_rerank_at_k"](spark, sf_dir))
    p2 = _rows(qs["sim_recall_ivfpq_nprobe2_at_k"](spark, sf_dir))
    assert set(p1) == set(p2)
    for q in p1:
        assert p2[q][0] >= p1[q][0], (q, p1[q], p2[q])


def test_nprobe2_rerank_recovers_two_cell_ceiling(spark, sf_dir):
    """The r10 single-cell ceiling theorem, at nprobe=2: with the
    shortlist covering both probed cells at test scale, refined
    recall must EQUAL the 2-cell ceiling — every ground-truth
    neighbor living in either probed cell is recovered. The probed
    cell pair is re-derived independently from the plain-IVF nprobe=2
    probe (same centroid construction), so the equality also pins
    that the composed search probes the same cells as IVF alone."""
    from bigdata_project_spark.registry import all_queries
    from bigdata_project_spark.tables import load

    qs = all_queries()
    ref = _rows(qs["sim_recall_ivfpq_nprobe2_at_k"](spark, sf_dir))
    labels = {
        r["vec_id"]: r["label"]
        for r in load(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    gt = {}
    for r in qs["sim_knn_bruteforce"](spark, sf_dir).collect():
        gt.setdefault(r["query_id"], set()).add(r["vec_id"])
    cells_of = {}
    for r in qs["sim_ann_ivf_nprobe2"](spark, sf_dir).collect():
        cells_of.setdefault(r["query_id"], set()).add(labels[r["vec_id"]])
    for q, (n_hits, _rec) in ref.items():
        ceiling = sum(1 for v in gt[q] if labels[v] in cells_of[q])
        assert n_hits == ceiling, (q, n_hits, ceiling)
