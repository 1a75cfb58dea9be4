"""Measure candidate-volume scaling of the bucketed dedup/ANN family.

The 100 TB argument for LSH/prefix-filter operators is that candidate
PAIRS grow ~linearly with corpus size while the all-pairs baseline
grows quadratically. This probe measures that empirically at
sf0.001 / sf0.01 / sf0.1 using the same SQL fragments the oracles are
built from (DuckDB — both engines provably agree on these
intermediates), and prints a markdown table for SCALE.md.

Usage: python tools/scaling_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bigdata_project_spark.operators.dedup import (
    _SQL_BANDS,
    _SQL_SHINGLES,
    _SQL_SHINGLES_CAPPED,
    _SQL_SIGS,
)
from bigdata_project_spark.operators.similarity import _SQL_NORMED, _SQL_PARAMS
from bigdata_project_spark.operators.similarity import _sql_band_bucket, _N_BANDS, planes_per_band

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def probe(sf_dir: str) -> dict:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    r: dict = {}
    r["n_docs"] = con.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    r["n_vecs"] = con.sql("SELECT COUNT(*) FROM embeddings").fetchone()[0]

    # MinHash-LSH: distinct band-bucket candidate pairs
    r["minhash_cand"] = con.sql(f"""
        WITH {_SQL_SHINGLES},
        sigs AS (SELECT doc_id, {_SQL_SIGS} FROM sh GROUP BY doc_id),
        bands AS ({_SQL_BANDS})
        SELECT COUNT(*) FROM (
            SELECT DISTINCT a.doc_id, b.doc_id AS b_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
    """).fetchone()[0]

    # share-a-shingle pairs, df-capped (what exact n-gram Jaccard joins)
    r["shingle_cand_capped"] = con.sql(f"""
        WITH {_SQL_SHINGLES}, {_SQL_SHINGLES_CAPPED}
        SELECT COUNT(*) FROM (
            SELECT DISTINCT a.doc_id, b.doc_id AS b_id
            FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id)
    """).fetchone()[0]

    # prefix-filter candidates (rarity prefix at J>=1/2, before verify)
    r["prefix_cand"] = con.sql(f"""
        WITH {_SQL_SHINGLES}, {_SQL_SHINGLES_CAPPED},
        dfreq AS (SELECT shingle, COUNT(*) AS df FROM shc GROUP BY shingle),
        ranked AS (
            SELECT s.doc_id, s.shingle, c.n_sh,
                   ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                      ORDER BY d.df, s.shingle) AS r
            FROM shc s JOIN dfreq d USING (shingle)
            JOIN cap_counts c USING (doc_id)
        ),
        pre AS (SELECT * FROM ranked WHERE r <= n_sh - (n_sh + 1) // 2 + 1)
        SELECT COUNT(*) FROM (
            SELECT DISTINCT a.doc_id, b.doc_id AS b_id
            FROM pre a JOIN pre b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             AND 2 * b.n_sh >= a.n_sh AND 2 * a.n_sh >= b.n_sh)
    """).fetchone()[0]

    # banded ANN (3 bands x DERIVED planes, round-7): distinct
    # bucket-join pairs under the data-aware P — the same substr(p)
    # construction the oracle uses, so this measures the shipped plan
    band_rows = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, substr({_sql_band_bucket(b)}, 1, p) AS bucket"
        f" FROM normed, params"
        for b in range(_N_BANDS)
    )
    r["ann_planes"] = planes_per_band(r["n_vecs"])
    r["ann_cand"] = con.sql(f"""
        WITH {_SQL_NORMED}, {_SQL_PARAMS}, bands AS ({band_rows})
        SELECT COUNT(*) FROM (
            SELECT DISTINCT a.vec_id, b.vec_id AS b_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
    """).fetchone()[0]
    con.close()
    return r


def main() -> None:
    rows = []
    for sf in SFS:
        r = probe(sf)
        r["sf"] = sf.rsplit("sf", 1)[-1]
        r["allpairs_docs"] = r["n_docs"] * (r["n_docs"] - 1) // 2
        r["allpairs_vecs"] = r["n_vecs"] * (r["n_vecs"] - 1) // 2
        rows.append(r)
        print(f"probed {sf}: {r}", file=sys.stderr)

    print("| sf | docs | all-pairs | shingle-join (df-capped) | prefix-filter | MinHash-LSH | vecs | all-pairs | banded ANN (P) | ANN cand/vec |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        per_vec = r["ann_cand"] / r["n_vecs"] if r["n_vecs"] else 0.0
        print(
            f"| {r['sf']} | {r['n_docs']:,} | {r['allpairs_docs']:,} "
            f"| {r['shingle_cand_capped']:,} | {r['prefix_cand']:,} | {r['minhash_cand']:,} "
            f"| {r['n_vecs']:,} | {r['allpairs_vecs']:,} | {r['ann_cand']:,} (P={r['ann_planes']}) "
            f"| {per_vec:.2f} |"
        )


if __name__ == "__main__":
    main()
