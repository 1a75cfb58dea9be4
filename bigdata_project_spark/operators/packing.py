"""First-fit-decreasing sequence packing with a waste audit
(SURVEY.md §2.10).

`pack_sequences_by_source` / `pack_sequences_global` (corpus.py)
assign context windows by a running token sum — optimal in window
COUNT only because they let documents straddle window boundaries.
When documents must stay whole (instruction tuning, document-masked
attention), straddle-free packing is bin packing, and the running-sum
order (next-fit) wastes real money in pad tokens. First-fit
decreasing — sort the block's documents by token count descending,
place each into the first window it fits, open a new one otherwise —
is the classic 11/9-OPT heuristic and packs measurably tighter.

Scale design: a sequential fit over 100 TB would serialize, so docs
are packed within BOUNDED blocks — 128 docs (`_FFD_BLOCK`) per (source,
block), the source being the natural shard key the corpus is already
laid out by. Each block's fit is one Arrow `applyInPandas` group
(tiny: a few hundred rows, integer arithmetic), all blocks run in
parallel, and block boundaries cost at most one extra window per
block versus an unbounded fit. The DuckDB oracle replays the EXACT
same deterministic fit with a recursive CTE carrying the per-block
bin-load list — pack ids are value-verified, not just counts.

The audit query computes, per block, the FFD window count and pad
tokens side by side with the next-fit (running-sum arrival-order)
baseline — the "is the smarter packer actually paying for itself"
number. tests/test_packing.py pins ffd <= next-fit on every block.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.operators.corpus import _CTX_TOKENS
from bigdata_project_spark.operators.dedup import words_col
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load

_FFD_BLOCK = 128  # docs per packing block (bounded sequential fit)

_PACKED_SCHEMA = (
    "doc_id long, source string, block_id long, n_tokens long, "
    "pack_id long, nf_pack_id long"
)


def _fit_block(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pack ONE (source, block) group: FFD pack ids plus the next-fit
    baseline's. Deterministic: FFD order is (n_tokens DESC, doc_id),
    first fit scans bins in creation order; next-fit runs in doc_id
    arrival order. A document longer than the capacity opens its own
    window under both policies (load + n <= CAP never admits a
    neighbor)."""
    cap = _CTX_TOKENS
    out = pdf.sort_values(["doc_id"]).reset_index(drop=True)

    # next-fit in arrival order
    nf_ids = []
    cur_load, cur_bin = None, -1
    for n in out["n_tokens"]:
        n = int(n)
        if cur_load is None or cur_load + n > cap:
            cur_bin += 1
            cur_load = n
        else:
            cur_load += n
        nf_ids.append(cur_bin)
    out["nf_pack_id"] = nf_ids

    # first-fit decreasing
    order = out.sort_values(["n_tokens", "doc_id"], ascending=[False, True]).index
    loads: list[int] = []
    pack = {}
    for i in order:
        n = int(out.at[i, "n_tokens"])
        for b, load in enumerate(loads):
            if load + n <= cap:
                loads[b] += n
                pack[i] = b
                break
        else:
            pack[i] = len(loads)
            loads.append(n)
    out["pack_id"] = [pack[i] for i in out.index]
    return out[["doc_id", "source", "block_id", "n_tokens", "pack_id", "nf_pack_id"]]


def _ffd_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # coalesce BEFORE tokenizing: the fit emits a row for every doc,
    # and a NULL text must pack as a 0-token doc, not crash the Arrow
    # fit with a NaN token count (null-twin gate)
    toks = docs.select(
        "doc_id",
        "source",
        F.size(words_col(F.coalesce(F.col("text"), F.lit("")))).cast("long").alias("n_tokens"),
    )
    wb = W.partitionBy("source").orderBy("doc_id")
    blocked = toks.withColumn(
        "block_id", ((F.row_number().over(wb) - 1) / _FFD_BLOCK).cast("long")
    )
    return blocked.groupBy("source", "block_id").applyInPandas(
        _fit_block, _PACKED_SCHEMA
    )


_SQL_TOKS_BLOCKED = f"""
    toks AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                               x -> x <> '')) AS n_tokens
        FROM documents
    ),
    blocked AS (
        SELECT doc_id, source, n_tokens,
               CAST((ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)
                    // {_FFD_BLOCK} AS BIGINT) AS block_id
        FROM toks
    )
"""

# FFD replay: the recursive CTE advances each block one document per
# iteration, carrying the bin-load list. NULLIF guards DuckDB's
# list_position returning 0 (not NULL) on no-fit.
_SQL_FFD_FIT = f"""
    seq AS (
        SELECT source, block_id, doc_id, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY source, block_id
                                  ORDER BY n_tokens DESC, doc_id) AS rn
        FROM blocked
    ),
    fit(source, block_id, rn, doc_id, n_tokens, pack_id, loads) AS (
        SELECT source, block_id, rn, doc_id, n_tokens, CAST(0 AS BIGINT), [n_tokens]
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.source, s.block_id, s.rn, s.doc_id, s.n_tokens,
               CAST(CASE WHEN ff.k IS NULL THEN len(f.loads) ELSE ff.k - 1 END AS BIGINT),
               CASE WHEN ff.k IS NULL THEN list_append(f.loads, s.n_tokens)
                    ELSE f.loads[1:ff.k-1] || [f.loads[ff.k] + s.n_tokens]
                         || f.loads[ff.k+1:len(f.loads)]
               END
        FROM fit f
        JOIN seq s ON s.source = f.source AND s.block_id = f.block_id
                  AND s.rn = f.rn + 1,
        LATERAL (SELECT NULLIF(list_position(
                     list_transform(f.loads, l -> l + s.n_tokens <= {_CTX_TOKENS}),
                     true), 0) AS k) ff
    )
"""

_SQL_NF_FIT = f"""
    arr AS (
        SELECT source, block_id, doc_id, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY source, block_id ORDER BY doc_id) AS a
        FROM blocked
    ),
    nf(source, block_id, a, doc_id, n_tokens, nf_pack_id, cur_load) AS (
        SELECT source, block_id, a, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
        FROM arr WHERE a = 1
        UNION ALL
        SELECT s.source, s.block_id, s.a, s.doc_id, s.n_tokens,
               CASE WHEN f.cur_load + s.n_tokens <= {_CTX_TOKENS}
                    THEN f.nf_pack_id ELSE f.nf_pack_id + 1 END,
               CASE WHEN f.cur_load + s.n_tokens <= {_CTX_TOKENS}
                    THEN f.cur_load + s.n_tokens ELSE s.n_tokens END
        FROM nf f
        JOIN arr s ON s.source = f.source AND s.block_id = f.block_id
                  AND s.a = f.a + 1
    )
"""


@query(
    "pack_sequences_ffd",
    oracle=f"""
    WITH RECURSIVE {_SQL_TOKS_BLOCKED},
    {_SQL_FFD_FIT}
    SELECT doc_id, source, block_id, n_tokens, pack_id FROM fit
    """,
    tags=("llm", "packing", "udf"),
)
def pack_sequences_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Straddle-free sequence packing, first-fit decreasing within
    bounded per-source blocks (module docstring): every document gets
    a (block_id, pack_id) window assignment it fits in WHOLE. The
    oracle replays the identical deterministic fit via a recursive
    CTE, so each document's pack id is value-checked."""
    return _ffd_packed(spark, sf_dir).select(
        "doc_id", "source", "block_id", "n_tokens", "pack_id"
    )


@query(
    "pack_ffd_waste_audit",
    oracle=f"""
    WITH RECURSIVE {_SQL_TOKS_BLOCKED},
    {_SQL_FFD_FIT},
    {_SQL_NF_FIT}
    SELECT f.source, f.block_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f.n_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(f.pack_id) + 1 AS BIGINT) AS ffd_packs,
           CAST(MAX(n2.nf_pack_id) + 1 AS BIGINT) AS nextfit_packs,
           CAST((MAX(f.pack_id) + 1) * {_CTX_TOKENS} - SUM(f.n_tokens) AS BIGINT)
             AS ffd_pad_tokens,
           CAST((MAX(n2.nf_pack_id) + 1) * {_CTX_TOKENS} - SUM(f.n_tokens) AS BIGINT)
             AS nextfit_pad_tokens
    FROM fit f JOIN nf n2 ON n2.doc_id = f.doc_id
    GROUP BY f.source, f.block_id
    """,
    tags=("llm", "packing", "audit", "udf"),
)
def pack_ffd_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block packing-efficiency audit: FFD vs the next-fit
    (running-sum) baseline, in windows used and pad tokens burned —
    the number that justifies the smarter packer. Both fits come
    from the same Arrow pass; the oracle replays both recursions
    and re-aggregates, so the audit itself is value-verified."""
    packed = _ffd_packed(spark, sf_dir)
    return packed.groupBy("source", "block_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.max("pack_id") + 1).cast("long").alias("ffd_packs"),
        (F.max("nf_pack_id") + 1).cast("long").alias("nextfit_packs"),
        ((F.max("pack_id") + 1) * _CTX_TOKENS - F.sum("n_tokens"))
        .cast("long")
        .alias("ffd_pad_tokens"),
        ((F.max("nf_pack_id") + 1) * _CTX_TOKENS - F.sum("n_tokens"))
        .cast("long")
        .alias("nextfit_pad_tokens"),
    )


@query(
    "pack_ffd_global_ids",
    oracle=f"""
    WITH RECURSIVE {_SQL_TOKS_BLOCKED},
    {_SQL_FFD_FIT},
    per_block AS (
        SELECT source, block_id, MAX(pack_id) + 1 AS n_packs
        FROM fit GROUP BY source, block_id
    ),
    offsets AS (
        SELECT source, block_id,
               CAST(COALESCE(SUM(n_packs) OVER (
                   ORDER BY source, block_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS pack_offset
        FROM per_block
    )
    SELECT f.doc_id, f.source, f.block_id, f.pack_id,
           CAST(o.pack_offset + f.pack_id AS BIGINT) AS global_pack_id
    FROM fit f JOIN offsets o
      ON o.source = f.source AND o.block_id = f.block_id
    """,
    tags=("llm", "packing", "udf"),
)
def pack_ffd_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide window numbering over the FFD packing — what a
    training-manifest writer needs (one flat pack id space) — via
    the same two-stage pattern as pack_sequences_global: blocks pack
    in parallel, per-block pack COUNTS reduce to a tiny table, a
    running offset over that table (the only SinglePartition work:
    #blocks rows) broadcasts back. global_pack_id = block offset +
    local pack id — exactly the numbering a serial corpus-wide FFD
    block sweep would emit, with zero global sorts of documents."""
    packed = _ffd_packed(spark, sf_dir)
    per_block = packed.groupBy("source", "block_id").agg(
        (F.max("pack_id") + 1).cast("long").alias("n_packs")
    )
    w = W.orderBy("source", "block_id").rowsBetween(W.unboundedPreceding, -1)
    offsets = per_block.select(
        "source",
        "block_id",
        F.coalesce(F.sum("n_packs").over(w), F.lit(0)).cast("long").alias("pack_offset"),
    )
    return packed.join(F.broadcast(offsets), ["source", "block_id"]).select(
        "doc_id",
        "source",
        "block_id",
        "pack_id",
        (F.col("pack_offset") + F.col("pack_id")).cast("long").alias("global_pack_id"),
    )
