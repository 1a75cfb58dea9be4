"""Hybrid retrieval: lexical x dense rank fusion (round 9).

A training-data pipeline retrieves with BOTH signals — BM25 for
lexical precision, embeddings for semantic recall — and fuses the
two ranked lists. Reciprocal Rank Fusion (Cormack et al., SIGIR'09:
score(d) = sum over lists of 1/(k + rank_d), k = 60) is the standard
fusion because it needs no score calibration between the lists, only
ranks — which makes it exactly reproducible cross-engine: both
engines produce bit-identical BM25 scores (log-free rational IDF,
`operators/text.py`) and bit-identical cosines (fixed-association
double chains, `operators/similarity.py`), ranks follow from total
orders on those, and 1/(60 + rank) on integer ranks divides
identically everywhere.

The dense query vector is the corpus centroid (integer-quantized
mean, exact cross-engine — the `semdedup` centroid discipline): a
deterministic stand-in for an encoder-produced query embedding. The
lexical query is text.py's fixed BM25 query ('data join stream').

Scale: each leg is a corpus scan reduced to a top-R ranked list
(TakeOrderedAndProject / 1-row broadcast stats), so the fusion join
is R x R rows — constant, independent of corpus size. At 100 TB the
legs are index probes (inverted postings / IVF cells, both in this
repo's surface) and the fusion cost does not change at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.operators.similarity import (
    DIM,
    _SQL_CNORM,
    _sql_dot,
    with_norm,
)
from bigdata_project_spark.operators.text import (
    _BM25_SCORE,
    _BM25_TERMS,
    _SQL_DF,
    _SQL_TF,
    _tf_col,
)
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load

_RRF_K = 60  # Cormack et al.'s constant; rank damping, not a tunable here
_LIST_R = 50  # per-leg candidate list depth feeding the fusion

_SQL_DOT_Q = " + ".join(
    f"CAST(embedding[{i}] AS DOUBLE) * c_arr[{i}]" for i in range(1, DIM + 1)
)


@query(
    "retrieval_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS words
        FROM documents
    ),
    per_doc AS (SELECT doc_id, len(words) AS dl, {_SQL_TF} FROM toks),
    corpus AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               {_SQL_DF}
        FROM per_doc
    ),
    lex AS (
        SELECT doc_id, {_BM25_SCORE} AS score
        FROM per_doc, corpus
        WHERE tf_data + tf_join + tf_stream > 0
    ),
    lrank AS (
        SELECT doc_id, lr FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lr
            FROM lex
        ) WHERE lr <= {_LIST_R}
    ),
    cdim AS (
        SELECT i.r AS pos,
               CAST(SUM(CAST(ROUND(CAST(embedding[i.r + 1] AS DOUBLE) * 1048576, 0) AS BIGINT)) AS DOUBLE)
                 / (1048576.0 * COUNT(*)) AS c
        FROM embeddings, LATERAL (SELECT unnest(range({DIM})) AS r) i
        GROUP BY i.r
    ),
    qvec AS (SELECT list(c ORDER BY pos) AS c_arr FROM cdim),
    normed AS (
        SELECT vec_id, embedding,
               {_sql_dot('embedding', 'embedding')} AS norm_sq
        FROM embeddings
    ),
    dense AS (
        SELECT vec_id,
               ({_SQL_DOT_Q}) / (SQRT(norm_sq) * SQRT({_SQL_CNORM})) AS dcos
        FROM normed, qvec
    ),
    drank AS (
        SELECT vec_id, dr FROM (
            SELECT vec_id,
                   ROW_NUMBER() OVER (ORDER BY dcos DESC, vec_id) AS dr
            FROM dense
        ) WHERE dr <= {_LIST_R}
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, d.vec_id) AS doc_id,
               CAST(l.lr AS INT) AS lex_rank,
               CAST(d.dr AS INT) AS dense_rank,
               COALESCE(1e0 / ({_RRF_K} + l.lr), 0e0)
                 + COALESCE(1e0 / ({_RRF_K} + d.dr), 0e0) AS rrf_score
        FROM lrank l FULL OUTER JOIN drank d ON l.doc_id = d.vec_id
    )
    SELECT doc_id, lex_rank, dense_rank, rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id
    LIMIT 20
    """,
    tags=("retrieval", "llm", "bm25", "similarity", "fusion"),
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion of the BM25 lexical leg (fixed query
    'data join stream') and the dense leg (cosine to the corpus-
    centroid query vector): top-{_LIST_R} per leg, score(d) =
    1/(60 + lex_rank) + 1/(60 + dense_rank) with missing legs
    contributing 0, top-20 fused. Ranks are total orders on
    bit-identical cross-engine scores, so the fusion is value-exact —
    no calibration, no floats that depend on list membership."""
    docs = load(spark, sf_dir, "documents")
    words = F.array_remove(F.split(F.lower("text"), r"\s+"), "")
    per_doc = docs.select(
        "doc_id",
        F.size(words).alias("dl"),
        *[_tf_col(words, t).alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    corpus = per_doc.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    lex = (
        per_doc.crossJoin(F.broadcast(corpus))
        .filter(sum(F.col(f"tf_{t}") for t in _BM25_TERMS) > 0)
        .select("doc_id", F.expr(_BM25_SCORE).alias("score"))
    )
    # top-R FIRST via TakeOrderedAndProject (per-partition heaps +
    # driver merge of R rows), THEN rank the R survivors — the global
    # row_number window only ever sorts _LIST_R rows, never the corpus
    lex_top = lex.orderBy(F.desc("score"), "doc_id").limit(_LIST_R)
    lrank = lex_top.select(
        "doc_id",
        F.row_number().over(W.orderBy(F.desc("score"), "doc_id")).alias("lr"),
    )

    emb = with_norm(load(spark, sf_dir, "embeddings"))
    exploded = emb.select(F.posexplode("embedding").alias("pos", "val"))
    qv = F.round(F.col("val").cast("double") * 1048576, 0).cast("long")
    cdim = exploded.groupBy("pos").agg(
        (F.sum(qv).cast("double") / (1048576.0 * F.count("*"))).alias("c")
    )
    qvec = cdim.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("c_arr")
    )
    dot_q = F.aggregate(
        F.zip_with("embedding", "c_arr", lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    c_norm = F.aggregate(
        F.transform("c_arr", lambda y: y * y), F.lit(0.0), lambda acc, v: acc + v
    )
    dense = emb.crossJoin(F.broadcast(qvec)).select(
        "vec_id",
        (dot_q / (F.sqrt("norm_sq") * F.sqrt(c_norm))).alias("dcos"),
    )
    dense_top = dense.orderBy(F.desc("dcos"), "vec_id").limit(_LIST_R)
    drank = dense_top.select(
        "vec_id",
        F.row_number().over(W.orderBy(F.desc("dcos"), "vec_id")).alias("dr"),
    )

    fused = (
        lrank.join(drank, lrank.doc_id == drank.vec_id, "full_outer")
        .select(
            F.coalesce(lrank.doc_id, drank.vec_id).alias("doc_id"),
            F.col("lr").cast("int").alias("lex_rank"),
            F.col("dr").cast("int").alias("dense_rank"),
            (
                F.coalesce(F.lit(1.0) / (_RRF_K + F.col("lr")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (_RRF_K + F.col("dr")), F.lit(0.0))
            ).alias("rrf_score"),
        )
    )
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(20)
