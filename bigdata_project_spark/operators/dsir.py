"""DSIR-style data-selection importance weighting (round 8).

Xie et al. 2023 (arXiv:2302.03169, "Data Selection for Language
Models via Importance Resampling") select pretraining data by the
log-likelihood ratio of each document under a TARGET-domain n-gram
model vs the RAW-corpus model — the principled generalization of
"filter by perplexity against the domain you care about". This module
implements the scoring operator in the engine's determinism-safe
integer form (the same whole-bits Shannon code-length core as
`text_unigram_surprisal`):

    importance_bits(doc) = sum over token occurrences of
        bits_raw(tok) - bits_target(tok)
    bits_m(tok) = floor(log2((N_m + V) div (tf_m(tok) + 1)))
                = length(bin(.)) - 1          (Laplace smoothing)

Positive importance = the raw corpus finds the doc's vocabulary more
surprising than the target model does, i.e. the doc looks target-like
— rank by it and keep the top mass (the resampling step is
`sample_quality_weighted`'s md5-bucket machinery; this operator
produces the weights).

The registered target is a fixed source subset (src0-src2) — the
testbed has no labeled domains, and in production the target model is
fit on the downstream-domain sample; the subset is a parameter, not a
semantic.

Scale: two token-keyed tf aggregates (map-side combined; the raw one
is the same exchange text_unigram_surprisal rides), one
occurrence->tf join on token (NO vocabulary broadcast assumption —
at 100 TB the vocab does not fit an executor), 1-row totals broadcast,
one doc_id rollup. Integer sums are order-free, so partitioning can
never change a score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.operators.dedup import words_col
from bigdata_project_spark.operators.quality_ext import _SQL_TOKS_MULTI
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load_spread

# the registered target-domain slice (see module docstring)
TARGET_SOURCES = ("src0", "src1", "src2")
_SQL_TARGET = "('" + "', '".join(TARGET_SOURCES) + "')"


@query(
    "corpus_dsir_importance",
    oracle=f"""
    WITH {_SQL_TOKS_MULTI},
    tf_raw AS (SELECT token, COUNT(*) AS n_raw FROM toks GROUP BY token),
    tgt_toks AS (
        SELECT unnest(list_filter(string_split_regex(lower(d.text), '\\s+'), x -> x <> '')) AS token
        FROM documents d WHERE d.source IN {_SQL_TARGET}
    ),
    tf_tgt AS (SELECT token, COUNT(*) AS n_tgt FROM tgt_toks GROUP BY token),
    tot AS (
        SELECT CAST(SUM(n_raw) AS BIGINT) AS n_total_raw,
               CAST(COUNT(*) AS BIGINT) AS vocab
        FROM tf_raw
    ),
    tot_tgt AS (SELECT CAST(COALESCE(SUM(n_tgt), 0) AS BIGINT) AS n_total_tgt FROM tf_tgt),
    scored AS (
        SELECT t.doc_id,
               (length(bin((n_total_raw + vocab) // (r.n_raw + 1))) - 1)
               - (length(bin((n_total_tgt + vocab) // (COALESCE(g.n_tgt, 0) + 1))) - 1)
                 AS imp
        FROM toks t
        JOIN tf_raw r USING (token)
        LEFT JOIN tf_tgt g USING (token)
        CROSS JOIN tot CROSS JOIN tot_tgt
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(imp) AS BIGINT) AS importance_bits,
           CAST(SUM(imp) AS DOUBLE) / COUNT(*) AS importance_per_token
    FROM scored
    GROUP BY doc_id
    """,
    tags=("llm", "quality", "sampling", "language-model"),
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance in whole bits (module docstring
    has the estimator and the scale story). Empty/NULL-text docs have
    no token occurrences and are absent from the output — same
    contract as text_unigram_surprisal (a doc with no evidence has no
    likelihood ratio)."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("token"))
    tgt_toks = docs.filter(F.col("source").isin(*TARGET_SOURCES)).select(
        F.explode(words_col(F.col("text"))).alias("token")
    )
    tf_raw = toks.groupBy("token").agg(F.count("*").alias("n_raw"))
    tf_tgt = tgt_toks.groupBy("token").agg(F.count("*").alias("n_tgt"))
    tot = tf_raw.agg(
        F.sum("n_raw").alias("n_total_raw"), F.count("*").alias("vocab")
    )
    tot_tgt = tf_tgt.agg(F.coalesce(F.sum("n_tgt"), F.lit(0)).alias("n_total_tgt"))
    bits_raw = F.length(F.bin(F.expr("(n_total_raw + vocab) div (n_raw + 1)"))) - 1
    bits_tgt = (
        F.length(
            F.bin(F.expr("(n_total_tgt + vocab) div (coalesce(n_tgt, 0) + 1)"))
        )
        - 1
    )
    return (
        toks.join(tf_raw, "token")
        .join(tf_tgt, "token", "left")
        .join(F.broadcast(tot))
        .join(F.broadcast(tot_tgt))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(bits_raw - bits_tgt).alias("importance_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "importance_bits",
            (F.col("importance_bits").cast("double") / F.col("n_tokens")).alias(
                "importance_per_token"
            ),
        )
    )


@query(
    "corpus_source_kl_audit",
    oracle="""
    WITH toks AS (
        SELECT source,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS token
        FROM documents
    ),
    tf_g AS (SELECT token, COUNT(*) AS n_g FROM toks GROUP BY token),
    tf_s AS (SELECT source, token, COUNT(*) AS n_s FROM toks GROUP BY source, token),
    tot_g AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n_total_g,
               CAST(COUNT(*) AS BIGINT) AS vocab
        FROM tf_g
    ),
    tot_s AS (
        SELECT source, CAST(SUM(n_s) AS BIGINT) AS n_total_s
        FROM tf_s GROUP BY source
    ),
    scored AS (
        SELECT t.source,
               length(bin((g2.n_total_g + g2.vocab) // (g.n_g + 1))) - 1 AS bits_g,
               length(bin((s2.n_total_s + g2.vocab) // (s.n_s + 1))) - 1 AS bits_o
        FROM toks t
        JOIN tf_g g USING (token)
        JOIN tf_s s ON s.source = t.source AND s.token = t.token
        JOIN tot_s s2 ON s2.source = t.source
        CROSS JOIN tot_g g2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(bits_g) AS BIGINT) AS bits_global,
           CAST(SUM(bits_o) AS BIGINT) AS bits_own,
           CAST(SUM(bits_g) - SUM(bits_o) AS DOUBLE) / COUNT(*) AS kl_bits_per_token
    FROM scored
    GROUP BY source
    """,
    tags=("llm", "quality", "mixture", "kl", "audit"),
)
def corpus_source_kl_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source domain-shift audit: how many extra whole Shannon
    bits per token the corpus-GLOBAL unigram model pays over the
    source's OWN model on that source's token stream — the
    code-length form of KL(P_source || P_corpus), the number a
    mixture designer reads to see which source the blended model
    fits worst (CCNet/DSIR lineage; `corpus_dsir_importance` is the
    per-document view against a target model, this is the per-source
    view against the blend).

    Determinism: the same whole-bit Laplace code length as the DSIR
    and bigram-LM operators — bits_m(tok) = bitlen((N_m + V) div
    (tf_m(tok) + 1)) with the GLOBAL vocab V smoothing both models
    (same alphabet, so the comparison is apples-to-apples); integer
    sums are order-free, one exact int-to-double divide per source.
    Flooring makes tiny negative per-token values possible on a
    source indistinguishable from the blend — that reads as
    "no measurable shift", which is the honest answer at whole-bit
    resolution.

    Scale: two token-keyed tf aggregates (map-side combined), the
    occurrence->tf joins shuffle on token / (source, token) with NO
    vocabulary broadcast, totals are a 1-row and a #sources-row
    broadcast, and the rollup keys on the handful of sources."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(words_col(F.col("text"))).alias("token")
    )
    tf_g = toks.groupBy("token").agg(F.count("*").alias("n_g"))
    tf_s = toks.groupBy("source", "token").agg(F.count("*").alias("n_s"))
    tot_g = tf_g.agg(
        F.sum("n_g").cast("long").alias("n_total_g"),
        F.count("*").cast("long").alias("vocab"),
    )
    tot_s = tf_s.groupBy("source").agg(
        F.sum("n_s").cast("long").alias("n_total_s")
    )
    bits_g = F.length(F.bin(F.expr("(n_total_g + vocab) div (n_g + 1)"))) - 1
    bits_o = F.length(F.bin(F.expr("(n_total_s + vocab) div (n_s + 1)"))) - 1
    scored = (
        toks.join(tf_g, "token")
        .join(tf_s, ["source", "token"])
        .join(F.broadcast(tot_s), "source")
        .join(F.broadcast(tot_g))
        .select("source", bits_g.alias("bits_g"), bits_o.alias("bits_o"))
    )
    return scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("bits_g").cast("long").alias("bits_global"),
        F.sum("bits_o").cast("long").alias("bits_own"),
        (
            (F.sum("bits_g") - F.sum("bits_o")).cast("double")
            / F.count("*").cast("double")
        ).alias("kl_bits_per_token"),
    )
