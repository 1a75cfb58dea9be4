"""Bigram language-model perplexity gate (round 11).

CCNet (Wenzek et al. 2020, arXiv:1911.00359) ranks crawled documents
by their perplexity under an n-gram language model and buckets the
corpus by quantile — the production successor to the unigram
surprisal signal (`text_unigram_surprisal` stops at unigrams, which
cannot see word ORDER: "the the the the" and a fluent sentence over
the same tokens score identically). This module trains a
Laplace-smoothed bigram model ON the corpus itself and gates each
document at the corpus-median bits/bigram:

    bits(w1, w2) = floor(log2((c(w1, .) + V) div (c(w1, w2) + 1)))
                 = length(bin(.)) - 1

where c(w1, .) counts bigram events with context w1, c(w1, w2) the
exact pair, and V the unigram vocabulary size — the add-one-smoothed
conditional code length in whole Shannon bits (the `dsir.py`
discipline: integer bit-length instead of a float log-sum, so the
per-doc total is an order-free integer SUM and bit-exact on both
engines; the only float is one int-to-double divide per document).

The keep bit marks documents in the LOW-perplexity half — text the
corpus's own bigram statistics find predictable (fluent, in-domain);
the high-perplexity tail is where gibberish, wrong-language content,
and OCR noise concentrate (CCNet's "tail" bucket). The threshold is
the knob a pipeline owner re-points at a reference-domain model in
production (Wikipedia in CCNet); the quantile machinery is identical.

The median is found WITHOUT sorting documents — the
`corpus_quality_stratified_gate` recipe: per-score counts (tiny:
bounded by distinct (total_bits, n_bigrams) ratios), a cumulative
window over that aggregate, and a broadcast join back. The score
itself is one exact integer division per doc, so the join key is the
identical IEEE double on both engines.

Scale: two token-keyed aggregates (context and pair counts, both
map-side combinable), one event->model join on (w1, w2) with NO
vocabulary broadcast (at 100 TB the bigram table does not fit an
executor), a 1-row vocab broadcast, one doc_id rollup, and the
broadcastable quantile table. Nothing all-pairs, nothing sorted at
document granularity.

Reference scope: the reference (CrawlData.py) keeps every record
that parses; this is part of the quality layer a training-data
pipeline interposes (BASELINE north star), alongside the Gopher
rules and DSIR importance weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_project_spark.operators.dedup import words_col
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load_spread


# Shared oracle fragment: tokenize -> bigram events -> Laplace model ->
# per-doc whole-bit totals -> the sort-free cumulative value table.
# Consumed by the median gate AND the CCNet head/middle/tail buckets,
# so the estimator cannot drift between the two.
_SQL_LM_CUM = """
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS words
        FROM documents
    ),
    ev AS (
        SELECT doc_id, words[i.i + 1] AS w1, words[i.i + 2] AS w2
        FROM w, LATERAL (SELECT unnest(range(greatest(len(words) - 1, 0))) AS i) i
    ),
    ctx AS (SELECT w1, COUNT(*) AS n_ctx FROM ev GROUP BY w1),
    pair AS (SELECT w1, w2, COUNT(*) AS n_pair FROM ev GROUP BY w1, w2),
    voc AS (
        SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab
        FROM (SELECT unnest(words) AS token FROM w)
    ),
    perdoc AS (
        SELECT e.doc_id,
               COUNT(*) AS n_bigrams,
               CAST(SUM(length(bin((c.n_ctx + v.vocab) // (p.n_pair + 1))) - 1)
                    AS BIGINT) AS total_bits,
               CAST(SUM(length(bin((c.n_ctx + v.vocab) // (p.n_pair + 1))) - 1)
                    AS DOUBLE) / COUNT(*) AS bits_per_bigram
        FROM ev e
        JOIN ctx c USING (w1)
        JOIN pair p USING (w1, w2)
        CROSS JOIN voc v
        GROUP BY e.doc_id
    ),
    vc AS (SELECT bits_per_bigram, COUNT(*) AS c FROM perdoc GROUP BY bits_per_bigram),
    cum AS (
        SELECT bits_per_bigram,
               SUM(c) OVER (ORDER BY bits_per_bigram ASC) AS le_count,
               SUM(c) OVER () AS n_all
        FROM vc
    )
"""


def _events(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) bigram events via two aligned slices; the
    when-guard keeps the negative-length slice unevaluated for
    0/1-token docs (CASE branches are lazy per row), and
    explode(NULL) drops them."""
    words = words_col(F.col("text"))
    pairs = F.when(
        F.size(words) >= 2,
        F.zip_with(
            F.slice(words, 1, F.size(words) - 1),
            F.slice(words, 2, F.size(words) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    )
    return docs.select("doc_id", F.explode(pairs).alias("e")).select(
        "doc_id", F.col("e.w1").alias("w1"), F.col("e.w2").alias("w2")
    )


def _lm_cum(spark: SparkSession, sf_dir: str):
    """(perdoc, cum): the shared Spark-side build — bigram events,
    Laplace whole-bit per-doc totals, and the sort-free cumulative
    value-distribution table. Mirrors `_SQL_LM_CUM` stage for stage;
    consumed by the median gate and the CCNet buckets."""
    docs = load_spread(spark, sf_dir, "documents")
    ev = _events(docs)
    ctx = ev.groupBy("w1").agg(F.count("*").alias("n_ctx"))
    pair = ev.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    voc = (
        docs.select(F.explode(words_col(F.col("text"))).alias("token"))
        .agg(F.count_distinct("token").cast("long").alias("vocab"))
    )
    bits = F.length(F.bin(F.expr("(n_ctx + vocab) div (n_pair + 1)"))) - 1
    perdoc = (
        ev.join(ctx, "w1")
        .join(pair, ["w1", "w2"])
        .join(F.broadcast(voc))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum(bits).alias("total_bits"))
        .select(
            "doc_id",
            "n_bigrams",
            "total_bits",
            (F.col("total_bits").cast("double") / F.col("n_bigrams")).alias(
                "bits_per_bigram"
            ),
        )
    )
    return perdoc, _cum_of(perdoc)


def _cum_of(perdoc: DataFrame) -> DataFrame:
    """Sort-free quantiles: counts per distinct score (tiny
    aggregate), one cumulative window over it, broadcast join back —
    the corpus_quality_stratified_gate shape, global instead of
    per-language (the single-partition window runs over the
    compressed value table, never over documents). Shared by the
    Laplace gate/buckets and the Stupid-Backoff gate."""
    vc = perdoc.groupBy("bits_per_bigram").agg(F.count("*").alias("c"))
    w_asc = Window.orderBy("bits_per_bigram")
    w_all = Window.partitionBy()
    return vc.select(
        "bits_per_bigram",
        F.sum("c").over(w_asc).cast("long").alias("le_count"),
        F.sum("c").over(w_all).cast("long").alias("n_all"),
    )


@query(
    "corpus_lm_perplexity_gate",
    oracle=f"""
    {_SQL_LM_CUM}
    SELECT p.doc_id, p.n_bigrams, p.total_bits, p.bits_per_bigram,
           CAST(cum.le_count AS BIGINT) AS le_count,
           CAST(cum.n_all AS BIGINT) AS n_all,
           CAST(2 * cum.le_count <= cum.n_all AS INT) AS keep
    FROM perdoc p JOIN cum USING (bits_per_bigram)
    """,
    tags=("llm", "quality", "language-model", "perplexity", "gate"),
)
def corpus_lm_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM perplexity (whole-bit code length per
    bigram event under the corpus's own Laplace-smoothed bigram
    model) plus a keep bit for the low-perplexity half, found via the
    sort-free quantile recipe (module docstring has the estimator,
    the CCNet lineage, and the scale story).

    Documents with fewer than two tokens have no bigram evidence and
    are absent — the `text_unigram_surprisal` contract (a doc with no
    events has no perplexity). Ties AT the median value: le_count is
    inclusive, so a value bucket crossing the halfway point is
    excluded whole — the kept share is <= 1/2 exactly, engine-
    independent because the bucket boundaries are."""
    perdoc, cum = _lm_cum(spark, sf_dir)
    return perdoc.join(F.broadcast(cum), "bits_per_bigram").select(
        "doc_id",
        "n_bigrams",
        "total_bits",
        "bits_per_bigram",
        "le_count",
        "n_all",
        (2 * F.col("le_count") <= F.col("n_all")).cast("int").alias("keep"),
    )


@query(
    "corpus_lm_perplexity_buckets",
    oracle=f"""
    {_SQL_LM_CUM}
    SELECT p.doc_id, p.n_bigrams, p.total_bits, p.bits_per_bigram,
           CASE WHEN 3 * cum.le_count <= cum.n_all THEN 'head'
                WHEN 3 * cum.le_count <= 2 * cum.n_all THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM perdoc p JOIN cum USING (bits_per_bigram)
    """,
    tags=("llm", "quality", "language-model", "perplexity", "ccnet"),
)
def corpus_lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet three-way split (Wenzek et al. 2020 §4.3): documents
    bucketed head / middle / tail at the perplexity TERCILES — head
    is the most fluent third the pipeline keeps unconditionally,
    middle is kept-with-sampling, tail is where gibberish and
    wrong-language text concentrate. The gate
    (`corpus_lm_perplexity_gate`) answers "keep or drop at the
    median"; production CCNet ships these three labeled pools, so
    this emits the label per document.

    Same estimator, same sort-free quantile machinery (`_lm_cum`,
    shared code AND shared oracle fragment — the two queries cannot
    drift): bucket boundaries are value-bucket-atomic (a
    bits-per-bigram value bucket lands wholly in one tercile because
    the inclusive le_count is constant across it), so the split is
    engine-independent and each pool's share is <= 1/3 up to the
    granularity of score ties. Scale: identical to the gate — one
    extra CASE over the broadcast value table."""
    perdoc, cum = _lm_cum(spark, sf_dir)
    return perdoc.join(F.broadcast(cum), "bits_per_bigram").select(
        "doc_id",
        "n_bigrams",
        "total_bits",
        "bits_per_bigram",
        F.when(3 * F.col("le_count") <= F.col("n_all"), "head")
        .when(3 * F.col("le_count") <= 2 * F.col("n_all"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# --------------------------------------------- Stupid-Backoff gate

# Production CCNet models are not add-one bigram models: large-scale
# n-gram LMs use backoff (Kneser-Ney when counts-of-counts are
# affordable, STUPID BACKOFF — Brants et al. 2007, "Large Language
# Models in Machine Translation" — at web scale, where it matches KN
# quality with pure count ratios). Stupid Backoff scores
#
#     S(w2 | w1) = c(w1, w2) / c(w1)        if the pair was seen
#                = alpha * S(w2)            otherwise
#
# with a fixed penalty alpha. Two departures from the Laplace gate,
# both production-true: (1) the model is trained on a HELD-OUT split
# (even doc_ids) and scores every document — backoff only exists
# when scoring text the model didn't see, exactly CCNet's
# train-on-Wikipedia / score-the-crawl shape; (2) seen pairs are
# scored by the PURE count ratio (no +1 distortion), unseen pairs
# back off to the add-one-smoothed unigram (the one place smoothing
# is still required for integer safety). alpha = 1/2 — the nearest
# power of two to Brants' 0.4 — makes the penalty EXACTLY one whole
# bit, so the whole estimator stays order-free integer sums:
#
#     bits(w1, w2) = bitlen(c(w1) div c(w1, w2)) - 1      if seen
#                  = 1 + bitlen((N + V) div (c(w2) + 1)) - 1  else
#
# Scale: identical exchanges to the Laplace gate (token-keyed count
# aggregates, event->model joins on (w1, w2) / w1 / w2 with NO
# vocabulary broadcast, 1-row totals broadcast, doc rollup, the
# sort-free quantile table).

_SQL_BACKOFF_CUM = """
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS words
        FROM documents
    ),
    ev AS (
        SELECT doc_id, words[i.i + 1] AS w1, words[i.i + 2] AS w2
        FROM w, LATERAL (SELECT unnest(range(greatest(len(words) - 1, 0))) AS i) i
    ),
    tr_ev AS (SELECT * FROM ev WHERE doc_id % 2 = 0),
    ctx AS (SELECT w1, COUNT(*) AS c1 FROM tr_ev GROUP BY w1),
    pair AS (SELECT w1, w2, COUNT(*) AS c12 FROM tr_ev GROUP BY w1, w2),
    uni AS (SELECT w2 AS tok, COUNT(*) AS c2 FROM tr_ev GROUP BY w2),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_ev,
               CAST(COUNT(DISTINCT w2) AS BIGINT) AS vocab
        FROM tr_ev
    ),
    perdoc AS (
        SELECT e.doc_id,
               COUNT(*) AS n_bigrams,
               CAST(SUM(CASE WHEN p.c12 IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_backoff,
               CAST(SUM(CASE WHEN p.c12 IS NOT NULL
                        THEN length(bin(c.c1 // p.c12)) - 1
                        ELSE length(bin((t.n_ev + t.vocab) // (COALESCE(u.c2, 0) + 1)))
                        END) AS BIGINT) AS total_bits,
               CAST(SUM(CASE WHEN p.c12 IS NOT NULL
                        THEN length(bin(c.c1 // p.c12)) - 1
                        ELSE length(bin((t.n_ev + t.vocab) // (COALESCE(u.c2, 0) + 1)))
                        END) AS DOUBLE) / COUNT(*) AS bits_per_bigram
        FROM ev e
        LEFT JOIN pair p ON p.w1 = e.w1 AND p.w2 = e.w2
        LEFT JOIN ctx c ON c.w1 = e.w1
        LEFT JOIN uni u ON u.tok = e.w2
        CROSS JOIN tot t
        GROUP BY e.doc_id
    ),
    vc AS (SELECT bits_per_bigram, COUNT(*) AS c FROM perdoc GROUP BY bits_per_bigram),
    cum AS (
        SELECT bits_per_bigram,
               SUM(c) OVER (ORDER BY bits_per_bigram ASC) AS le_count,
               SUM(c) OVER () AS n_all
        FROM vc
    )
"""


def _backoff_perdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Stupid-Backoff whole-bit totals under the even-doc_id
    train split — the Spark twin of _SQL_BACKOFF_CUM's perdoc."""
    docs = load_spread(spark, sf_dir, "documents")
    ev = _events(docs)
    tr = ev.filter(F.col("doc_id") % 2 == 0)
    ctx = tr.groupBy("w1").agg(F.count("*").alias("c1"))
    pair = tr.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni = tr.groupBy("w2").agg(F.count("*").alias("c2")).select(
        F.col("w2").alias("tok"), "c2"
    )
    tot = tr.agg(
        F.count("*").cast("long").alias("n_ev"),
        F.count_distinct("w2").cast("long").alias("vocab"),
    )
    bits = F.when(
        F.col("c12").isNotNull(), F.length(F.bin(F.expr("c1 div c12"))) - 1
    ).otherwise(
        F.length(F.bin(F.expr("(n_ev + vocab) div (coalesce(c2, 0) + 1)")))
    )
    return (
        ev.join(pair, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(uni, F.col("w2") == F.col("tok"), "left")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.when(F.col("c12").isNotNull(), 0).otherwise(1))
            .cast("long")
            .alias("n_backoff"),
            F.sum(bits).cast("long").alias("total_bits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_backoff",
            "total_bits",
            (F.col("total_bits").cast("double") / F.col("n_bigrams")).alias(
                "bits_per_bigram"
            ),
        )
    )


@query(
    "corpus_lm_backoff_gate",
    oracle=f"""
    {_SQL_BACKOFF_CUM}
    SELECT p.doc_id, p.n_bigrams, p.n_backoff, p.total_bits, p.bits_per_bigram,
           CAST(cum.le_count AS BIGINT) AS le_count,
           CAST(cum.n_all AS BIGINT) AS n_all,
           CAST(2 * cum.le_count <= cum.n_all AS INT) AS keep
    FROM perdoc p JOIN cum USING (bits_per_bigram)
    """,
    tags=("llm", "quality", "language-model", "perplexity", "backoff", "gate"),
)
def corpus_lm_backoff_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Stupid-Backoff bits/bigram under a bigram model
    trained on the even-doc_id half and scoring EVERY document, plus
    the median keep bit via the shared sort-free quantile recipe
    (`_cum_of`) — the production-backoff sibling of
    `corpus_lm_perplexity_gate` (section comment has the estimator,
    the Brants et al. lineage, the alpha = 1/2 whole-bit penalty,
    and the held-out-split rationale). n_backoff counts the events
    that fell back to the unigram — the model-coverage diagnostic an
    operator reads next to the score (held-out docs back off, train
    docs don't).

    Documents with fewer than two tokens have no bigram evidence and
    are absent; tie buckets at the median are excluded whole — both
    contracts identical to the Laplace gate, so the two keep sets
    are directly comparable (`corpus_lm_gate_overlap`)."""
    perdoc = _backoff_perdoc(spark, sf_dir)
    return perdoc.join(F.broadcast(_cum_of(perdoc)), "bits_per_bigram").select(
        "doc_id",
        "n_bigrams",
        "n_backoff",
        "total_bits",
        "bits_per_bigram",
        "le_count",
        "n_all",
        (2 * F.col("le_count") <= F.col("n_all")).cast("int").alias("keep"),
    )


@query(
    "corpus_lm_gate_overlap",
    oracle="""
    SELECT b.keep AS backoff_keep, l.keep AS laplace_keep,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM ({BO}) b JOIN ({LA}) l ON b.doc_id = l.doc_id
    GROUP BY b.keep, l.keep
    """,
    tags=("llm", "quality", "language-model", "audit", "confusion"),
)
def corpus_lm_gate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-set overlap between the Stupid-Backoff gate and the
    Laplace gate: the 2x2 confusion over documents both can score.
    Both gates keep <= half the corpus at their own median, so the
    matrix reads as 'how much of the kept pool survives swapping the
    smoother' — the ablation a pipeline owner runs before switching
    LM backends (rank correlation between the two scores is pinned
    separately in tests/test_lm_backoff.py). Component oracles nest,
    so the audit is value-verified end to end."""
    bo = corpus_lm_backoff_gate(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("backoff_keep")
    )
    la = corpus_lm_perplexity_gate(spark, sf_dir).select(
        F.col("doc_id").alias("l_did"), F.col("keep").alias("laplace_keep")
    )
    return (
        bo.join(la, F.col("doc_id") == F.col("l_did"))
        .groupBy("backoff_keep", "laplace_keep")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


from bigdata_project_spark.registry import REGISTRY as _REG  # noqa: E402

_REG["corpus_lm_gate_overlap"].oracle = _REG["corpus_lm_gate_overlap"].oracle.format(
    BO=_REG["corpus_lm_backoff_gate"].oracle,
    LA=_REG["corpus_lm_perplexity_gate"].oracle,
)
