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


def _lm_cum(spark: SparkSession, sf_dir: str):
    """(perdoc, cum): the shared Spark-side build — bigram events,
    Laplace whole-bit per-doc totals, and the sort-free cumulative
    value-distribution table. Mirrors `_SQL_LM_CUM` stage for stage;
    consumed by the median gate and the CCNet buckets."""
    docs = load_spread(spark, sf_dir, "documents")
    words = words_col(F.col("text"))
    # bigram events via two aligned slices; the when-guard keeps the
    # negative-length slice unevaluated for 0/1-token docs (CASE
    # branches are lazy per row), and explode(NULL) drops them
    pairs = F.when(
        F.size(words) >= 2,
        F.zip_with(
            F.slice(words, 1, F.size(words) - 1),
            F.slice(words, 2, F.size(words) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    )
    ev = docs.select("doc_id", F.explode(pairs).alias("e")).select(
        "doc_id", F.col("e.w1").alias("w1"), F.col("e.w2").alias("w2")
    )
    ctx = ev.groupBy("w1").agg(F.count("*").alias("n_ctx"))
    pair = ev.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    voc = (
        docs.select(F.explode(words).alias("token"))
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
    # sort-free quantiles: counts per distinct score (tiny aggregate),
    # one cumulative window over it, broadcast join back — the
    # corpus_quality_stratified_gate shape, global instead of
    # per-language (the single-partition window runs over the
    # compressed value table, never over documents)
    vc = perdoc.groupBy("bits_per_bigram").agg(F.count("*").alias("c"))
    w_asc = Window.orderBy("bits_per_bigram")
    w_all = Window.partitionBy()
    cum = vc.select(
        "bits_per_bigram",
        F.sum("c").over(w_asc).cast("long").alias("le_count"),
        F.sum("c").over(w_all).cast("long").alias("n_all"),
    )
    return perdoc, cum


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
