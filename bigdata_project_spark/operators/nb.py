"""Trained Naive-Bayes quality classifier (round 12).

Production pretraining pipelines gate documents with a TRAINED
discriminative classifier, not just rules: CCNet deploys fastText
models, FineWeb-Edu scores documents with a trained edu-quality
classifier, and the classic cheap-but-strong baseline behind both is
Naive Bayes. This module trains one ON a deterministic labeled seed
— the Gopher rule gate's keep bit (`quality_gopher_rules`), the
standard bootstrap where curated rules label the seed and the
learned model generalizes beyond them — and scores every document.

Variant choice, MEASURED not assumed: the multinomial form
(per-occurrence token LLRs) was built first and is structurally
blind to token ABSENCE — a rate-neutral token's log-likelihood
ratio is ~0, so a document containing only class-neutral vocabulary
scores exactly the (positive) class prior and the classifier
degenerates to keep-everything on this corpus, whose negative seed
class is defined by a MISSING feature (no stopword hits). That is a
property of the model family, true in float arithmetic too. The
BERNOULLI form (McCallum & Nigam 1998, the small-vocabulary
workhorse) models presence AND absence of every vocabulary token,
and decomposes exactly into the scalable shape:

    score(doc) = sum over DISTINCT tokens present of d(tok)
               + A + prior_bits
    d(tok)  = w_present(tok) - w_absent(tok)    (per-token relation)
    A       = sum over the whole vocab of w_absent(tok)  (1-row const)

so absence evidence costs one corpus-level aggregate, not a
|docs| x |vocab| scan. All terms are signed whole-bit code-length
ratios under Laplace-smoothed document frequencies,

    sbits(a, b) = floor(log2(a div b))     if a >= b
                = 1 - length(bin(b div a)) otherwise

an ANTISYMMETRIC (+-1-bit) integer log ratio — sbits(a,b) =
-sbits(b,a) by construction — so every sum is order-free BIGINT
arithmetic and bit-exact on both engines:

    w_present(tok) = sbits(df_pos+1, n_pos+2) - sbits(df_neg+1, n_neg+2)
    w_absent(tok)  = sbits(n_pos-df_pos+1, n_pos+2)
                   - sbits(n_neg-df_neg+1, n_neg+2)
    prior_bits     = sbits(n_pos+1, n_neg+1)

nb_keep = (score > 0): the Bernoulli posterior favors the quality
class. Measured on the testbed seed: negative-class recall 0.97-1.0
and positive recall 0.81-0.85 across sf0.001-0.1 (balanced accuracy
~0.89 vs 0.5 for the all-keep gate the multinomial collapsed to) —
pinned in tests/test_nb.py.

Scale: the DSIR dataflow — one doc-keyed label join, a distinct
(doc, token) projection, one token-keyed df aggregate (map-side
combined), the distinct-occurrence -> weight join shuffles on token
with NO vocabulary broadcast (at 100 TB the weight table does not
fit an executor), two 1-row broadcasts (absence constant, priors),
one doc_id rollup. The trained artifact IS the (token, d) relation
plus two scalars — a production consumer materializes it once and
gates any stream with one join.

The agreement audit (`corpus_nb_lm_agreement`) is the confusion
matrix between this discriminative gate and the generative
perplexity gate (`corpus_lm_perplexity_gate`) — two independently
derived quality signals; where they disagree is exactly the slice a
pipeline owner inspects by hand (CCNet does this across its signal
pairs).

Reference scope: [ext] — the reference (CrawlData.py) keeps every
record that parses; BASELINE north-star quality pillar, completing
rules (Gopher) -> importance (DSIR) -> generative LM (perplexity
gate) -> trained discriminative classifier (this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.operators.corpus_ext import (
    _BULLET_RE,
    _SQL_NTOK,
    _STOPWORDS_RE,
    _SYMBOL_RE,
    quality_gopher_rules,
)
from bigdata_project_spark.operators.dedup import words_col
from bigdata_project_spark.operators.lm import corpus_lm_perplexity_gate
from bigdata_project_spark.operators.quality_ext import _SQL_TOKS_MULTI
from bigdata_project_spark.registry import REGISTRY, query
from bigdata_project_spark.tables import load_spread


def _sbits(a: str, b: str, div: str) -> str:
    """Signed whole-bit log ratio ~ log2(a/b) over positive integer
    expressions; antisymmetric (sbits(a,b) = -sbits(b,a)) so summed
    evidence has no systematic sign bias. `div` is '//' for DuckDB,
    'div' for Spark SQL — the arithmetic is otherwise identical."""
    return (
        f"(CASE WHEN {a} >= {b} THEN length(bin(({a}) {div} ({b}))) - 1 "
        f"ELSE 1 - length(bin(({b}) {div} ({a}))) END)"
    )


# the Gopher keep bit as the deterministic training label (the SQL
# twin of quality_gopher_rules' composed keep)
_SQL_LAB = f"""
    feats AS (
        SELECT doc_id,
               {_SQL_NTOK} AS n_words,
               length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace,
               len(regexp_extract_all(text, '{_SYMBOL_RE}')) AS n_symbols,
               len(regexp_extract_all(text, '{_BULLET_RE}')) AS n_bullet_lines,
               1 + len(regexp_extract_all(text, '\\n')) AS n_lines,
               len(regexp_extract_all(lower(text), '{_STOPWORDS_RE}')) AS n_stopwords
        FROM documents
    ),
    lab AS (
        SELECT doc_id,
               CAST(n_words BETWEEN 3 AND 100000
                    AND CAST(n_nonspace AS DOUBLE) / n_words BETWEEN 2 AND 12
                    AND CAST(n_symbols AS DOUBLE) / n_nonspace <= 0.1
                    AND CAST(n_bullet_lines AS DOUBLE) / n_lines <= 0.9
                    AND n_stopwords >= 1 AS INT) AS y
        FROM feats
        WHERE n_words > 0 AND n_nonspace > 0
    )
"""


def _sql_nb(div: str = "//") -> str:
    sb = lambda a, b: _sbits(a, b, div)  # noqa: E731
    return f"""
    WITH {_SQL_TOKS_MULTI},
    {_SQL_LAB},
    dtoks AS (SELECT DISTINCT doc_id, token FROM toks),
    df_c AS (
        SELECT l.y, d.token, COUNT(*) AS df
        FROM dtoks d JOIN lab l USING (doc_id)
        GROUP BY l.y, d.token
    ),
    dftab AS (
        SELECT token,
               COALESCE(MAX(CASE WHEN y = 1 THEN df END), 0) AS df_pos,
               COALESCE(MAX(CASE WHEN y = 0 THEN df END), 0) AS df_neg
        FROM df_c GROUP BY token
    ),
    prior AS (
        SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
        FROM lab
    ),
    wbits AS (
        SELECT d.token,
               ({sb("d.df_pos + 1", "p.n_pos + 2")}
              - {sb("d.df_neg + 1", "p.n_neg + 2")})
             - ({sb("p.n_pos - d.df_pos + 1", "p.n_pos + 2")}
              - {sb("p.n_neg - d.df_neg + 1", "p.n_neg + 2")}) AS d_w,
               ({sb("p.n_pos - d.df_pos + 1", "p.n_pos + 2")}
              - {sb("p.n_neg - d.df_neg + 1", "p.n_neg + 2")}) AS w_absent
        FROM dftab d CROSS JOIN prior p
    ),
    absconst AS (SELECT CAST(SUM(w_absent) AS BIGINT) AS a_bits FROM wbits),
    scored AS (
        SELECT d.doc_id,
               COUNT(*) AS n_distinct,
               CAST(SUM(w.d_w) AS BIGINT) AS present_bits
        FROM dtoks d JOIN wbits w USING (token)
        GROUP BY d.doc_id
    )
    SELECT s.doc_id, s.n_distinct, s.present_bits,
           a.a_bits AS absent_bits,
           CAST({sb("p.n_pos + 1", "p.n_neg + 1")} AS BIGINT) AS prior_bits,
           CAST(s.present_bits + a.a_bits
                + {sb("p.n_pos + 1", "p.n_neg + 1")} AS BIGINT) AS nb_bits,
           CAST(s.present_bits + a.a_bits
                + {sb("p.n_pos + 1", "p.n_neg + 1")} > 0 AS INT) AS nb_keep,
           l.y AS seed_label
    FROM scored s
    JOIN lab l USING (doc_id)
    CROSS JOIN absconst a
    CROSS JOIN prior p
"""


@query(
    "corpus_nb_quality_classifier",
    oracle=_sql_nb(),
    tags=("llm", "quality", "classifier", "naive-bayes", "gate"),
)
def corpus_nb_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Bernoulli Naive Bayes trained on the Gopher keep bit
    and scoring every tokenized document: presence evidence summed
    over the doc's distinct tokens (present_bits), the corpus-level
    absence constant (absent_bits), the class prior (prior_bits),
    their sum (nb_bits), the keep decision, and the seed label for
    in-place train-set diagnostics. Module docstring has the
    estimator, why Bernoulli and not multinomial (measured
    absence-blindness), and the 100 TB dataflow (token-keyed weight
    join, no vocab broadcast).

    Docs with zero tokens have no evidence and are absent — the
    text_unigram_surprisal contract. The label set equals the scored
    set: the Gopher prefilter only drops docs with no words, which
    have no token occurrences either."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("token"))
    dtoks = toks.distinct()
    lab = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("y")
    )
    df_c = dtoks.join(lab, "doc_id").groupBy("y", "token").agg(
        F.count("*").alias("df")
    )
    dftab = df_c.groupBy("token").agg(
        F.coalesce(F.max(F.when(F.col("y") == 1, F.col("df"))), F.lit(0)).alias(
            "df_pos"
        ),
        F.coalesce(F.max(F.when(F.col("y") == 0, F.col("df"))), F.lit(0)).alias(
            "df_neg"
        ),
    )
    prior = lab.agg(
        F.sum("y").cast("long").alias("n_pos"),
        (F.count("*") - F.sum("y")).cast("long").alias("n_neg"),
    )
    sb = lambda a, b: F.expr(_sbits(a, b, "div"))  # noqa: E731
    w_present = sb("df_pos + 1", "n_pos + 2") - sb("df_neg + 1", "n_neg + 2")
    w_absent = sb("n_pos - df_pos + 1", "n_pos + 2") - sb(
        "n_neg - df_neg + 1", "n_neg + 2"
    )
    wbits = dftab.join(F.broadcast(prior)).select(
        "token", (w_present - w_absent).alias("d_w"), w_absent.alias("w_absent")
    )
    absconst = wbits.agg(F.sum("w_absent").cast("long").alias("a_bits"))
    scored = (
        dtoks.join(wbits.select("token", "d_w"), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_distinct"),
            F.sum("d_w").cast("long").alias("present_bits"),
        )
    )
    prior_bits = sb("n_pos + 1", "n_neg + 1")
    nb_bits = F.col("present_bits") + F.col("a_bits") + prior_bits
    return (
        scored.join(lab, "doc_id")
        .join(F.broadcast(absconst))
        .join(F.broadcast(prior))
        .select(
            "doc_id",
            "n_distinct",
            "present_bits",
            F.col("a_bits").alias("absent_bits"),
            prior_bits.cast("long").alias("prior_bits"),
            nb_bits.cast("long").alias("nb_bits"),
            (nb_bits > 0).cast("int").alias("nb_keep"),
            F.col("y").alias("seed_label"),
        )
    )


@query(
    "corpus_nb_lm_agreement",
    oracle="""
    SELECT n.nb_keep, l.keep AS lm_keep, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM ({NB}) n JOIN ({LM}) l ON n.doc_id = l.doc_id
    GROUP BY n.nb_keep, l.keep
    """,
    tags=("llm", "quality", "classifier", "audit", "confusion"),
)
def corpus_nb_lm_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix between the two TRAINED quality signals: the
    discriminative Bernoulli-NB gate and the generative bigram-LM
    perplexity gate, over the documents both can score (>= 2
    tokens). The off-diagonal cells are the review queue: docs the
    classifier keeps but the LM finds incoherent (topical-but-
    garbled), and fluent docs the classifier rejects (well-formed
    but off-quality vocabulary). Both component oracles nest inside
    this one, so the audit itself is value-verified end to end."""
    nb = corpus_nb_quality_classifier(spark, sf_dir).select("doc_id", "nb_keep")
    lm = corpus_lm_perplexity_gate(spark, sf_dir).select(
        F.col("doc_id").alias("l_did"), F.col("keep").alias("lm_keep")
    )
    return (
        nb.join(lm, F.col("doc_id") == F.col("l_did"))
        .groupBy("nb_keep", "lm_keep")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


REGISTRY["corpus_nb_lm_agreement"].oracle = REGISTRY[
    "corpus_nb_lm_agreement"
].oracle.format(
    NB=REGISTRY["corpus_nb_quality_classifier"].oracle,
    LM=REGISTRY["corpus_lm_perplexity_gate"].oracle,
)


@query(
    "corpus_nb_seed_confusion",
    oracle="""
    SELECT nb_keep, seed_label, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM ({NB}) GROUP BY nb_keep, seed_label
    """,
    tags=("llm", "quality", "classifier", "eval", "confusion"),
)
def corpus_nb_seed_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-set confusion matrix of the Bernoulli NB gate against
    its own Gopher seed labels — the per-cell counts behind the
    seed-recall floors tests/test_nb.py pins (neg recall 0.97-1.0,
    pos recall 0.81-0.85 on the testbed). Driver-checkable evidence
    that the trained classifier separates its classes: a degenerate
    model (the multinomial failure mode) collapses this matrix to
    one predicted column. Scale: one 4-group rollup over the
    classifier's output."""
    return (
        corpus_nb_quality_classifier(spark, sf_dir)
        .groupBy("nb_keep", "seed_label")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


REGISTRY["corpus_nb_seed_confusion"].oracle = REGISTRY[
    "corpus_nb_seed_confusion"
].oracle.format(NB=REGISTRY["corpus_nb_quality_classifier"].oracle)


_CAL_W = 8  # calibration bin width in whole bits


@query(
    "corpus_nb_calibration",
    oracle=f"""
    SELECT bin,
           CAST(bin * {_CAL_W} AS BIGINT) AS lo_bits,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(seed_label) AS BIGINT) AS n_seed_pos,
           CAST(SUM(seed_label) AS DOUBLE) / COUNT(*) AS empirical_rate,
           POWER(2.0, GREATEST(-64, LEAST(64, bin * {_CAL_W} + {_CAL_W // 2})))
             / (1 + POWER(2.0, GREATEST(-64, LEAST(64, bin * {_CAL_W} + {_CAL_W // 2}))))
             AS implied_posterior
    FROM (
        SELECT CAST(FLOOR(CAST(nb_bits AS DOUBLE) / {_CAL_W}) AS BIGINT) AS bin,
               seed_label
        FROM ({{NB}})
    )
    GROUP BY bin
    """,
    tags=("llm", "quality", "classifier", "eval", "calibration"),
)
def corpus_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the NB gate — the artifact a
    FineWeb-Edu-style deployment reads before picking a keep
    threshold: scores bucketed into fixed 8-bit bins, each bin
    reporting how many documents landed there, how many the seed
    labels call positive, the EMPIRICAL positive rate, and the
    posterior the bin's midpoint score IMPLIES (p = 2^s / (1 + 2^s),
    the base-2 sigmoid of the integer log-odds; midpoint exponent
    clamped to +-64 so saturated bins read exactly 0/1 instead of
    NaN). Where empirical and implied diverge is miscalibration —
    the agg_countmin_audit discipline (estimate vs truth, in-engine)
    applied to the classifier. Weak monotonicity of the empirical
    rate across bins is pinned at three SFs by
    tests/test_ndcg.py::test_nb_calibration_monotone.

    Floor division goes through FLOOR(bits / 8.0) explicitly: Spark's
    `div` truncates toward zero while Python/DuckDB floor, and
    negative scores sit exactly where calibration matters most.

    Scale: one fixed-fanout rollup over the classifier's output —
    the score relation shuffles on ~a dozen bin keys; the trained
    model's dataflow (token-keyed weight join, no vocab broadcast)
    is inherited unchanged."""
    nb = corpus_nb_quality_classifier(spark, sf_dir)
    binned = nb.select(
        F.floor(F.col("nb_bits").cast("double") / _CAL_W).cast("long").alias("bin"),
        "seed_label",
    )
    mid = F.greatest(
        F.lit(-64), F.least(F.lit(64), F.col("bin") * _CAL_W + _CAL_W // 2)
    )
    implied = F.pow(F.lit(2.0), mid) / (F.lit(1) + F.pow(F.lit(2.0), mid))
    agg = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("seed_label").cast("long").alias("n_seed_pos"),
        (F.sum("seed_label").cast("double") / F.count("*")).alias("empirical_rate"),
    )
    return agg.select(
        "bin",
        (F.col("bin") * _CAL_W).cast("long").alias("lo_bits"),
        "n_docs",
        "n_seed_pos",
        "empirical_rate",
        implied.alias("implied_posterior"),
    )


REGISTRY["corpus_nb_calibration"].oracle = REGISTRY[
    "corpus_nb_calibration"
].oracle.format(NB=REGISTRY["corpus_nb_quality_classifier"].oracle)


@query(
    "corpus_quality_ensemble_gate",
    oracle="""
    SELECT g.doc_id,
           CAST(g.keep AS INT) AS gopher_keep,
           CAST(n.nb_keep AS INT) AS nb_keep,
           CAST(l.keep AS INT) AS lm_keep,
           CAST(g.keep + n.nb_keep + l.keep AS INT) AS n_votes,
           CAST(g.keep + n.nb_keep + l.keep >= 2 AS INT) AS ensemble_keep
    FROM ({G}) g
    JOIN ({NB}) n ON n.doc_id = g.doc_id
    JOIN ({LM}) l ON l.doc_id = g.doc_id
    """,
    tags=("llm", "quality", "gate", "ensemble", "classifier"),
)
def corpus_quality_ensemble_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote ensemble of the three INDEPENDENTLY-DERIVED
    quality signals — rules (Gopher), discriminative (Bernoulli NB),
    generative (bigram-LM perplexity) — over the documents all three
    can score: the shipped gate a production corpus actually applies
    after the pairwise agreement audits (corpus_nb_lm_agreement) have
    been reviewed. Majority voting is the standard variance-reduction
    move when signals err independently: a doc needs 2 of 3 keeps to
    survive, so one signal's blind spot (the NB seed's rule bias, the
    LM's fluent-spam weakness, the rules' fixed thresholds) cannot
    alone decide either way. All three component oracles nest, so the
    composed verdict is value-verified end to end.

    tests/test_ensemble.py pins the vote arithmetic against the
    components and that the ensemble sits between intersection and
    union of the component keep sets (a theorem of 2-of-3 voting,
    checked on real output).

    Scale: the three component relations are already doc_id-keyed
    outputs of scale-shaped pipelines; the ensemble adds two
    doc_id equi-joins and codegen integer arithmetic — no new
    corpus-scale stage."""
    g = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("int").alias("gopher_keep")
    )
    nbk = corpus_nb_quality_classifier(spark, sf_dir).select(
        F.col("doc_id").alias("n_did"), F.col("nb_keep").cast("int").alias("nb_keep")
    )
    lmk = corpus_lm_perplexity_gate(spark, sf_dir).select(
        F.col("doc_id").alias("l_did"), F.col("keep").cast("int").alias("lm_keep")
    )
    votes = F.col("gopher_keep") + F.col("nb_keep") + F.col("lm_keep")
    return (
        g.join(nbk, F.col("doc_id") == F.col("n_did"))
        .join(lmk, F.col("doc_id") == F.col("l_did"))
        .select(
            "doc_id",
            "gopher_keep",
            "nb_keep",
            "lm_keep",
            votes.cast("int").alias("n_votes"),
            (votes >= 2).cast("int").alias("ensemble_keep"),
        )
    )


REGISTRY["corpus_quality_ensemble_gate"].oracle = REGISTRY[
    "corpus_quality_ensemble_gate"
].oracle.format(
    G=REGISTRY["quality_gopher_rules"].oracle,
    NB=REGISTRY["corpus_nb_quality_classifier"].oracle,
    LM=REGISTRY["corpus_lm_perplexity_gate"].oracle,
)


# ----------------------------- isotonic (PAV) calibration (round 14)


_ISO_W = 4  # isotonic fit bins: FINER than the 8-bit reliability table


@query(
    "corpus_nb_isotonic_calibration",
    oracle=f"""
    WITH nbsrc AS ({{NB}}),
    ncal AS (
        SELECT bin,
               CAST(bin * {_ISO_W} AS BIGINT) AS lo_bits,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(seed_label) AS BIGINT) AS n_seed_pos,
               CAST(SUM(seed_label) AS DOUBLE) / COUNT(*) AS empirical_rate
        FROM (
            SELECT CAST(FLOOR(CAST(nb_bits AS DOUBLE) / {_ISO_W}) AS BIGINT) AS bin,
                   seed_label
            FROM nbsrc
        )
        GROUP BY bin
    ),
    ncum AS (
        SELECT bin, lo_bits, n_docs, n_seed_pos, empirical_rate,
               CAST(SUM(n_docs) OVER (ORDER BY bin) AS BIGINT) AS cd,
               CAST(SUM(n_seed_pos) OVER (ORDER BY bin) AS BIGINT) AS cp
        FROM ncal
    ),
    nseg AS (
        SELECT j.bin AS jb, k.bin AS kb,
               CAST(k.cp - j.cp + j.n_seed_pos AS DOUBLE)
                 / (k.cd - j.cd + j.n_docs) AS seg_rate
        FROM ncum j JOIN ncum k ON j.bin <= k.bin
    ),
    nmin AS (
        SELECT i.bin AS bin, s.jb, MIN(s.seg_rate) AS mn
        FROM ncum i JOIN nseg s ON s.jb <= i.bin AND s.kb >= i.bin
        GROUP BY i.bin, s.jb
    ),
    niso AS (SELECT bin, MAX(mn) AS iso_rate FROM nmin GROUP BY bin)
    SELECT c.bin, c.lo_bits, c.n_docs, c.n_seed_pos, c.empirical_rate,
           i.iso_rate
    FROM ncal c JOIN niso i ON i.bin = c.bin
    """,
    tags=("llm", "quality", "classifier", "calibration", "isotonic"),
)
def corpus_nb_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (pool-adjacent-violators) regression of the NB
    reliability table — the step r13's measurement demanded: the raw
    empirical rates wobble within bins (the measured 4-bit
    non-monotonicity), and production pipelines regress them MONOTONE
    before picking a threshold on the calibrated probability scale
    (Zadrozny & Elkan 2002's standard recipe).

    The fit runs over 4-BIT bins — finer than the 8-bit reliability
    table (`corpus_nb_calibration`) — deliberately: r13 measured that
    4-bit rates wobble (1.0 -> 0.972 at sf0.01) and coarsened the
    TABLE to 8 bits to stay monotone; the isotonic fit exists to
    absorb exactly that wobble, so it un-blocks the finer resolution
    and the pooling is exercised on real data (iso != empirical on
    the violating bins), not vacuous on an already-monotone input.

    Implementation is the closed minimax form, not the sequential
    pooling loop: iso(i) = max over j <= i of min over k >= i of the
    pooled rate of bins [j..k] (Robertson/Wright/Dykstra, Ch. 1) —
    every pooled rate is ONE division of exact BIGINT prefix-sum
    differences, and MIN/MAX over identical double sets are
    engine-independent, so the whole fit is value-oracled. The
    minimax form replays identically in set-oriented SQL on both
    engines, where the sequential PAV loop would need a recursive
    CTE with list state.

    Monotonicity of the output is a THEOREM of the minimax form
    (i < i' implies the max runs over more j and the min over fewer
    k), pinned in tests/test_isotonic.py along with PAV's
    total-preservation property (sum of n_docs * iso_rate equals sum
    of n_seed_pos).

    Scale: the table is <= ~17 rows (256-bit score range / 8-bit
    bins), so the triple-index join is a few hundred broadcast rows —
    the corpus-scale work is all in the nested classifier, whose
    dataflow is inherited unchanged. The unpartitioned window sums
    order a bounded relation (bin keys), never corpus rows."""
    from bigdata_project_spark.caching import tracked_persist

    from pyspark.sql.window import Window as W

    nb = corpus_nb_quality_classifier(spark, sf_dir)
    cal = (
        nb.select(
            F.floor(F.col("nb_bits").cast("double") / _ISO_W)
            .cast("long")
            .alias("bin"),
            "seed_label",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("seed_label").cast("long").alias("n_seed_pos"),
            (F.sum("seed_label").cast("double") / F.count("*")).alias(
                "empirical_rate"
            ),
        )
        .select(
            "bin",
            (F.col("bin") * _ISO_W).cast("long").alias("lo_bits"),
            "n_docs",
            "n_seed_pos",
            "empirical_rate",
        )
    )
    wcum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = tracked_persist(
        cal.select(
            "bin",
            "lo_bits",
            "n_docs",
            "n_seed_pos",
            "empirical_rate",
            F.sum("n_docs").over(wcum).cast("long").alias("cd"),
            F.sum("n_seed_pos").over(wcum).cast("long").alias("cp"),
        )
    )
    j = cum.select(
        F.col("bin").alias("jb"),
        F.col("n_docs").alias("jn"),
        F.col("n_seed_pos").alias("jp"),
        F.col("cd").alias("jcd"),
        F.col("cp").alias("jcp"),
    )
    k = cum.select(
        F.col("bin").alias("kb"), F.col("cd").alias("kcd"), F.col("cp").alias("kcp")
    )
    seg = j.join(F.broadcast(k), F.col("jb") <= F.col("kb")).select(
        "jb",
        "kb",
        (
            (F.col("kcp") - F.col("jcp") + F.col("jp")).cast("double")
            / (F.col("kcd") - F.col("jcd") + F.col("jn"))
        ).alias("seg_rate"),
    )
    mn = (
        cum.select("bin")
        .join(
            F.broadcast(seg),
            (F.col("jb") <= F.col("bin")) & (F.col("kb") >= F.col("bin")),
        )
        .groupBy("bin", "jb")
        .agg(F.min("seg_rate").alias("mn"))
    )
    iso = mn.groupBy("bin").agg(F.max("mn").alias("iso_rate")).select(
        F.col("bin").alias("i_bin"), "iso_rate"
    )
    return cum.join(F.broadcast(iso), F.col("bin") == F.col("i_bin")).select(
        "bin", "lo_bits", "n_docs", "n_seed_pos", "empirical_rate", "iso_rate"
    )


REGISTRY["corpus_nb_isotonic_calibration"].oracle = REGISTRY[
    "corpus_nb_isotonic_calibration"
].oracle.format(NB=REGISTRY["corpus_nb_quality_classifier"].oracle)


_CAL_THRESHOLD = 0.5  # keep when the calibrated P(quality) clears a coin flip


@query(
    "corpus_nb_calibrated_gate",
    oracle=f"""
    SELECT n.doc_id,
           CAST(n.nb_bits AS BIGINT) AS nb_bits,
           i.bin,
           i.iso_rate AS calibrated_p,
           CAST(n.nb_keep AS INT) AS nb_keep,
           CAST(i.iso_rate >= {_CAL_THRESHOLD} AS INT) AS cal_keep
    FROM ({{NB}}) n
    JOIN ({{ISO}}) i
      ON i.bin = CAST(FLOOR(CAST(n.nb_bits AS DOUBLE) / {_ISO_W}) AS BIGINT)
    """,
    tags=("llm", "quality", "classifier", "calibration", "gate"),
)
def corpus_nb_calibrated_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The calibrated keep decision — what r13's reliability table
    and this round's isotonic fit exist FOR: each document's score
    bin maps to its isotonic P(quality), and the gate keeps documents
    whose CALIBRATED probability clears the threshold, not documents
    whose raw log-odds clear zero. Where cal_keep differs from
    nb_keep is exactly the miscalibration the reliability table
    exposed, now acted on (nb_keep is the implied-posterior-at-0.5
    decision; cal_keep is the empirical-posterior-at-0.5 decision).

    Binning reuses the isotonic fit's exact FLOOR(bits/4) expression
    (the r13 negative-score div/floor lesson), so every scored doc
    joins exactly one bin — the fit's support is the classifier's
    support by construction.

    Scale: the isotonic table is <= ~17 rows broadcast onto the
    doc-keyed classifier output — one map-side hash join, no new
    corpus-scale stage."""
    nb = corpus_nb_quality_classifier(spark, sf_dir)
    iso = corpus_nb_isotonic_calibration(spark, sf_dir).select(
        F.col("bin").alias("g_bin"), F.col("iso_rate")
    )
    binned = nb.select(
        "doc_id",
        F.col("nb_bits").cast("long").alias("nb_bits"),
        F.col("nb_keep").cast("int").alias("nb_keep"),
        F.floor(F.col("nb_bits").cast("double") / _ISO_W).cast("long").alias("bin"),
    )
    return binned.join(F.broadcast(iso), F.col("bin") == F.col("g_bin")).select(
        "doc_id",
        "nb_bits",
        "bin",
        F.col("iso_rate").alias("calibrated_p"),
        "nb_keep",
        (F.col("iso_rate") >= _CAL_THRESHOLD).cast("int").alias("cal_keep"),
    )


REGISTRY["corpus_nb_calibrated_gate"].oracle = REGISTRY[
    "corpus_nb_calibrated_gate"
].oracle.format(
    NB=REGISTRY["corpus_nb_quality_classifier"].oracle,
    ISO=REGISTRY["corpus_nb_isotonic_calibration"].oracle,
)


@query(
    "corpus_quality_ensemble_cal_gate",
    oracle="""
    SELECT g.doc_id,
           CAST(g.full_keep AS INT) AS gopher_full_keep,
           CAST(n.cal_keep AS INT) AS cal_keep,
           CAST(l.keep AS INT) AS lm_keep,
           CAST(g.full_keep + n.cal_keep + l.keep AS INT) AS n_votes,
           CAST(g.full_keep + n.cal_keep + l.keep >= 2 AS INT) AS ensemble_keep
    FROM ({G}) g
    JOIN ({CAL}) n ON n.doc_id = g.doc_id
    JOIN ({LM}) l ON l.doc_id = g.doc_id
    """,
    tags=("llm", "quality", "gate", "ensemble", "calibration"),
)
def corpus_quality_ensemble_cal_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r14 re-base of the 2-of-3 quality ensemble on this
    round's two upgrades: the FULL Gopher rule set replaces the base
    five rules, and the isotonic-CALIBRATED NB keep replaces the raw
    log-odds keep — the ensemble a pipeline ships after acting on
    both the rule audit and the reliability table. Vote arithmetic,
    support discipline (intersection of the three signals' supports,
    inner joins), and the 2-of-3 bounds are exactly
    `corpus_quality_ensemble_gate`'s; all three component oracles
    nest, so the composed verdict stays value-verified end to end.
    tests/test_ensemble.py pins the vote arithmetic and that the
    calibrated ensemble keeps a SUPERSET-or-equal of... nothing — it
    pins the measured relationship instead: the calibrated NB keeps
    more docs than the raw NB (the under-confidence flip), while the
    full rules keep fewer than the base rules, so the two re-bases
    pull the vote in opposite directions; the test records where the
    composed verdicts differ.

    Scale: three doc_id-keyed equi-joins over outputs of
    scale-shaped pipelines — no new corpus-scale stage (the
    corpus_quality_ensemble_gate argument verbatim)."""
    from bigdata_project_spark.operators.corpus_ext import (
        quality_gopher_full_rules,
    )

    g = quality_gopher_full_rules(spark, sf_dir).select(
        "doc_id", F.col("full_keep").cast("int").alias("gopher_full_keep")
    )
    cal = corpus_nb_calibrated_gate(spark, sf_dir).select(
        F.col("doc_id").alias("n_did"), F.col("cal_keep").cast("int").alias("cal_keep")
    )
    lmk = corpus_lm_perplexity_gate(spark, sf_dir).select(
        F.col("doc_id").alias("l_did"), F.col("keep").cast("int").alias("lm_keep")
    )
    votes = F.col("gopher_full_keep") + F.col("cal_keep") + F.col("lm_keep")
    return (
        g.join(cal, F.col("doc_id") == F.col("n_did"))
        .join(lmk, F.col("doc_id") == F.col("l_did"))
        .select(
            "doc_id",
            "gopher_full_keep",
            "cal_keep",
            "lm_keep",
            votes.cast("int").alias("n_votes"),
            (votes >= 2).cast("int").alias("ensemble_keep"),
        )
    )


REGISTRY["corpus_quality_ensemble_cal_gate"].oracle = REGISTRY[
    "corpus_quality_ensemble_cal_gate"
].oracle.format(
    G=REGISTRY["quality_gopher_full_rules"].oracle,
    CAL=REGISTRY["corpus_nb_calibrated_gate"].oracle,
    LM=REGISTRY["corpus_lm_perplexity_gate"].oracle,
)
