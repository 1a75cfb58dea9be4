"""Text-analysis operators over documents (SURVEY.md §2.10).

Language-ID (marker-token scoring), quality scoring, token counting
(whitespace + BPE-ish regex), and per-group normalization. The hot
path is all built-in JVM string/regex functions; the two Python UDFs
(vectorized pandas_udf + applyInPandas) exist to demonstrate the
Arrow-batched UDF surface on arithmetic that stays engine-portable
(integer sufficient statistics, IEEE double ops).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load, load_spread

# language -> marker-token regex (word-bounded). The testbed corpus is
# synthetic word salad, so predictions are exercised for determinism,
# not accuracy; the `correct` flag measures agreement with the label.
_LANG_MARKERS = {
    "en": r"\b(the|a|of|and|is)\b",
    "fr": r"\b(le|la|et|de|un)\b",
    "de": r"\b(der|die|und|ein)\b",
    "es": r"\b(el|los|y|una)\b",
}


@query(
    "text_stats_quality",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_re,
           CAST(length(text) = n_chars AS INT) AS n_chars_consistent,
           len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS n_tokens,
           length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace_chars,
           len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           CAST(len(regexp_extract_all(lower(text), '\\b(the|a|of|and|is)\\b')) AS DOUBLE)
             / NULLIF(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')), 0) AS stopword_ratio,
           CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
             / NULLIF(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')), 0) AS avg_token_len
    FROM documents
    """,
    tags=("text", "llm"),
)
def text_stats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring statistics: char/token counts, punctuation,
    stopword ratio, average token length — the standard LLM-corpus
    quality features, all as single-pass JVM expressions. Zero-token
    documents (empty / whitespace-only text — routine at corpus
    scale) get NULL ratios via an explicit NULLIF denominator in both
    engines; an unguarded divide hard-errors under ANSI on the first
    empty document (found by the round-7 edge-strings twin)."""
    docs = load(spark, sf_dir, "documents")
    tokens = F.array_remove(F.split(F.lower(F.col("text")), r"\s+"), "")
    n_tokens = F.size(tokens)
    n_nonspace = F.length(F.regexp_replace("text", r"\s+", ""))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_re"),
        (F.length("text") == F.col("n_chars")).cast("int").alias("n_chars_consistent"),
        n_tokens.alias("n_tokens"),
        n_nonspace.alias("n_nonspace_chars"),
        F.regexp_count("text", F.lit(r"[.,!?;:]")).alias("n_punct"),
        (
            F.regexp_count(F.lower("text"), F.lit(r"\b(the|a|of|and|is)\b")).cast("double")
            / F.nullif(n_tokens, F.lit(0))
        ).alias("stopword_ratio"),
        (n_nonspace.cast("double") / F.nullif(n_tokens, F.lit(0))).alias("avg_token_len"),
    )


_SQL_LANG_SCORES = ",\n".join(
    f"len(regexp_extract_all(lower(text), '{pat}')) AS sc_{lang}"
    for lang, pat in _LANG_MARKERS.items()
)
_SQL_LANG_PICK = """
    CASE WHEN sc_en >= sc_fr AND sc_en >= sc_de AND sc_en >= sc_es THEN 'en'
         WHEN sc_fr >= sc_de AND sc_fr >= sc_es THEN 'fr'
         WHEN sc_de >= sc_es THEN 'de'
         ELSE 'es' END
"""


@query(
    "text_langid_markers",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, {_SQL_LANG_SCORES} FROM documents
    )
    SELECT doc_id, lang,
           sc_en, sc_fr, sc_de, sc_es,
           {_SQL_LANG_PICK} AS predicted,
           CAST(({_SQL_LANG_PICK}) = lang AS INT) AS correct
    FROM scored
    """,
    tags=("text", "llm", "langid"),
)
def text_langid_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: marker-token hit counts per language,
    argmax with a fixed priority order (deterministic tie-break)."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            F.regexp_count(F.lower("text"), F.lit(pat)).alias(f"sc_{lang}")
            for lang, pat in _LANG_MARKERS.items()
        ],
    )
    en, fr, de, es = (F.col(f"sc_{x}") for x in ("en", "fr", "de", "es"))
    pick = (
        F.when((en >= fr) & (en >= de) & (en >= es), "en")
        .when((fr >= de) & (fr >= es), "fr")
        .when(de >= es, "de")
        .otherwise("es")
    )
    return scored.select(
        "doc_id",
        "lang",
        "sc_en",
        "sc_fr",
        "sc_de",
        "sc_es",
        pick.alias("predicted"),
        (pick == F.col("lang")).cast("int").alias("correct"),
    )


@query(
    "text_token_count_bpe",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_bpe_tokens,
           len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_ws_tokens,
           CAST(length(text) AS DOUBLE)
             / NULLIF(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')), 0) AS chars_per_token
    FROM documents
    """,
    tags=("text", "llm", "tokenize"),
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    tokenization (word runs + single non-space punctuation) — the
    cheap token-budget estimator for corpus sizing. Zero-token
    documents get a NULL chars_per_token via NULLIF in both engines
    (round-7 edge-strings twin; unguarded ANSI divide hard-errors)."""
    docs = load(spark, sf_dir, "documents")
    n_bpe = F.regexp_count("text", F.lit(r"\w+|[^\w\s]"))
    n_ws = F.size(F.array_remove(F.split(F.col("text"), r"\s+"), ""))
    return docs.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        n_ws.alias("n_ws_tokens"),
        (F.length("text").cast("double") / F.nullif(n_bpe, F.lit(0))).alias("chars_per_token"),
    )


@query(
    "text_quality_pandas_udf",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS n_tokens,
               length(text) AS n_chars
        FROM documents
    )
    SELECT doc_id,
           -- explicit NULL propagation: DuckDB's LEAST *skips* NULL
           -- arguments (scoring a missing doc 1.0); the engine's
           -- pandas UDF propagates (NaN -> Arrow null), which is the
           -- semantics we want for unscorable input
           CASE WHEN n_tokens IS NULL OR n_chars IS NULL THEN NULL
                ELSE 0.5 * LEAST(CAST(n_tokens AS DOUBLE) / 64, 1.0)
                   + 0.5 * LEAST(CAST(n_chars AS DOUBLE) / 512, 1.0) END AS quality
    FROM f
    """,
    tags=("text", "llm", "udf"),
)
def text_quality_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas_udf computing a quality score.

    Demonstrates the UDF surface (README.md:22 'UDFs') on arithmetic
    that is engine-portable (pure IEEE double ops, no reductions).
    Built-ins are preferred for this in production — see
    text_stats_quality — but when Python is unavoidable this is the
    shape: Arrow batches, numpy vector ops, never row-at-a-time.
    """

    @F.pandas_udf(T.DoubleType())
    def quality(n_tokens: pd.Series, n_chars: pd.Series) -> pd.Series:
        t = (n_tokens.astype("float64") / 64).clip(upper=1.0)
        c = (n_chars.astype("float64") / 512).clip(upper=1.0)
        return 0.5 * t + 0.5 * c

    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.array_remove(F.split(F.lower(F.col("text")), r"\s+"), ""))
    return docs.select(
        "doc_id",
        quality(n_tokens, F.length("text")).alias("quality"),
    )


@query(
    "udaf_weighted_avg_discount",
    oracle="""
    WITH c AS (
        SELECT l_returnflag,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS q,
               CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS disc_bp
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(SUM(q * disc_bp) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS wavg_disc_bp
    FROM c
    GROUP BY l_returnflag
    """,
    tags=("udf", "udaf", "agg"),
)
def udaf_weighted_avg_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas GROUPED_AGG UDAF (SURVEY §2.10): quantity-weighted
    average discount (in basis points). Engine-portable because the
    UDAF reduces over exact int64 sums — the same discipline as the
    JVM-side decimal aggregates. Arrow moves each group's columns as
    one batch; at scale this is a normal shuffle-on-key aggregation
    with a Python final step, no driver involvement."""
    from pyspark.sql import types as T2

    @F.pandas_udf(T2.DoubleType())
    def wavg(q: pd.Series, bp: pd.Series) -> float:
        qi = q.round().astype("int64")
        bpi = bp.astype("int64")
        return float(int((qi * bpi).sum())) / float(int(qi.sum()))

    l = load(spark, sf_dir, "lineitem")
    prepped = l.select(
        "l_returnflag",
        F.round("l_quantity", 0).cast("long").alias("q"),
        F.round(F.col("l_discount") * 10000, 0).cast("long").alias("disc_bp"),
    )
    return prepped.groupBy("l_returnflag").agg(wavg("q", "disc_bp").alias("wavg_disc_bp"))


@query(
    "text_tfidf_top3",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS token
        FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    )
    SELECT doc_id, token, tfidf, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, token) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
    tags=("text", "llm", "tfidf"),
)
def text_tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document.

    Pure relational form (token explode -> tf/df aggregates -> join):
    one shuffle on token for df, one on doc for the top-k — the shape
    that scales (pyspark.ml HashingTF+IDF gives the same pipeline with
    feature hashing when the vocabulary doesn't fit). Scores rounded
    to 6 decimals: natural log differs in the last ulp across libm
    implementations, the rounded value doesn't."""
    from pyspark.sql.window import Window as W

    docs = load_spread(spark, sf_dir, "documents")
    toks = (
        docs
        .select("doc_id", F.explode(F.array_remove(F.split(F.lower("text"), r"\s+"), "")).alias("token"))
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = tf.join(df_, "token").select(
        "doc_id",
        "token",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return scored.select("*", F.row_number().over(w).alias("rnk")).filter(F.col("rnk") <= 3)


@query(
    "text_zscore_grouped_pandas",
    oracle="""
    WITH s AS (
        SELECT lang, COUNT(*) AS n,
               SUM(n_chars) AS sx,
               SUM(n_chars * n_chars) AS sxx
        FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           CASE WHEN s.n > 1 AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) > 0
                THEN (d.n_chars - CAST(sx AS DOUBLE) / n)
                     / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
                ELSE 0.0 END AS z_chars
    FROM documents d JOIN s ON d.lang = s.lang
    """,
    tags=("text", "llm", "udf", "grouped"),
)
def text_zscore_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-language z-score normalization
    of document length (per-district normalization pattern,
    SURVEY §2.10). Uses exact integer sufficient statistics inside
    the pandas group so results are engine-portable — numpy's
    pairwise-summation mean() would not be.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("z_chars", T.DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].astype("int64")
        n = len(x)
        sx = int(x.sum())
        sxx = int((x * x).sum())
        var_num = float(sxx) - float(sx) * sx / n if n > 1 else 0.0
        if n > 1 and var_num > 0:
            mean = float(sx) / n
            std = ((float(sxx) - float(sx) * sx / n) / (n - 1)) ** 0.5
            z = (x - mean) / std
        else:
            z = pd.Series([0.0] * n, index=x.index)
        return pd.DataFrame({"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z_chars": z})

    return docs.groupBy("lang").applyInPandas(zscore, schema)


_BM25_TERMS = ("data", "join", "stream")
_K1, _B = 1.2, 0.75


def _bm25_term_expr(t: str) -> str:
    """One term's BM25 contribution — identical text on both engines
    (columns: tf_<t>, dl, n_docs, avgdl, df_<t>). Log-free rational
    IDF: only +,*,/ on doubles, so the score is bit-identical across
    engines (libm ln() can differ in the last ulp between JVM and C)."""
    # e-notation literals parse as DOUBLE in both engines; a bare
    # `2.2` is DECIMAL in Spark SQL (exact decimal multiply, then
    # convert) but effectively DOUBLE in DuckDB — a 1-ulp divergence
    idf = f"((n_docs - df_{t} + 0.5e0) / (df_{t} + 0.5e0))"
    tfp = (
        f"((tf_{t} * {_K1 + 1}e0) / "
        f"(tf_{t} + {_K1}e0 * ({1 - _B}e0 + {_B}e0 * (dl / avgdl))))"
    )
    return f"({idf} * {tfp})"


_BM25_SCORE = " + ".join(_bm25_term_expr(t) for t in _BM25_TERMS)
_SQL_TF = ",\n".join(
    f"len(list_filter(words, x -> x = '{t}')) AS tf_{t}" for t in _BM25_TERMS
)
_SQL_DF = ",\n".join(
    f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in _BM25_TERMS
)


def _tf_col(words, term: str):
    # NB: the lambda must take exactly one parameter — a second
    # parameter (even a defaulted one) makes Spark pass the element
    # INDEX as the extra argument
    return F.size(F.filter(words, lambda x: x == term))


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS words
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, len(words) AS dl, {_SQL_TF}
        FROM toks
    ),
    corpus AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               {_SQL_DF}
        FROM per_doc
    )
    SELECT doc_id, {_BM25_SCORE} AS score
    FROM per_doc, corpus
    WHERE tf_data + tf_join + tf_stream > 0
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
    tags=("text", "llm", "bm25", "ranking"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking for a fixed query ('data join stream'):
    per-doc term frequencies + corpus stats (N, avgdl, per-term df)
    -> k1/b-saturated scores -> top-20.

    Shape at 100 TB: one scan computes per-doc tf/dl (codegen'd array
    algebra, no Python); corpus stats are a 1-row aggregate broadcast
    back; scoring is a map-side expression and top-20 is
    TakeOrderedAndProject — no shuffle except the stats aggregate.
    The scoring expression string is shared verbatim with the oracle,
    and its IDF is the log-free rational form, so scores are
    bit-identical across engines."""
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
    scored = (
        per_doc.crossJoin(F.broadcast(corpus))
        .filter(sum(F.col(f"tf_{t}") for t in _BM25_TERMS) > 0)
        .select("doc_id", F.expr(_BM25_SCORE).alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(20)


@query(
    "text_langid_confusion",
    oracle=f"""
    WITH scored AS (
        SELECT lang, {_SQL_LANG_PICK.replace(chr(10), ' ')} AS predicted
        FROM (SELECT lang, {_SQL_LANG_SCORES} FROM documents)
    ),
    cells AS (
        SELECT lang, predicted, COUNT(*) AS n_docs
        FROM scored GROUP BY lang, predicted
    )
    SELECT lang, predicted, n_docs,
           CAST(n_docs AS DOUBLE)
             / SUM(n_docs) OVER (PARTITION BY lang) AS share_of_true
    FROM cells
    """,
    tags=("text", "llm", "langid", "eval"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: per (true lang, predicted lang)
    document counts plus each cell's share of its true-language row —
    the eval that shows WHERE the marker heuristic fails, not just
    how often (here: 'zh' has no marker set, so its row is 100%
    misclassification pressure on the other labels — exactly the
    signal that tells a pipeline owner to add a marker family before
    scaling up).

    Scale: the scoring is the existing map-only marker pass; the
    matrix is a #langs^2-row aggregate, and the per-row share window
    runs over those few cells, not the corpus."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        *[
            F.regexp_count(F.lower("text"), F.lit(pat)).alias(f"sc_{lang}")
            for lang, pat in _LANG_MARKERS.items()
        ],
    )
    en, fr, de, es = (F.col(f"sc_{x}") for x in ("en", "fr", "de", "es"))
    pick = (
        F.when((en >= fr) & (en >= de) & (en >= es), "en")
        .when((fr >= de) & (fr >= es), "fr")
        .when(de >= es, "de")
        .otherwise("es")
    )
    cells = (
        scored.select("lang", pick.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "predicted",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias("share_of_true"),
    )


@query(
    "text_novelty_share",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id, substring(text, r.r + 1, 8) AS s
        FROM documents,
             LATERAL (SELECT unnest(range(greatest(length(text) - 7, 1))) AS r) r
    ), firsts AS (
        SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS novelty_share
    FROM sh JOIN firsts f ON sh.s = f.s
    GROUP BY sh.doc_id
    """,
    tags=("text", "llm", "novelty", "dedup"),
)
def text_novelty_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content novelty per document: the share of a doc's distinct
    8-char shingles whose FIRST appearance (minimum doc_id) is this
    doc — the curation metric that separates fresh content from
    recombinations of already-ingested text, complementing pairwise
    dedup (a doc can evade every near-dup pair test yet be 95%
    recycled shingles; novelty_share catches exactly that).

    'First' is the deterministic min(doc_id) owner per shingle — a
    stable arrival order (the incremental-merge batch convention),
    not wall-clock. n_novel and n_shingles are exact integers;
    the share is one double division.

    Scale: shingle explode is map-side; the per-shingle min(doc_id)
    is a map-combined aggregate; the join back to doc shingles is a
    plain equi-join on the shingle (both sides pre-shrunk to
    distinct (doc, shingle) pairs). Per-doc shingle counts are
    bounded by document length — no df cap needed because nothing
    here collects postings, only a min and a bit."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sh = (
        docs.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.length("text") - 8, F.lit(0)))
            ).alias("r"),
            "text",
        )
        .select("doc_id", F.expr("substring(text, r + 1, 8)").alias("s"))
        .distinct()
    )
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        sh.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(novel).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_shingles")).alias(
                "novelty_share"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "text_nfkc_casefold",
    oracle=None,  # DuckDB has no NFKC/casefold function — rows-only
    # BY DESIGN (5th member of the rows-only set, COVERAGE.md);
    # correctness is gated by tests/test_nfkc.py: pinned golden
    # mappings for every divergent-case-mapping character the r7
    # unicode probe documented, an idempotence property, and a
    # sampled cross-check against CPython's unicodedata on the twin
    # corpora.
    tags=("llm", "text", "unicode", "normalize"),
)
def text_nfkc_casefold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFKC-casefold normalization at the bronze -> silver boundary —
    the PRODUCTION CONTRACT the round-7 unicode audit documented
    (tests/test_degenerate_input.py::test_known_unicode_divergences:
    Spark's Java full case mapping and DuckDB's utf8proc simple fold
    disagree on ß/İ/final-sigma/ligatures, so engine-portable
    lower()/upper() comparisons require multilingual corpora to be
    NFKC-casefolded FIRST). This operator is that boundary pass,
    previously documented but not implemented: compatibility
    normalization (NFKC: fullwidth forms, ligatures, compatibility
    digits) followed by full Unicode casefolding (ß -> ss,
    İ -> i + combining dot, Σ/ς -> σ), emitted alongside change
    markers so the pipeline can audit how much text the boundary
    rewrites.

    Scale: one Arrow-batched mapInPandas over the documents scan —
    embarrassingly parallel, no shuffle; the normalization tables are
    CPython's unicodedata (bundled, versioned with the interpreter —
    the docstring of record for reproducibility is the Python build).
    NULL text passes through as NULL (in-contract: the quarantine/
    quality tiers own null handling)."""
    import unicodedata

    docs = load_spread(spark, sf_dir, "documents").select("doc_id", "text")

    def normalize(batches):
        for pdf in batches:
            out_text = []
            changed = []
            for t in pdf["text"]:
                if t is None:
                    out_text.append(None)
                    changed.append(None)
                else:
                    norm = unicodedata.normalize("NFKC", t).casefold()
                    out_text.append(norm)
                    changed.append(int(norm != t))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "text_norm": out_text, "changed": changed}
            )

    return docs.mapInPandas(
        normalize, "doc_id long, text_norm string, changed int"
    )
