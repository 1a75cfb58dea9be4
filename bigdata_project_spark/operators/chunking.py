"""Document chunking, vocabulary building, and weighted sampling
(SURVEY.md §2.10 widening, round 4) — the slicing stages of a
training-data pipeline that sit between cleaning (corpus.py) and
sequence packing (pack_sequences_*): fixed-window overlapping chunks
for context-length-bounded training, a corpus vocabulary for
tokenizer construction, and deterministic quality-weighted document
sampling for mixture tuning.

Scale shapes:
- chunking is a pure per-row explode — no shuffle at all; output
  rows carry token offsets + an md5 fingerprint, never a second copy
  of the text;
- vocabulary is one (token -> count) shuffle with map-side combine,
  then TakeOrderedAndProject for the top-k — the full token stream
  never leaves the mappers un-aggregated;
- weighted sampling is a stateless scan-side predicate (md5 fixed-
  point arithmetic, no RNG) — trivially parallel, reproducible under
  retries, and a document's keep/drop never changes as the corpus
  grows (same property as split_train_val_test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.operators.dedup import words_col
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load

_WINDOW = 64  # tokens per chunk
_STRIDE = 48  # tokens between chunk starts (=> 16-token overlap)

_SQL_WORDS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

_HEX16 = "0123456789abcdef"


def _hash_bucket_sql(cast_type: str, col: str = "doc_id", chars: int = 4) -> str:
    """First `chars` hex chars of md5(col) as an integer in
    [0, 16^chars) — instr-table arithmetic, identical in Spark SQL and
    DuckDB (conv()/to-int builtins differ between engines; see
    corpus.py's split buckets for the 2-char variant)."""
    h = f"md5(CAST({col} AS {cast_type}))"
    terms = []
    for i in range(chars):
        terms.append(
            f"(instr('{_HEX16}', substring({h}, {i + 1}, 1)) - 1) * {16 ** (chars - 1 - i)}"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "chunk_documents_overlap",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_SQL_WORDS} AS words
        FROM documents
    ),
    t AS (
        SELECT doc_id, words, len(words) AS n FROM tok WHERE len(words) > 0
    )
    SELECT doc_id,
           CAST(start / {_STRIDE} AS BIGINT) AS chunk_idx,
           start AS chunk_start,
           least({_WINDOW}, n - start) AS chunk_n_tokens,
           md5(array_to_string(
               list_slice(words, start + 1, least(start + {_WINDOW}, n)), ' ')) AS chunk_md5
    FROM (SELECT doc_id, words, n, unnest(range(0, n, {_STRIDE})) AS start FROM t)
    """,
    tags=("llm", "chunking", "generator"),
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window overlapping chunking: {_WINDOW}-token chunks every
    {_STRIDE} tokens (16-token overlap so no boundary context is lost
    to training). Pure map-side: tokenize -> sequence of starts ->
    explode -> slice; each output row is (doc, chunk offset, length,
    md5 fingerprint) — the fingerprint stands in for the chunk text so
    the result stays narrow (downstream chunk-level dedup joins on it
    without re-tokenizing). Zero shuffles; chunk boundaries are a pure
    function of the text, so re-chunking a grown corpus never moves
    existing chunks."""
    docs = load(spark, sf_dir, "documents")
    words = words_col(F.col("text"))
    t = docs.select("doc_id", words.alias("words")).withColumn("n", F.size("words")).filter(
        F.col("n") > 0
    )
    t = t.select(
        "doc_id",
        "words",
        "n",
        F.posexplode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(_STRIDE))).alias(
            "chunk_idx", "chunk_start"
        ),
    )
    chunk = F.slice(
        F.col("words"),
        F.col("chunk_start") + 1,
        F.least(F.lit(_WINDOW), F.col("n") - F.col("chunk_start")),
    )
    return t.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "chunk_start",
        F.least(F.lit(_WINDOW), F.col("n") - F.col("chunk_start")).alias("chunk_n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


_VOCAB_K = 500


@query(
    "vocab_top_terms",
    oracle=f"""
    SELECT token, n_occurrences, n_docs, rank FROM (
        SELECT token, n_occurrences, n_docs,
               ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS rank
        FROM (
            SELECT token, COUNT(*) AS n_occurrences,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM (SELECT doc_id, unnest({_SQL_WORDS}) AS token FROM documents)
            GROUP BY token
        )
    ) WHERE rank <= {_VOCAB_K}
    """,
    tags=("llm", "vocab", "text"),
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-{_VOCAB_K} tokens by occurrence count
    (document frequency alongside), ranked with a token tiebreaker so
    the cut is deterministic. One (token) shuffle with map-side
    partial aggregation — the 100 TB token stream reduces to distinct
    tokens before moving — then TakeOrderedAndProject; the rank window
    runs single-partition over only the surviving {_VOCAB_K} rows."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("token"))
    counts = tok.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    top = counts.orderBy(F.desc("n_occurrences"), "token").limit(_VOCAB_K)
    w = W.orderBy(F.desc("n_occurrences"), "token")
    return top.select("token", "n_occurrences", "n_docs", F.row_number().over(w).alias("rank"))


@query(
    "sample_quality_weighted",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source,
               len({_SQL_WORDS}) AS n_tokens,
               least(1.0, CAST(len({_SQL_WORDS}) AS DOUBLE) / 200.0) AS keep_p,
               {_hash_bucket_sql("VARCHAR")} AS bucket
        FROM documents
    )
    SELECT doc_id, source, n_tokens, keep_p
    FROM scored
    WHERE CAST(bucket AS DOUBLE) < keep_p * 65536.0
    """,
    tags=("llm", "sample", "quality"),
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: each document's keep
    probability scales with its token count (a stand-in for any
    quality score), and the keep decision is md5(doc_id)'s 16-bit
    bucket against that probability — fixed-point hash arithmetic, no
    RNG, so the sample is identical across engines, retries, and
    reruns, and a document's fate never changes as other documents
    arrive (upsampling high-quality sources in a growing corpus stays
    stable). Stateless scan-side predicate: zero shuffles."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(words_col(F.col("text")))
    keep_p = F.least(F.lit(1.0), n_tokens.cast("double") / 200.0)
    bucket = F.expr(_hash_bucket_sql("STRING"))
    return (
        docs.select(
            "doc_id",
            "source",
            n_tokens.alias("n_tokens"),
            keep_p.alias("keep_p"),
            bucket.alias("bucket"),
        )
        .filter(F.col("bucket").cast("double") < F.col("keep_p") * 65536.0)
        .drop("bucket")
    )
