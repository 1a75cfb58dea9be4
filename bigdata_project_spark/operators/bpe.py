"""BPE tokenizer induction (round 11).

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) is THE
subword-vocabulary trainer of modern LLM pipelines, and it is a
corpus-scale counting problem before it is anything else: every
training run starts by inducing the merge table from the corpus the
model will read. The repo already COUNTS BPE-ish tokens
(`text_token_count_bpe`, a regex segmenter); this module TRAINS the
merges.

Algorithm, exactly the reference semantics:

1. One corpus pass builds the word-frequency table (lowercased
   whitespace words, the `words_col` tokenizer every corpus operator
   shares). THIS is the only stage that touches the corpus — the
   standard trick that makes BPE training tractable at any scale:
   iterations run over the compressed vocabulary relation (~|V|
   rows), not the token stream. At 100 TB the vocab is millions of
   rows — thousandths of the corpus — and the corpus pass is one
   map-side-combinable word count.
2. Each word becomes its character sequence (no end-of-word marker —
   documented simplification; adding one is a 1-line seq append).
3. Per iteration: count ADJACENT symbol pairs weighted by word freq
   (overlaps included — the reference `get_stats` semantics), pick
   the argmax with the deterministic (count, left, right) descending
   tiebreak, then merge every occurrence GREEDILY LEFT-TO-RIGHT in
   every word ("aaa" + (a,a) -> ["aa","a"], never ["a","aa"]).

The greedy merge is implemented TWICE from independent derivations,
and the oracle match is the proof they agree:

- Spark: a per-word `aggregate()` fold — append the symbol, or pop
  the accumulator tail and push left||right when (tail, symbol) is
  the pair. After a merge the tail becomes the merged symbol, so an
  overlapping second occurrence cannot fire — greediness falls out
  of the fold for free. All fold arithmetic is JVM-side codegen
  (`try_element_at` keeps the empty-accumulator probe ANSI-safe).
- DuckDB: a positional derivation — candidate positions i with
  (seq[i], seq[i+1]) = (l, r) can only be CONSECUTIVE when l = r
  (a match at i+1 needs seq[i+1] = l and seq[i+1] = r), so greedy =
  "every other candidate within each gaps-and-islands run", i.e.
  ROW_NUMBER parity per island; kept matches rewrite position i and
  delete position i+1.

Per-iteration cost: one (l, r)-keyed pair-count shuffle over the
vocab relation (map-side combined), a 1-row argmax broadcast (the
whitelisted BNLJ pattern), and a map-only fold over vocab. The
iteration chain persists each vocab generation (it feeds both the
next pair count and the next merge — without the persist the lazy
plan re-derives generation k from scratch 2^(N-k) times).

Reference scope: [ext] — BASELINE north star (LLM training-data
pipeline); the reference has no text analysis at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.operators.dedup import words_col
from bigdata_project_spark.registry import REGISTRY, query
from bigdata_project_spark.tables import load_spread

_BPE_ITERS = 6

# the greedy left-to-right merge as a fold: pop-and-merge when the
# accumulator tail + current symbol is exactly the (l, r) pair
_MERGE_FOLD = """
    aggregate(seq, cast(array() as array<string>),
        (acc, s) -> CASE WHEN try_element_at(acc, -1) = l AND s = r
                    THEN concat(slice(acc, 1, size(acc) - 1),
                                array(concat(l, r)))
                    ELSE concat(acc, array(s)) END)
"""

# ------------------------------------------------------------- oracle SQL


def _bpe_sql(iters: int) -> str:
    """The unrolled DuckDB CTE chain: vocab -> char seqs -> `iters`
    rounds of (pair count, argmax, island-parity greedy merge).
    MATERIALIZED pins each generation to one evaluation — it{k} has
    three consumers, and inlined CTEs would re-derive the whole
    prefix per consumer (the same blowup the Spark side's persists
    prevent)."""
    parts = [
        """
    w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS words
        FROM documents
    ),
    vocab AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(words) AS word FROM w)
        GROUP BY word
    ),
    it0 AS MATERIALIZED (
        SELECT word, freq,
               list(substring(word, p.p, 1) ORDER BY p.p) AS seq
        FROM vocab, LATERAL (SELECT unnest(range(1, length(word) + 1)) AS p) p
        GROUP BY word, freq
    )"""
    ]
    for k in range(iters):
        parts.append(f"""
    p{k} AS (
        SELECT seq[t.i] AS l, seq[t.i + 1] AS r, SUM(freq) AS cnt
        FROM it{k}, LATERAL (SELECT unnest(range(1, len(seq))) AS i) t
        GROUP BY seq[t.i], seq[t.i + 1]
    ),
    b{k} AS MATERIALIZED (
        SELECT l, r, CAST(cnt AS BIGINT) AS cnt
        FROM p{k} ORDER BY cnt DESC, l DESC, r DESC LIMIT 1
    ),
    cand{k} AS (
        SELECT t.word, t.i
        FROM (SELECT word, seq[t.i] AS a, seq[t.i + 1] AS b2, t.i AS i
              FROM it{k}, LATERAL (SELECT unnest(range(1, len(seq))) AS i) t) t
        JOIN b{k} b ON t.a = b.l AND t.b2 = b.r
    ),
    isl{k} AS (
        SELECT word, i,
               i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS grp
        FROM cand{k}
    ),
    keep{k} AS MATERIALIZED (
        SELECT word, i FROM (
            SELECT word, i,
                   ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY i) AS rn
            FROM isl{k}
        ) WHERE rn % 2 = 1
    ),
    it{k + 1} AS MATERIALIZED (
        SELECT q.word, q.freq, list(q.sym ORDER BY q.p) AS seq
        FROM (
            SELECT s.word, s.freq, s.p,
                   CASE WHEN km.i IS NOT NULL THEN b.l || b.r ELSE s.sym0 END AS sym
            FROM (SELECT t.word, t.freq, p.p, t.seq[p.p] AS sym0
                  FROM it{k} t,
                       LATERAL (SELECT unnest(range(1, len(t.seq) + 1)) AS p) p) s
            LEFT JOIN b{k} b ON TRUE
            LEFT JOIN keep{k} km ON km.word = s.word AND km.i = s.p
            LEFT JOIN keep{k} kd ON kd.word = s.word AND kd.i = s.p - 1
            WHERE kd.i IS NULL
        ) q GROUP BY q.word, q.freq
    )""")
    return "WITH " + ",".join(parts)


_MERGES_TAIL = " UNION ALL ".join(
    f"SELECT {k} AS rank, l AS left_sym, r AS right_sym, l || r AS merged,"
    f" cnt AS pair_count FROM b{k}"
    for k in range(_BPE_ITERS)
)

# ------------------------------------------------------------ Spark side


def _bpe_train(spark: SparkSession, sf_dir: str):
    """(merges, final_vocab): run `_BPE_ITERS` rounds over the word-
    frequency table. merges = list of 1-row DataFrames (l, r, cnt);
    final_vocab = (word, freq, seq) after all merges applied."""
    from bigdata_project_spark.caching import tracked_persist

    docs = load_spread(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(words_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    it = vocab.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("seq"),
    )
    merges = []
    for _ in range(_BPE_ITERS):
        it = tracked_persist(it)
        adj = F.when(
            F.size("seq") >= 2,
            F.zip_with(
                F.slice("seq", 1, F.size("seq") - 1),
                F.slice("seq", 2, F.size("seq") - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            ),
        )
        best = (
            it.select("freq", F.explode(adj).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .agg(F.max(F.struct("cnt", "l", "r")).alias("m"))
            .select(
                F.col("m.l").alias("l"),
                F.col("m.r").alias("r"),
                F.col("m.cnt").cast("long").alias("cnt"),
            )
            # no adjacent pairs left (degenerate corpora: empty table,
            # all-null text, single-char words): the global max is one
            # all-NULL row — drop it so no merge is emitted and (via
            # the TRUE-conditioned left join below) the vocab passes
            # through unchanged, matching the oracle's empty b{k}
            .filter(F.col("l").isNotNull())
        )
        merges.append(best)
        it = it.join(F.broadcast(best), F.lit(True), "left").select(
            "word", "freq", F.expr(_MERGE_FOLD).alias("seq")
        )
    return merges, it


@query(
    "vocab_bpe_merges",
    oracle=f"""
    {_bpe_sql(_BPE_ITERS)}
    {_MERGES_TAIL}
    """,
    tags=("llm", "tokenizer", "bpe", "vocab", "iterative"),
)
def vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table: rank, the merged pair, and its
    weighted adjacency count at selection time. Iteration 5 on the
    testbed already produces a compositional merge (a rank-0 product
    participating as a symbol) — the recursion is exercised, not just
    the first character round. Module docstring has the algorithm,
    the two independent greedy-merge derivations, and the scale
    story."""
    merges, _ = _bpe_train(spark, sf_dir)
    out = None
    for k, m in enumerate(merges):
        row = m.select(
            F.lit(k).alias("rank"),
            F.col("l").alias("left_sym"),
            F.col("r").alias("right_sym"),
            F.concat("l", "r").alias("merged"),
            F.col("cnt").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "vocab_bpe_token_count",
    oracle=f"""
    {_bpe_sql(_BPE_ITERS)}
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(f.seq)) AS BIGINT) AS n_bpe_tokens
    FROM (SELECT doc_id, unnest(words) AS word FROM w) d
    JOIN it{_BPE_ITERS} f USING (word)
    GROUP BY d.doc_id
    """,
    tags=("llm", "tokenizer", "bpe", "vocab"),
)
def vocab_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token count under the induced tokenizer — the
    budget number a training pipeline actually bills by (token
    budgets, packing capacities, mixture weights are all in model
    tokens, not words). Re-tokenizes by joining the corpus word
    stream to the trained vocab's final segmentation (word ->
    len(seq)); a 100 TB corpus re-tokenizes with a vocab-table
    broadcast instead of running the merge loop per document. Docs
    with zero words have no rows (explode semantics, the
    `text_unigram_surprisal` contract)."""
    _, final_vocab = _bpe_train(spark, sf_dir)
    docs = load_spread(spark, sf_dir, "documents")
    word_len = final_vocab.select("word", F.size("seq").cast("long").alias("n_sub"))
    return (
        docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("word"))
        .join(word_len, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_bpe_tokens"),
        )
    )


assert "vocab_bpe_merges" in REGISTRY  # registration side effect


@query(
    "vocab_bpe_fertility_by_lang",
    oracle=f"""
    {_bpe_sql(_BPE_ITERS)}
    SELECT doc.lang,
           CAST(COUNT(DISTINCT d.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(f.seq)) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(len(f.seq)) AS DOUBLE) / COUNT(*) AS fertility
    FROM (SELECT doc_id, unnest(words) AS word FROM w) d
    JOIN it{_BPE_ITERS} f USING (word)
    JOIN documents doc ON doc.doc_id = d.doc_id
    GROUP BY doc.lang
    """,
    tags=("llm", "tokenizer", "bpe", "fertility", "audit"),
)
def vocab_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (subwords per word) per language — the
    fairness metric multilingual pipelines track: a vocab trained on
    a blend over-segments under-represented languages, inflating
    their effective sequence length and training cost. One number
    per language over the SAME trained segmentation as
    `vocab_bpe_token_count` (shared `_bpe_train`), so the fertility
    table is the roll-up of the billing table. Scale: the word
    stream joins the vocab segmentation on token and rolls up on the
    handful of language keys; fertility is one exact int/int divide
    per language."""
    _, final_vocab = _bpe_train(spark, sf_dir)
    docs = load_spread(spark, sf_dir, "documents")
    word_len = final_vocab.select("word", F.size("seq").cast("long").alias("n_sub"))
    return (
        docs.select("doc_id", "lang", F.explode(words_col(F.col("text"))).alias("word"))
        .join(word_len, "word")
        .groupBy("lang")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_bpe_tokens"),
            (
                F.sum("n_sub").cast("double") / F.count("*").cast("double")
            ).alias("fertility"),
        )
    )
