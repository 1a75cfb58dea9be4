"""Unigram-LM (SentencePiece-style) tokenizer trainer (round 14).

BPE (`operators/bpe.py`) covers merge-based vocabulary induction;
the OTHER production tokenizer family is the unigram language model
(Kudo 2018, arXiv:1804.10959; SentencePiece's default): score a
candidate piece inventory, segment every word by minimum-cost
(Viterbi) decomposition, re-estimate piece scores from the
segmentations, repeat. This module implements the deterministic
Viterbi-EM (hard-EM) variant with INTEGER whole-bit costs so every
stage value-oracles cross-engine:

1. Seed inventory: every substring of length 1..L of the corpus'
   words, weighted by word frequency; the top-V multi-character
   pieces by (count, piece) plus ALL single characters (coverage
   guarantee — Viterbi can always fall back to characters, Kudo's
   own invariant).
2. Costs: cost(p) = len(bin(T div cnt(p))) — the whole-bit integer
   surprisal the repo's LM family uses (`nb.py::_sbits` discipline);
   always >= 1, so shorter segmentations are preferred exactly when
   their pieces are frequent enough.
3. E-step: per-word minimum-cost segmentation by an UNROLLED
   suffix DP (s_j = min over piece lengths l of cost(word[j+1..j+l])
   + s_{j+l}), then a second unrolled pass reconstructs the
   canonical argmin path with a fixed LONGEST-PIECE-FIRST tie-break
   — both passes pure integer arithmetic over a per-word cost array,
   generated symbolically for BOTH engines from the same expression
   builders (only the array-index and integer-div spellings differ).
4. M-step: piece counts = sum of word frequencies over the pieces
   each Viterbi segmentation used, add-one smoothed over the FULL
   candidate inventory (unused pieces survive at high cost — they
   can win again in a later round), re-cost, repeat. `_EM_ROUNDS`
   unrolled rounds, the kmeans.py fixed-iteration discipline.

Like BPE training, every EM iteration runs over the COMPRESSED
word-frequency relation (~|V| rows), never the token stream: the
corpus is touched once to build the vocab and once to re-tokenize.
At 100 TB the vocab relation is thousandths of the corpus; the
candidate table join is piece-keyed (broadcastable: V + alphabet
rows), the DP is a map-only projection chain over the vocab, and
re-tokenization is the BPE token-count pattern (word-keyed join of
the doc word stream against the trained segmentation lengths).

Words longer than W characters are excluded from training and
counting by BOTH engines (documented cap, the _POSTING_CAP
discipline); the testbed's longest word is 8 chars, so the cap is
slack here and a schema guard at real scale.

Reference scope: [ext] — BASELINE north star (the reference has no
text analysis; SentencePiece/Kudo 2018 are the public models).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load_spread

_W = 12  # max word length the unrolled DP supports
_L = 4  # max piece length
_V = 48  # multi-char seed pieces kept (plus ALL single chars)
_INF = 1000000  # unreachable-cost sentinel (no overflow: <= W*INF sums)
_EM_ROUNDS = 2  # unrolled Viterbi-EM rounds


# ---------------------------------------------------------------------
# shared expression builders — the SAME arithmetic rendered for both
# engines; only list indexing and integer division are spelled
# differently (DuckDB: arr[i], // ; Spark SQL: element_at, div)


def _idx(engine: str, arr: str, i: str) -> str:
    return f"{arr}[{i}]" if engine == "duck" else f"element_at({arr}, {i})"


def _dp_exprs(engine: str) -> list[tuple[str, str]]:
    """(column, expression) chain for one Viterbi pass over a row
    with `word`, `n` (word length) and `carr` (the W*L cost array,
    k = j*L + l, 1-based): suffix costs s{W}..s0, the cost-array
    s-vector, then the canonical path (pos/len/piece per step) and
    n_pieces."""
    cols: list[tuple[str, str]] = []
    for j in range(_W, -1, -1):
        if j == _W:
            expr = f"CASE WHEN {j} > n THEN {_INF} WHEN {j} = n THEN 0 ELSE {_INF} END"
        else:
            terms = []
            for l in range(1, _L + 1):
                if j + l <= _W:
                    terms.append(f"{_idx(engine, 'carr', str(j * _L + l))} + s{j + l}")
            body = terms[0] if len(terms) == 1 else f"LEAST({', '.join(terms)})"
            expr = (
                f"CASE WHEN {j} > n THEN {_INF} WHEN {j} = n THEN 0 "
                f"ELSE {body} END"
            )
        cols.append((f"s{j}", expr))
    sarr = ", ".join(f"s{j}" for j in range(_W + 1))
    mk_arr = "list_value" if engine == "duck" else "array"
    cols.append(("sarr", f"{mk_arr}({sarr})"))
    cols.append(("pos0", "0"))
    for t in range(1, _W + 1):
        p = f"pos{t - 1}"
        branches = []
        for l in range(_L, 0, -1):
            cond = (
                f"{p} + {l} <= n AND "
                f"{_idx(engine, 'carr', f'{p} * {_L} + {l}')} + "
                f"{_idx(engine, 'sarr', f'{p} + {l} + 1')} = "
                f"{_idx(engine, 'sarr', f'{p} + 1')}"
            )
            branches.append(f"WHEN {cond} THEN {l}")
        cols.append(
            (
                f"len{t}",
                f"CASE WHEN {p} >= n THEN 0 ELSE CASE {' '.join(branches)} ELSE 1 END END",
            )
        )
        cols.append((f"pos{t}", f"pos{t - 1} + len{t}"))
        cols.append(
            (
                f"piece{t}",
                f"CASE WHEN len{t} > 0 THEN substring(word, pos{t - 1} + 1, len{t}) END",
            )
        )
    n_pieces = " + ".join(f"CAST(len{t} > 0 AS INT)" for t in range(1, _W + 1))
    cols.append(("n_pieces", f"CAST({n_pieces} AS BIGINT)"))
    return cols


# --------------------------------------------------------- oracle SQL


def _sql_viterbi(src: str, cost: str, tag: str) -> str:
    """DuckDB CTEs for one Viterbi pass: substring fan-out, cost
    join, per-word cost array, then the nested-select DP chain."""
    dp = f"SELECT word, freq, n, carr FROM varr{tag}"
    for col, expr in _dp_exprs("duck"):
        dp = f"SELECT *, ({expr}) AS {col} FROM ({dp})"
    pieces = ", ".join(f"piece{t}" for t in range(1, _W + 1))
    return f"""
    vsub{tag} AS (
        SELECT v.word, v.freq, (jj.j * {_L} + ll.l) AS k,
               CASE WHEN jj.j + ll.l <= length(v.word)
                    THEN substring(v.word, jj.j + 1, ll.l) END AS piece
        FROM {src} v,
             (SELECT unnest(range({_W})) AS j) jj,
             (SELECT unnest(range(1, {_L + 1})) AS l) ll
    ),
    vcost{tag} AS (
        SELECT s.word, s.freq, s.k,
               CASE WHEN s.piece IS NULL THEN {_INF}
                    ELSE COALESCE(c.cost, {_INF}) END AS cost
        FROM vsub{tag} s LEFT JOIN {cost} c ON c.piece = s.piece
    ),
    varr{tag} AS (
        SELECT word, freq, length(word) AS n,
               list(cost ORDER BY k) AS carr
        FROM vcost{tag} GROUP BY word, freq
    ),
    vseg{tag} AS MATERIALIZED (
        SELECT word, freq, n_pieces,
               list_filter(list_value({pieces}), x -> x IS NOT NULL) AS pieces
        FROM ({dp})
    )"""


def _sql_mstep(seg: str, tag: str) -> str:
    """Counts from a Viterbi pass -> smoothed candidate costs."""
    return f"""
    ucnt{tag} AS (
        SELECT p.piece,
               CAST(1 + COALESCE(u.c, 0) AS BIGINT) AS cnt
        FROM upieces0 p
        LEFT JOIN (
            SELECT piece, SUM(freq) AS c
            FROM (SELECT freq, unnest(pieces) AS piece FROM {seg})
            GROUP BY piece
        ) u ON u.piece = p.piece
    ),
    utot{tag} AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM ucnt{tag}),
    ucost{tag} AS MATERIALIZED (
        SELECT piece, cnt,
               CAST(length(bin(t // cnt)) AS BIGINT) AS cost
        FROM ucnt{tag}, utot{tag}
    )"""


def _sql_unigram_chain() -> str:
    """Word vocab -> seed inventory -> seed costs -> `_EM_ROUNDS` of
    (Viterbi, M-step). Ends with ucost{_EM_ROUNDS} (the trained
    table) available for a final pass."""
    parts = [
        f"""
    uw AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS words
        FROM documents
    ),
    uvocab AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(words) AS word FROM uw)
        WHERE length(word) <= {_W}
        GROUP BY word
    ),
    useed AS (
        SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (
            SELECT v.freq,
                   CASE WHEN jj.j + ll.l <= length(v.word)
                        THEN substring(v.word, jj.j + 1, ll.l) END AS piece
            FROM uvocab v,
                 (SELECT unnest(range({_W})) AS j) jj,
                 (SELECT unnest(range(1, {_L + 1})) AS l) ll
        )
        WHERE piece IS NOT NULL
        GROUP BY piece
    ),
    upieces0 AS MATERIALIZED (
        SELECT piece, cnt FROM (
            SELECT piece, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
            FROM useed WHERE length(piece) >= 2
        ) WHERE rn <= {_V}
        UNION ALL
        SELECT piece, cnt FROM useed WHERE length(piece) = 1
    ),
    utot0 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM upieces0),
    ucost0 AS MATERIALIZED (
        SELECT piece, cnt,
               CAST(length(bin(t // cnt)) AS BIGINT) AS cost
        FROM upieces0, utot0
    )"""
    ]
    for r in range(_EM_ROUNDS):
        parts.append(_sql_viterbi("uvocab", f"ucost{r}", f"_r{r}"))
        parts.append(_sql_mstep(f"vseg_r{r}", str(r + 1)))
    return ",".join(parts)


_SQL_CHAIN = _sql_unigram_chain()
_FINAL = f"ucost{_EM_ROUNDS}"


# ----------------------------------------------------------- Spark side


def _sql_spark_sarr() -> str:
    """Spark-side suffix DP as ONE aggregate() fold (right-to-left
    over positions, the suffix-cost array as accumulator): the
    chained-projection form OOM'd the driver — Catalyst's
    CollapseProject substitutes each level into the next, and a DP
    whose every cell references 4 predecessors inlines to a 4^W-node
    expression. A fold is a single linear-size expression evaluated
    iteratively at runtime, which is also how a real tokenizer runs
    the DP. try_element_at guards double as the INF padding for
    out-of-range lookups (ANSI-safe)."""
    inf = f"CAST({_INF} AS BIGINT)"
    terms = ", ".join(
        f"coalesce(try_element_at(carr, j * {_L} + {l}), {inf})"
        f" + coalesce(try_element_at(acc, {l}), {inf})"
        for l in range(1, _L + 1)
    )
    return (
        f"aggregate(sequence({_W}, 0, -1), cast(array() as array<bigint>),"
        f" (acc, j) -> concat(array(CASE WHEN j > n THEN {inf}"
        f" WHEN j = n THEN CAST(0 AS BIGINT)"
        f" ELSE LEAST({terms}) END), acc))"
    )


def _sql_spark_parts() -> str:
    """Spark-side canonical-path reconstruction as ONE fold over
    step indices: the accumulator carries (pos, sa, parts[(start,
    len)]); each step takes the LONGEST piece length whose cost +
    suffix equals the current suffix (the fixed tie-break), stopping
    at word end.

    r15 plan-size fix (guide §5 "very large query plans", §7.3):
    the suffix-cost array used to be a separate `sarr` projection
    column; this fold references it ~13 times, and CollapseProject
    inlined the WHOLE sarr fold into every reference (and the parts
    fold in turn into each of its downstream references) — measured
    386 KB formatted plan / ~4.9 s driver-side analysis per bench run
    for vocab_unigram_token_count. Embedding the sarr fold ONCE as
    the `sa` field of the accumulator's initial value makes every
    reference a cheap `acc.sa` lookup; the fold arithmetic (and so
    every value) is unchanged. The caller keeps the result behind a
    Generate barrier for the same reason (see _viterbi_df)."""
    inf = f"CAST({_INF} AS BIGINT)"

    def cond(l: int) -> str:
        return (
            f"acc.pos + {l} <= n AND"
            f" coalesce(try_element_at(carr, acc.pos * {_L} + {l}), {inf})"
            f" + coalesce(try_element_at(acc.sa, acc.pos + {l} + 1), {inf})"
            f" = coalesce(try_element_at(acc.sa, acc.pos + 1), {inf})"
        )

    len_expr = (
        "CASE "
        + " ".join(f"WHEN {cond(l)} THEN {l}" for l in range(_L, 1, -1))
        + " ELSE 1 END"
    )
    return (
        f"aggregate(sequence(1, {_W}),"
        f" named_struct('pos', 0, 'sa', ({_sql_spark_sarr()}), 'ps',"
        f" cast(array() as array<struct<s: int, l: int>>)),"
        f" (acc, t) -> CASE WHEN acc.pos >= n THEN acc"
        f" ELSE named_struct('pos', acc.pos + ({len_expr}), 'sa', acc.sa,"
        f" 'ps', concat(acc.ps,"
        f" array(named_struct('s', acc.pos, 'l', ({len_expr}))))) END,"
        f" acc -> acc.ps)"
    )


def _viterbi_df(vocab: DataFrame, cost: DataFrame) -> DataFrame:
    """(word, freq) x (piece, cost) -> (word, freq, n_pieces,
    pieces): the Spark twin of _sql_viterbi — the per-word W*L cost
    array is built in ONE map-side projection against a pivoted
    piece -> cost map, then the suffix DP and path reconstruction
    run as two aggregate() folds.

    r14 optimization (guide §2.3/§2.4, the pq.py::_lut_pivot
    discipline): the piece-cost table is V + alphabet rows, so
    instead of a 48-way substring explode + broadcast join + a
    collect_list re-grouping exchange PER VITERBI PASS, the cost
    table pivots into a single map row that cross-broadcasts onto
    the vocab (the whitelisted 1-row BNLJ pattern); carr is then 48
    element_at lookups inside the scan-side projection. Two
    exchanges and the 48x row fan-out disappear from each of the
    three passes, and the analyzed plan shrinks by the same factor
    (the fan-out/regroup subtree dominated driver-side analysis
    time). Values are untouched BIGINTs in the same k = j*L + l
    order, so the fold arithmetic — and the oracle, which keeps the
    didactic explode + join SQL — is bit-identical."""
    inf = F.lit(_INF).cast("long")
    cmap = cost.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.col("cost").cast("long")))
        ).alias("cmap")
    )
    # try_element_at (r15, ADVICE): same null-on-missing-key value as
    # element_at on the pinned Spark, but explicit about it — matches
    # the fold SQL's try_element_at and survives ANSI semantics drift
    entries = [
        F.when(
            F.lit(j + l) <= F.length("word"),
            F.coalesce(
                F.try_element_at("cmap", F.substring(F.col("word"), j + 1, l)), inf
            ),
        ).otherwise(inf)
        for j in range(_W)
        for l in range(1, _L + 1)
    ]
    # the 1-element explode is a deliberate projection barrier (a
    # Generate node, still map-side, zero fan-out): the DP folds
    # downstream reference carr several times, and without a barrier
    # CollapseProject inlines the 48-lookup array into every
    # reference — measured 389 KB -> 1.8 MB formatted plan and ~13 s
    # of driver-side optimization per pass. The groupBy this
    # projection replaced was load-bearing in exactly that respect.
    carr = vocab.join(F.broadcast(cmap), F.lit(True)).select(
        "word",
        "freq",
        F.length("word").alias("n"),
        F.explode(F.array(F.array(*entries))).alias("carr"),
    )
    # second 1-element-explode barrier (r15): the combined DP fold
    # (suffix costs + path, see _sql_spark_parts) is referenced by
    # BOTH output columns and again by every downstream consumer of
    # `pieces`; behind a Generate it is evaluated (and printed) once.
    # Measured on vocab_unigram_token_count: formatted plan 386 KB ->
    # ~90 KB, driver-side analysis share of the query roughly halved.
    parts = carr.select(
        "word",
        "freq",
        F.explode(F.array(F.expr(f"({_sql_spark_parts()})"))).alias("parts"),
    )
    return parts.selectExpr(
        "word",
        "freq",
        "CAST(size(parts) AS BIGINT) AS n_pieces",
        "transform(parts, p -> substring(word, p.s + 1, p.l)) AS pieces",
    )


def _cost_bits(cnt_df: DataFrame) -> DataFrame:
    """(piece, cnt) -> (piece, cnt, cost): whole-bit surprisal vs the
    1-row total (broadcast — the whitelisted BNLJ pattern)."""
    tot = cnt_df.agg(F.sum("cnt").cast("long").alias("t"))
    return cnt_df.join(F.broadcast(tot), F.lit(True)).selectExpr(
        "piece", "cnt", "CAST(length(bin(t div cnt)) AS BIGINT) AS cost"
    )


def _unigram_train(spark: SparkSession, sf_dir: str):
    """(vocab, final_cost): run the seed + `_EM_ROUNDS` Viterbi-EM
    rounds over the word-frequency relation."""
    from bigdata_project_spark.caching import tracked_persist

    from bigdata_project_spark.operators.dedup import words_col

    docs = load_spread(spark, sf_dir, "documents")
    vocab = tracked_persist(
        docs.select(F.explode(words_col(F.col("text"))).alias("word"))
        .filter(F.length("word") <= _W)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    seed = (
        vocab.select(
            "freq",
            F.explode(
                F.array(
                    *[
                        F.when(
                            F.lit(j + l) <= F.length("word"),
                            F.substring(F.col("word"), j + 1, l),
                        )
                        for j in range(_W)
                        for l in range(1, _L + 1)
                    ]
                )
            ).alias("piece"),
        )
        .filter(F.col("piece").isNotNull())
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )
    seed = tracked_persist(seed)
    wv = W.orderBy(F.desc("cnt"), "piece")
    multi = (
        seed.filter(F.length("piece") >= 2)
        .select("piece", "cnt", F.row_number().over(wv).alias("rn"))
        .filter(F.col("rn") <= _V)
        .select("piece", "cnt")
    )
    pieces0 = tracked_persist(
        multi.unionByName(seed.filter(F.length("piece") == 1))
    )
    cost = tracked_persist(_cost_bits(pieces0))
    for _ in range(_EM_ROUNDS):
        seg = _viterbi_df(vocab, cost)
        counts = (
            seg.select("freq", F.explode("pieces").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").alias("c"))
        )
        smoothed = (
            pieces0.select("piece")
            .join(counts, "piece", "left")
            .selectExpr("piece", "CAST(1 + COALESCE(c, 0) AS BIGINT) AS cnt")
        )
        cost = tracked_persist(_cost_bits(smoothed))
    return vocab, cost


@query(
    "vocab_unigram_train",
    oracle=f"""
    WITH {_SQL_CHAIN}
    SELECT piece, CAST(length(piece) AS INT) AS piece_len, cnt,
           cost AS cost_bits
    FROM {_FINAL}
    """,
    tags=("llm", "tokenizer", "unigram", "vocab", "iterative"),
)
def vocab_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained unigram-LM piece table after {_EM_ROUNDS}
    Viterbi-EM rounds: every candidate piece with its smoothed
    Viterbi-usage count and whole-bit cost. Module docstring has the
    algorithm, the determinism contract (integer costs, canonical
    longest-piece-first argmin), and the compressed-vocab scale
    story."""
    _, cost = _unigram_train(spark, sf_dir)
    return cost.select(
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        "cnt",
        F.col("cost").alias("cost_bits"),
    )


@query(
    "vocab_unigram_token_count",
    oracle=f"""
    WITH {_SQL_CHAIN},
    {_sql_viterbi('uvocab', _FINAL, '_fin')}
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(f.n_pieces) AS BIGINT) AS n_unigram_tokens
    FROM (SELECT doc_id, unnest(words) AS word FROM uw) d
    JOIN vseg_fin f USING (word)
    GROUP BY d.doc_id
    """,
    tags=("llm", "tokenizer", "unigram", "vocab"),
)
def vocab_unigram_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token count under the trained unigram tokenizer
    — the billing number beside `vocab_bpe_token_count`, same
    contract: re-tokenization joins the corpus word stream to the
    trained per-word segmentation (word -> n_pieces); docs with zero
    (segmentable) words have no rows."""
    from bigdata_project_spark.operators.dedup import words_col

    vocab, cost = _unigram_train(spark, sf_dir)
    seg = _viterbi_df(vocab, cost).select("word", "n_pieces")
    docs = load_spread(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("word"))
        .join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_unigram_tokens"),
        )
    )


@query(
    "vocab_unigram_fertility_by_lang",
    oracle=f"""
    WITH {_SQL_CHAIN},
    {_sql_viterbi('uvocab', _FINAL, '_fin')}
    SELECT doc.lang,
           CAST(COUNT(DISTINCT d.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(f.n_pieces) AS BIGINT) AS n_unigram_tokens,
           CAST(SUM(f.n_pieces) AS DOUBLE) / COUNT(*) AS fertility
    FROM (SELECT doc_id, unnest(words) AS word FROM uw) d
    JOIN vseg_fin f USING (word)
    JOIN documents doc ON doc.doc_id = d.doc_id
    GROUP BY doc.lang
    """,
    tags=("llm", "tokenizer", "unigram", "fertility", "audit"),
)
def vocab_unigram_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-tokenizer fertility (pieces per word) per language —
    the `vocab_bpe_fertility_by_lang` fairness metric for the OTHER
    tokenizer family, over the same shared corpus and word stream,
    so the two families' fertility tables are directly comparable
    (tests/test_unigram.py pins the measured comparison)."""
    from bigdata_project_spark.operators.dedup import words_col

    vocab, cost = _unigram_train(spark, sf_dir)
    seg = _viterbi_df(vocab, cost).select("word", "n_pieces")
    docs = load_spread(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "lang", F.explode(words_col(F.col("text"))).alias("word"))
        .join(seg, "word")
        .groupBy("lang")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_unigram_tokens"),
            (
                F.sum("n_pieces").cast("double") / F.count("*").cast("double")
            ).alias("fertility"),
        )
    )
