"""Round-5 enrichment / activation operators: point-in-time dimension
joins, marketing attribution, exact sliding-window distinct counts,
blocked edit-distance near-dup, time-weighted averages, k-fold splits,
session bounce rates, and robust (MAD) outlier detection.

Reference parity: the reference (jansulubituu/BIGDATA_PROJECT) stores
listing snapshots per crawl (CrawlData.py:108-146, one JSON per house
per timestamp) — the point-in-time join and SCD2 machinery here are
the query-side answer to "what did this entity look like when X
happened" over exactly that kind of snapshot stream. The rest extend
SURVEY.md §2.10's training-data/analytics families.

Determinism: the registry contract — integer/micros arithmetic,
decimal-routed sums, unique total-order tiebreakers on every window
and argmax, identical aliases in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load

_DAY_US = 86_400_000_000
_LOOKBACK_US = 7 * _DAY_US
_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap (mirrors events_session_30m)


# ------------------------------------------------ point-in-time join


@query(
    "join_pointintime_enrich",
    oracle="""
    WITH status AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev_type
        FROM events WHERE event_type <> 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type AS status, epoch_us(ts) AS valid_from_us,
               epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   AS valid_to_us
        FROM status WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_t_us,
           c.status, c.valid_from_us AS status_since_us
    FROM events p
    LEFT JOIN changes c
      ON c.user_id = p.user_id
     AND c.valid_from_us <= epoch_us(p.ts)
     AND (c.valid_to_us IS NULL OR epoch_us(p.ts) < c.valid_to_us)
    WHERE p.event_type = 'purchase'
    """,
    tags=("join", "scd2", "point-in-time", "warehouse"),
)
def join_pointintime_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join — enrich each purchase with the
    user's status (latest non-purchase activity state) VALID AT the
    purchase instant, via the SCD2 validity-interval pattern: collapse
    the status stream to change rows (lag inequality), close each
    interval with lead(ts), then join facts on user equi-key plus the
    half-open interval predicate valid_from <= t < valid_to. A
    purchase landing exactly on a change instant takes the NEW status
    (half-open interval), and purchases before any status row keep a
    NULL status (left join) — both engine-independent.

    Scale: the join is EQUI on user_id with the interval check as a
    residual filter — never a cartesian or pure range join. The
    change-row dimension is a tiny fraction of the fact stream (one
    row per status change, not per event), and each user's validity
    chain is non-overlapping, so the residual matches at most one
    dimension row per fact. One user_id exchange builds the dimension
    (lag+lead share a single sort) and the same key partitions the
    join."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    status = ev.filter(F.col("event_type") != "purchase")
    changes = (
        status.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select(
            F.col("user_id").alias("d_user_id"),
            F.col("event_type").alias("status"),
            F.unix_micros("ts").alias("valid_from_us"),
            F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("purchase_t_us")
    )
    cond = (
        (F.col("d_user_id") == F.col("user_id"))
        & (F.col("valid_from_us") <= F.col("purchase_t_us"))
        & (F.col("valid_to_us").isNull() | (F.col("purchase_t_us") < F.col("valid_to_us")))
    )
    return purchases.join(changes, cond, "left").select(
        "event_id",
        "user_id",
        "purchase_t_us",
        "status",
        F.col("valid_from_us").alias("status_since_us"),
    )


# --------------------------------------------- last-touch attribution


@query(
    "events_attribution_last_touch",
    oracle=f"""
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_t_us,
           (SELECT c.event_id FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND epoch_us(c.ts) <= epoch_us(p.ts)
              AND epoch_us(c.ts) >= epoch_us(p.ts) - {_LOOKBACK_US}
            ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS attributed_click_id
    FROM events p WHERE p.event_type = 'purchase'
    """,
    tags=("events", "attribution", "window"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the LATEST click
    by the same user at-or-before the purchase within a 7-day
    lookback (marketing's classic conversion-credit model). Rather
    than joining purchases to clicks (which re-shuffles both and can
    fan out to every click in the window), the sweep runs both
    streams through ONE user-keyed window: order by (t_us, kind,
    event_id) with clicks (kind 0) before purchases (kind 1) at equal
    instants — so a same-instant click is eligible — and carry the
    last click forward with last(..., ignorenulls). Equal-ts clicks
    resolve to the max event_id because later rows overwrite.

    Scale: one user_id exchange + sort for the whole attribution; no
    join at all. The oracle states the same semantics as a correlated
    argmax subquery (DuckDB decorrelates it); the Spark plan is the
    shape that survives 100 TB."""
    ev = load(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        (F.col("event_type") == "purchase").cast("int").alias("kind"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t_us", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    click = F.when(F.col("kind") == 0, F.struct("t_us", "event_id"))
    carried = base.withColumn("last_click", F.last(click, ignorenulls=True).over(w))
    return (
        carried.filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("t_us").alias("purchase_t_us"),
            F.when(
                F.col("last_click.t_us") >= F.col("t_us") - F.lit(_LOOKBACK_US),
                F.col("last_click.event_id"),
            ).alias("attributed_click_id"),
        )
    )


# ------------------------------------- exact sliding distinct users


@query(
    "events_sliding_distinct_users",
    oracle=f"""
    WITH user_days AS (
        SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM user_days)
    SELECT d.day, COUNT(DISTINCT u.user_id) AS users_7d
    FROM days d
    JOIN user_days u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
    tags=("events", "window", "distinct", "fan-out"),
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day distinct active users per day — the metric
    sliding windows cannot express with a running aggregate because
    distinct-ness does not decompose over window frames. The scale
    recipe is bounded fan-out instead of a range join: collapse
    events to distinct (user, day) pairs FIRST (orders of magnitude
    smaller than the event stream), explode each pair to the <=7
    window-days it contributes to, and count distinct users per
    window-day. Day arithmetic is integer epoch-day indexes; the
    output keeps only days that actually had activity (semi-join with
    the observed-day set), matching the oracle's range-join spec.

    Scale: fan-out factor is exactly the window length (7) applied to
    the ALREADY-DEDUPED user-day table; the distinct and the final
    count-distinct are both standard two-phase hash aggregates. A
    range join (the oracle's formulation) would be O(days x user_days)
    candidate pairs with a non-equi band — this shape replaces it
    with an equi groupBy."""
    ev = load(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day")
    ).distinct()
    days = user_days.select("day").distinct()
    fanned = user_days.select(
        "user_id", "day", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    ).select("user_id", (F.col("day") + F.col("off")).alias("day"))
    return (
        fanned.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


# ---------------------------------- blocked edit-distance near-dup

_ED_PREFIX = 32
_ED_BLOCK = 4
_ED_CAP = 64
_ED_MAX_DIST = 4


@query(
    "dedup_editdistance_blocked",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id,
               substring(lower(text), 1, {_ED_PREFIX}) AS prefix,
               substring(lower(text), 1, {_ED_BLOCK}) AS block
        FROM documents
    ),
    capped AS (
        SELECT doc_id, prefix, block,
               ROW_NUMBER() OVER (PARTITION BY block ORDER BY doc_id) AS rn
        FROM keyed
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           levenshtein(a.prefix, b.prefix) AS edit_distance
    FROM capped a
    JOIN capped b ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE a.rn <= {_ED_CAP} AND b.rn <= {_ED_CAP}
      AND levenshtein(a.prefix, b.prefix) <= {_ED_MAX_DIST}
    """,
    tags=("llm", "dedup", "editdistance", "blocking"),
)
def dedup_editdistance_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicate pairs with prefix blocking — the
    string-metric complement to the Jaccard/MinHash family: candidate
    pairs share a 4-char normalized prefix block, and candidates are
    confirmed by Levenshtein distance <= 4 over the 32-char normalized
    prefix (bounded-length inputs keep the O(n*m) DP constant-cost).
    Both the blocking key and the cap are part of the declared
    semantics, mirrored exactly in the oracle.

    Scale: the self-join is EQUI on the block key; each block is
    capped at {_ED_CAP} members (row_number by doc_id — deterministic),
    bounding the worst block at {_ED_CAP}*{_ED_CAP - 1}/2 comparisons
    — the same discipline as the shingle-df cap in dedup.py. The
    Levenshtein runs on fixed-width prefixes inside codegen (JVM
    built-in), never on full documents."""
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.substring(F.lower("text"), 1, _ED_PREFIX).alias("prefix"),
        F.substring(F.lower("text"), 1, _ED_BLOCK).alias("block"),
    )
    capped = keyed.withColumn(
        "rn", F.row_number().over(W.partitionBy("block").orderBy("doc_id"))
    ).filter(F.col("rn") <= _ED_CAP)
    a = capped.alias("a")
    b = capped.alias("b")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(dist <= _ED_MAX_DIST)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            dist.alias("edit_distance"),
        )
    )


# --------------------------------------------- time-weighted average


@query(
    "events_twap",
    oracle=f"""
    WITH pts AS (
        SELECT event_type,
               epoch_us(ts) // {_DAY_US} AS day,
               epoch_us(ts) AS t_us,
               event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS v_cents
        FROM events
    ),
    holds AS (
        SELECT event_type, day, t_us, v_cents,
               COALESCE(LEAD(t_us) OVER (PARTITION BY event_type, day
                                         ORDER BY t_us, event_id),
                        (day + 1) * {_DAY_US}) - t_us AS dur_us
        FROM pts
    )
    SELECT event_type, day,
           CAST(SUM(CAST(v_cents * dur_us AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(SUM(dur_us) AS DOUBLE) / 100.0 AS twap,
           COUNT(*) AS n_points
    FROM holds
    GROUP BY event_type, day
    """,
    tags=("events", "window", "twap", "interval"),
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP) per event type per day —
    each observation holds until the next one of the same type that
    day (or until midnight), and its value is weighted by that hold
    duration: the standard way to average an irregularly-sampled
    signal without letting burst periods dominate. All weights are
    integer microsecond durations; the weighted sum routes through
    DECIMAL(38,0) (v_cents * dur_us exceeds 2^53, so a double sum
    would be order-dependent) and the single final division is the
    only floating-point step — bit-identical across engines.

    Scale: one (event_type, day) partitioned window (lead) riding the
    same exchange as the final aggregate; partition count grows with
    days x types, so no key ever concentrates the stream."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("v_cents"),
    )
    w = W.partitionBy("event_type", "day").orderBy("t_us", "event_id")
    holds = pts.withColumn(
        "dur_us",
        F.coalesce(F.lead("t_us").over(w), (F.col("day") + 1) * F.lit(_DAY_US))
        - F.col("t_us"),
    )
    wsum = F.sum((F.col("v_cents") * F.col("dur_us")).cast("decimal(38,0)")).cast("double")
    return holds.groupBy("event_type", "day").agg(
        (wsum / F.sum("dur_us").cast("double") / F.lit(100.0)).alias("twap"),
        F.count("*").alias("n_points"),
    )


# ------------------------------------------------------ k-fold split

_KFOLDS = 5


@query(
    "split_kfold_assignment",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, lang, n_chars,
               ((instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))
               % {_KFOLDS} AS fold
        FROM documents
    )
    SELECT fold, COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM assigned GROUP BY fold
    """,
    tags=("llm", "split", "kfold"),
)
def split_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment: md5(doc_id)'s first byte
    mod k places every document in a stable fold — reruns, engine
    changes, and corpus growth never move a document between folds
    (the same anti-contamination property as split_train_val_test,
    which this generalizes from fixed thresholds to k equal buckets).
    Output is the per-fold audit: counts, language coverage, and
    exact character mass, the numbers a training pipeline checks
    before trusting the folds are balanced.

    Scale: pure codegen'd expression per row; the only shuffle is the
    k-row reporting aggregate."""
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    bucket = (
        (F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1) * 16
        + (F.instr(F.lit("0123456789abcdef"), F.substring(h, 2, 1)) - 1)
    )
    return (
        docs.select((bucket % _KFOLDS).alias("fold"), "lang", "n_chars", "doc_id")
        .groupBy("fold")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# ----------------------------------------------- session bounce rate


@query(
    "events_bounce_rate",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, epoch_us(ts) AS t_us, event_id,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_t
        FROM events
    ),
    marked AS (
        SELECT user_id, t_us, event_id,
               CASE WHEN prev_t IS NULL OR t_us - prev_t > {_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    sess AS (
        SELECT user_id, t_us,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY t_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_no
        FROM marked
    ),
    per_session AS (
        SELECT user_id, session_no,
               MIN(t_us) // {_DAY_US} AS day,
               COUNT(*) AS n_events
        FROM sess GROUP BY user_id, session_no
    )
    SELECT day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate
    FROM per_session GROUP BY day
    """,
    tags=("events", "session", "bounce"),
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session bounce rate per day — sessionize each user's stream
    with the 30-minute inactivity gap (the events_session_30m rule),
    then report, per day of session start, how many sessions were
    single-event 'bounces'. The engagement-quality KPI over the same
    sessionization the windowed family already verifies. Counting is
    all-integer; the single rate division is rounded to 6.

    Scale: gap-marking, session numbering, and the per-session
    rollup all ride ONE user_id exchange (the two windows share the
    (ts, event_id) sort and the groupBy includes user_id); only the
    tiny per-day aggregate reshuffles."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("t_us", "event_id")
    marked = (
        ev.select("user_id", F.unix_micros("ts").alias("t_us"), "event_id")
        .withColumn("prev_t", F.lag("t_us").over(w))
        .withColumn(
            "is_new",
            (
                F.col("prev_t").isNull() | (F.col("t_us") - F.col("prev_t") > _GAP_US)
            ).cast("int"),
        )
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    per_session = sess.groupBy("user_id", "session_no").agg(
        F.expr(f"min(t_us) div {_DAY_US}").alias("day"),
        F.count("*").alias("n_events"),
    )
    bounce = F.sum((F.col("n_events") == 1).cast("long"))
    return per_session.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        bounce.alias("n_bounces"),
        F.round(bounce.cast("double") / F.count("*"), 6).alias("bounce_rate"),
    )


# ------------------------------------------- MAD robust outliers


@query(
    "agg_mad_outliers",
    oracle="""
    WITH v AS (
        SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS v_cents
        FROM events
    ),
    med AS (
        SELECT event_type, median(v_cents) AS median_cents FROM v GROUP BY event_type
    ),
    dev AS (
        SELECT v.event_type, v.v_cents, m.median_cents,
               ABS(CAST(v.v_cents AS DOUBLE) - m.median_cents) AS adev
        FROM v JOIN med m ON v.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, median(adev) AS mad_cents FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           d.median_cents,
           m.mad_cents,
           CAST(SUM(CASE WHEN d.adev > 3 * m.mad_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           COUNT(*) AS n
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, d.median_cents, m.mad_cents
    """,
    tags=("agg", "robust", "outlier", "exact"),
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation — the
    estimator z-scores cannot be fooled into missing outliers by the
    outliers themselves (50% breakdown point vs. 0% for mean/stddev;
    complements events_anomaly_daily_zscore). Values are cents
    integers; both medians interpolate midpoints of integers-or-
    halves, so every intermediate is an exact binary fraction and the
    3xMAD boundary comparison is engine-independent.

    Scale: exact medians require the full per-group value multiset —
    this is the exact-audit path (the agg_exact family's contract);
    at 100 TB the same shape runs with approx_percentile(adev, 0.5)
    and a documented error band, as agg_approx_percentile_band
    demonstrates. The two median passes each map-side reduce onto 5
    type keys, and both small results broadcast back onto the value
    stream."""
    ev = load(spark, sf_dir, "events")
    v = ev.select("event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v_cents"))
    med = v.groupBy("event_type").agg(
        F.expr("percentile(v_cents, 0.5)").alias("median_cents")
    )
    dev = v.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("v_cents").cast("double") - F.col("median_cents"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5)").alias("mad_cents"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "median_cents", "mad_cents")
        .agg(
            F.sum((F.col("adev") > 3 * F.col("mad_cents")).cast("long")).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------- decile bucketing at scale

_DECILE_QS = [i / 10.0 for i in range(1, 10)]


@query(
    "agg_spend_decile_buckets",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                   AS spend_cents
        FROM orders GROUP BY o_custkey
    ),
    bounds AS (
        SELECT quantile_cont(spend_cents, {_DECILE_QS}) AS bs FROM spend
    )
    SELECT len(list_filter(b.bs, x -> x < s.spend_cents)) AS decile,
           COUNT(*) AS n_customers,
           CAST(SUM(s.spend_cents) AS BIGINT) AS sum_spend_cents,
           MIN(s.spend_cents) AS min_spend_cents,
           MAX(s.spend_cents) AS max_spend_cents
    FROM spend s CROSS JOIN bounds b
    GROUP BY 1
    """,
    tags=("agg", "decile", "broadcast", "scale-pattern"),
)
def agg_spend_decile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing of customer spend WITHOUT a global NTILE —
    NTILE(10) OVER (ORDER BY spend) is an unpartitioned window, i.e.
    a single-task sort of every customer at any scale. The scale
    shape instead computes the nine decile boundaries once (exact
    percentiles of integer cents; interpolated midpoints are exact
    binary fractions) and broadcasts them back as a 1-row cross join;
    bucket = how many boundaries lie strictly below the row's spend.
    Boundary-tie rule (boundary value itself goes to the LOWER
    bucket, strict <) is identical in both engines.

    Unlike NTILE, bucket populations can be uneven when values tie at
    a boundary — the price of a broadcastable assignment; the audit
    columns (count + min/max per bucket) make that visible.

    Scale: one shuffle for the per-customer rollup; the percentile
    agg reduces to a 9-double row (exact percentile needs the full
    multiset — swap approx_percentile at 100 TB, same plan shape);
    assignment is a codegen'd expression over a broadcast row."""
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("spend_cents")
    )
    qs = ", ".join(str(q) for q in _DECILE_QS)
    bounds = spend.agg(F.expr(f"percentile(spend_cents, array({qs}))").alias("bs"))
    decile = F.size(F.filter(F.col("bs"), lambda x: x < F.col("spend_cents")))
    return (
        spend.join(F.broadcast(bounds))
        .groupBy(decile.alias("decile"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("spend_cents").alias("sum_spend_cents"),
            F.min("spend_cents").alias("min_spend_cents"),
            F.max("spend_cents").alias("max_spend_cents"),
        )
    )


# ------------------------------------------- week-over-week growth

_WEEK_DAYS = 7


@query(
    "events_wow_growth",
    oracle=f"""
    WITH weekly AS (
        SELECT event_type,
               (epoch_us(ts) // {_DAY_US}) // {_WEEK_DAYS} AS week,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, rev_cents,
           LAG(rev_cents) OVER (PARTITION BY event_type ORDER BY week) AS prev_cents,
           CASE WHEN LAG(rev_cents) OVER (PARTITION BY event_type ORDER BY week) > 0
                THEN ROUND(CAST(rev_cents - LAG(rev_cents) OVER (PARTITION BY event_type
                                                                 ORDER BY week) AS DOUBLE)
                           / CAST(LAG(rev_cents) OVER (PARTITION BY event_type
                                                       ORDER BY week) AS DOUBLE), 6)
           END AS wow_growth
    FROM weekly
    """,
    tags=("events", "window", "timeseries"),
)
def events_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type — the canonical KPI trend
    query: aggregate to (type, epoch-week) exact cents totals, then a
    lag window over the TINY aggregated series computes the growth
    ratio (single guarded division, rounded; weeks with no
    predecessor or zero base stay NULL).

    Scale: the window runs over types x weeks rows — aggregation
    shrank the stream by orders of magnitude before any sort, the
    pattern every timeseries-trend query should follow (window AFTER
    agg, never over raw facts)."""
    ev = load(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type",
        F.expr(f"(unix_micros(ts) div {_DAY_US}) div {_WEEK_DAYS}").alias("week"),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("rev_cents"))
    w = W.partitionBy("event_type").orderBy("week")
    prev = F.lag("rev_cents").over(w)
    growth = F.when(
        prev > 0,
        F.round((F.col("rev_cents") - prev).cast("double") / prev.cast("double"), 6),
    )
    return weekly.select(
        "event_type",
        "week",
        "rev_cents",
        prev.alias("prev_cents"),
        growth.alias("wow_growth"),
    )


# --------------------------------------- conversion latency stats


@query(
    "events_time_to_convert",
    oracle="""
    WITH fv AS (
        SELECT user_id, MIN(epoch_us(ts)) AS first_view_us
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
        SELECT f.user_id, f.first_view_us,
               MIN(epoch_us(p.ts)) AS first_purchase_us
        FROM fv f
        LEFT JOIN events p
          ON p.user_id = f.user_id AND p.event_type = 'purchase'
         AND epoch_us(p.ts) >= f.first_view_us
        GROUP BY f.user_id, f.first_view_us
    )
    SELECT COUNT(*) AS n_viewers,
           CAST(SUM(CASE WHEN first_purchase_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           median(first_purchase_us - first_view_us) AS median_latency_us,
           quantile_cont(first_purchase_us - first_view_us, 0.9) AS p90_latency_us
    FROM conv
    """,
    tags=("events", "funnel", "latency"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, latency from FIRST view
    to the first purchase at-or-after it; report viewer count,
    converter count, and exact median/p90 latency (integer micros, so
    the interpolated percentiles are exact binary fractions). NULL
    latencies (never converted) are excluded from percentiles by both
    engines' aggregate-null semantics — the same rows, by
    construction.

    Scale: first-view is a map-side-combinable min; the purchase
    probe is an EQUI join on user_id with the at-or-after check as
    residual; the final percentile is one global aggregate over the
    per-user (two-column) table — swap approx_percentile at 100 TB,
    identical shape."""
    ev = load(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("first_view_us"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.unix_micros("ts").alias("p_t_us")
    )
    conv = (
        fv.join(
            p,
            (F.col("p_user_id") == F.col("user_id"))
            & (F.col("p_t_us") >= F.col("first_view_us")),
            "left",
        )
        .groupBy("user_id", "first_view_us")
        .agg(F.min("p_t_us").alias("first_purchase_us"))
    )
    lat = F.col("first_purchase_us") - F.col("first_view_us")
    return conv.agg(
        F.count("*").alias("n_viewers"),
        F.sum(F.col("first_purchase_us").isNotNull().cast("long")).alias("n_converted"),
        F.expr("percentile(first_purchase_us - first_view_us, 0.5)").alias("median_latency_us"),
        F.expr("percentile(first_purchase_us - first_view_us, 0.9)").alias("p90_latency_us"),
    )


# ------------------------------------------------- cohort LTV curve


@query(
    "events_cohort_ltv",
    oracle=f"""
    WITH first_seen AS (
        SELECT user_id,
               (MIN(epoch_us(ts)) // {_DAY_US}) // {_WEEK_DAYS} AS cohort_week
        FROM events GROUP BY user_id
    ),
    rev AS (
        SELECT f.cohort_week,
               ((epoch_us(p.ts) // {_DAY_US}) // {_WEEK_DAYS}) - f.cohort_week
                   AS weeks_since,
               CAST(SUM(CAST(ROUND(p.value * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM events p JOIN first_seen f ON p.user_id = f.user_id
        WHERE p.event_type = 'purchase'
        GROUP BY 1, 2
    )
    SELECT cohort_week, weeks_since, rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY cohort_week ORDER BY weeks_since
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_ltv_cents
    FROM rev
    """,
    tags=("events", "cohort", "ltv", "window"),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-seen week,
    purchase revenue bucketed by weeks-since-acquisition, and the
    running (cumulative) LTV per cohort — the growth-analytics
    complement to events_retention_cohort (counts -> revenue). All
    cents integers; the cumulative sum is exact.

    Scale: first-seen is a map-side min per user; the cohort tag
    joins back on user_id (at 100 TB the first-seen table is the
    user dimension — bucket both sides or broadcast if it fits);
    the cumulative window runs over the tiny (cohort x weeks)
    aggregate, never raw facts."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.expr(f"(min(unix_micros(ts)) div {_DAY_US}) div {_WEEK_DAYS}").alias("cohort_week")
    )
    p = ev.filter(F.col("event_type") == "purchase")
    rev = (
        p.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.expr(f"(unix_micros(ts) div {_DAY_US}) div {_WEEK_DAYS}")
                - F.col("cohort_week")
            ).alias("weeks_since"),
        )
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("rev_cents"))
    )
    w = (
        W.partitionBy("cohort_week")
        .orderBy("weeks_since")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return rev.select(
        "cohort_week",
        "weeks_since",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("cum_ltv_cents"),
    )


# ----------------------------------------------- DAU/WAU stickiness


@query(
    "events_dau_wau_stickiness",
    oracle=f"""
    WITH user_days AS (
        SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM user_days),
    dau AS (
        SELECT day, COUNT(*) AS dau FROM user_days GROUP BY day
    ),
    wau AS (
        SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
        FROM days d JOIN user_days u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
    )
    SELECT d.day, d.dau, w.wau,
           ROUND(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    """,
    tags=("events", "distinct", "stickiness", "fan-out"),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness — the engagement ratio product teams track
    daily: of the users active in the trailing week, what share came
    back today. Both counts come from ONE deduped (user, day) table:
    DAU is a plain count per day (each pair is already distinct), WAU
    reuses the bounded x7 fan-out from events_sliding_distinct_users.
    One division, rounded; everything else integer.

    Scale: the expensive shrink (events -> user-days) happens once
    and feeds both counts; the DAU/WAU join is day-keyed over
    #days-sized tables — broadcastable at any corpus size."""
    ev = load(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day")
    ).distinct()
    days = user_days.select("day").distinct()
    dau = user_days.groupBy("day").agg(F.count("*").alias("dau"))
    fanned = user_days.select(
        "user_id", "day", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    ).select("user_id", (F.col("day") + F.col("off")).alias("day"))
    wau = (
        fanned.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
    )


_WEEK_US = 7 * 86_400_000_000


@query(
    "events_attribution_linear_ppm",
    oracle=f"""
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS pt, event_id AS pid
        FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT user_id, epoch_us(ts) AS ct, event_id AS cid
        FROM events WHERE event_type = 'click'
    ), pairs AS (
        SELECT p.user_id, p.pid, c.cid
        FROM p JOIN c ON p.user_id = c.user_id
         AND c.ct <= p.pt AND c.ct > p.pt - {_WEEK_US}
    ), credits AS (
        SELECT user_id, pid, cid,
               1000000 // COUNT(*) OVER (PARTITION BY pid) AS ppm
        FROM pairs
    )
    SELECT user_id, CAST(SUM(ppm) AS BIGINT) AS total_ppm, COUNT(*) AS n_credited
    FROM credits GROUP BY user_id
    """,
    tags=("events", "attribution", "multi-touch"),
)
def events_attribution_linear_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution: every click in the 7-day
    window before a same-user purchase shares the credit equally —
    the fairness-motivated alternative to last-touch
    (events_attribution_last_touch). Credit is integer parts-per-
    million, floor(1e6 / n_contributing_clicks): floats like 1/3
    are not exactly representable and their sums are order-dependent,
    so fractional credits would hash-differently across engines —
    ppm floors are exact, associative, and auditable (a purchase
    distributes at most 1e6 ppm; the floor remainder is the
    documented rounding dust).

    Scale: the click-purchase pairing is an EQUI join on user_id
    with the window residual — per-user activity bounds the fan-out.
    A user-free variant (any-click attribution) would need the
    time-slice binning of join_interval_overlap_binned; user-keyed
    attribution co-partitions with one shuffle. The per-purchase
    click count is a window over the pairs (purchase-keyed), then
    one user-keyed aggregate."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("pt"), F.col("event_id").alias("pid")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("ct"),
        F.col("event_id").alias("cid"),
    )
    pairs = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("ct") <= F.col("pt"))
        & (F.col("ct") > F.col("pt") - _WEEK_US),
    ).select("user_id", "pid", "cid")
    from pyspark.sql import Window

    w = Window.partitionBy("pid")
    credits = pairs.withColumn("cnt", F.count("*").over(w)).withColumn(
        "ppm", F.expr("1000000 div cnt")
    )
    return (
        credits.groupBy("user_id")
        .agg(F.sum("ppm").alias("total_ppm"), F.count("*").alias("n_credited"))
        .orderBy("user_id")
    )
