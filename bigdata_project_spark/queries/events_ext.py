"""Event analytics, part 2 (round 4): hypertable-style rollup
cascades and behavioral path mining over the events table.

- events_rollup_cascade: hour -> day -> month continuous-aggregate
  tiers where each tier re-aggregates the one below it (never the
  raw facts) — the hypertable/materialized-rollup pattern;
- events_top_paths: the most common daily event-type paths (first 5
  events per user-day), the product-analytics "top user journeys"
  query.

Deterministic per the registry contract; oracles in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.exact import SQL_DSUM, dcast
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "events_rollup_cascade",
    oracle=f"""
    SELECT epoch_us(date_trunc('month', ts)) AS month_start_us,
           event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "rollup", "agg"),
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade: hourly tier from the raw
    events, daily tier from the HOURLY tier, monthly tier from the
    DAILY tier. The oracle aggregates raw events straight to months —
    proving the cascade is lossless — while the Spark plan is the
    shape a continuous-aggregate system maintains incrementally: each
    tier reads only the (orders-of-magnitude smaller) tier below, so
    refreshing a month after a late-arriving hour touches one hourly
    partition + one daily row, never the raw facts.

    Decimal sums ride through every tier unrounded (decimal addition
    is associative, so hour->day->month re-aggregation is EXACTLY the
    raw aggregate — doing this with doubles would drift) and cast to
    double once at the end. Scale: the first group-by is the only
    wide shuffle; the day and month tiers aggregate a few thousand
    rows."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(dcast("value")).alias("sv"),
    )
    daily = hourly.groupBy(
        F.window(F.col("w.start"), "1 day").alias("d"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))
    monthly = daily.groupBy(
        F.date_trunc("month", F.col("d.start")).alias("m"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))
    return monthly.select(
        F.unix_micros("m").alias("month_start_us"),
        "event_type",
        "n_events",
        F.col("sv").cast("double").alias("total_value"),
    )


@query(
    "events_top_paths",
    oracle="""
    WITH ordered AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    paths AS (
        SELECT user_id, day,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ordered
        WHERE rn <= 5
        GROUP BY user_id, day
    )
    SELECT path,
           COUNT(*) AS n_user_days,
           COUNT(DISTINCT user_id) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_user_days DESC, path
    LIMIT 20
    """,
    tags=("events", "path", "window", "topk"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the 20 most common daily event-type paths,
    where a path is the user's first five events of the day in
    event-time order (event_id breaks timestamp ties, so the path
    string is engine-deterministic).

    Scale: ONE shuffle on (user_id, day) — the per-group sort +
    truncate happens inside the aggregate via
    slice(array_sort(collect_list(struct(ts, event_id, type)))), not
    a global window, so no skewed single-partition sort; struct sort
    order (ts, then event_id) matches the oracle's ORDER BY. The
    5-event cap bounds per-group state the same way a sessionizer
    truncates runaway sessions. The path histogram is a second, tiny
    shuffle; top-20 folds into TakeOrderedAndProject."""
    ev = load(spark, sf_dir, "events")
    day_paths = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                1,
                5,
            ).alias("first5")
        )
        .select(
            "user_id",
            F.concat_ws(">", F.transform(F.col("first5"), lambda x: x.event_type)).alias(
                "path"
            ),
        )
    )
    return (
        day_paths.groupBy("path")
        .agg(
            F.count("*").alias("n_user_days"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_user_days"), "path")
        .limit(20)
    )


@query(
    "events_anomaly_daily_zscore",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS x
        FROM events
        GROUP BY user_id, CAST(ts AS DATE)
    ),
    trail AS (
        SELECT user_id, day, x,
               SUM(x)     OVER w AS s,
               SUM(x * x) OVER w AS q,
               COUNT(*)   OVER w AS n
        FROM daily
        WINDOW w AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           COUNT(*) AS n_days,
           CAST(SUM(CASE WHEN n >= 3
                    AND (n * x - s) * (n * x - s) * (n - 1) > 4 * n * (n * q - s * s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
    FROM trail
    GROUP BY user_id
    """,
    tags=("events", "anomaly", "window"),
)
def events_anomaly_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily-activity anomaly detection: a day is anomalous
    when its event count deviates from the trailing-week mean by more
    than 2 sigma. The entire test is INTEGER arithmetic — the
    condition (x - s/n)^2 > 4 * (nq - s^2)/(n(n-1)) is cleared of
    divisions to (nx - s)^2 (n-1) > 4 n (nq - s^2) — so the flag is
    exact and engine-identical: no float variance, no sqrt, no
    epsilon. (The float formulation would make the 2-sigma cut
    implementation-defined near the boundary; the integer form makes
    it a theorem.)

    Scale: one shuffle to (user, day) counts, one window per user
    ordered by day (bounded 7-row frame, constant state), one tiny
    per-user rollup. Timestamp ties are impossible (one row per
    user-day), so the frame content is deterministic."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-7, -1)
    trail = daily.select(
        "user_id",
        "x",
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("q"),
        F.count("*").over(w).alias("n"),
    )
    nx_s = F.col("n") * F.col("x") - F.col("s")
    anomalous = (F.col("n") >= 3) & (
        nx_s * nx_s * (F.col("n") - 1)
        > 4 * F.col("n") * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    )
    return trail.groupBy("user_id").agg(
        F.count("*").alias("n_days"),
        F.sum(F.when(anomalous, 1).otherwise(0)).alias("n_anomalous"),
    )


@query(
    "events_cumulative_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS day
        FROM events
        GROUP BY user_id
    ),
    per_day AS (
        SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day
    )
    SELECT CAST(day AS VARCHAR) AS day,
           new_users,
           CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS cum_users
    FROM per_day
    """,
    tags=("events", "window", "growth"),
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the growth curve. COUNT
    (DISTINCT) over a running window is not computable incrementally,
    so the scale-correct rewrite is: each user's FIRST-SEEN day (one
    user-keyed aggregate), daily new-user counts, then a running sum
    over the tiny per-day series. The only SinglePartition work is
    the ordered cumsum over #days rows (~30 here, a few thousand for
    a decade), never the event stream; the same rewrite is what keeps
    this query incremental in a warehouse (yesterday's curve +
    today's new users)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    per_day = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("day").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


@query(
    "events_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS max_ts FROM events),
    per_user AS (
        SELECT user_id,
               (epoch_us((SELECT max_ts FROM anchor)) - epoch_us(MAX(ts)))
                 // 3600000000 AS recency_hours,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS monetary
        FROM events
        GROUP BY user_id
    ),
    scored AS (
        SELECT CASE WHEN recency_hours <= 2 THEN 3
                    WHEN recency_hours <= 8 THEN 2 ELSE 1 END AS r_score,
               CASE WHEN frequency >= 70 THEN 3
                    WHEN frequency >= 64 THEN 2 ELSE 1 END AS f_score,
               CASE WHEN monetary >= 3550 THEN 3
                    WHEN monetary >= 3250 THEN 2 ELSE 1 END AS m_score,
               monetary
        FROM per_user
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_users,
           CAST(SUM(CAST(monetary AS DECIMAL(38,6))) AS DOUBLE) AS segment_value
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
    tags=("events", "agg", "segmentation"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary
    scores on fixed thresholds (fixed cuts rather than quantile cuts
    keep segment membership stable release-to-release AND
    cross-engine exact — quantile cuts would move with every data
    refresh), rolled up to segment sizes and value. Recency is
    hour-grain epoch-microsecond integer division (calendar
    date_diff counts boundary crossings differently across engines;
    epoch arithmetic is exact in both); the anchor is the corpus max
    timestamp, broadcast as a 1-row aggregate.

    Scale: one user-keyed aggregate over the fact stream (map-side
    combined), then scoring is a pure map and the segment rollup has
    at most 27 groups. Decimal-exact monetary sums end to end."""
    ev = load(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("max_ts"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.sum(dcast("value")).cast("double").alias("monetary"),
        )
        .join(F.broadcast(anchor))
        .select(
            F.expr(
                "(unix_micros(max_ts) - unix_micros(last_ts)) div 3600000000"
            ).alias("recency_hours"),
            "frequency",
            "monetary",
        )
    )
    r = (
        F.when(F.col("recency_hours") <= 2, 3)
        .when(F.col("recency_hours") <= 8, 2)
        .otherwise(1)
    )
    f = F.when(F.col("frequency") >= 70, 3).when(F.col("frequency") >= 64, 2).otherwise(1)
    m = F.when(F.col("monetary") >= 3550, 3).when(F.col("monetary") >= 3250, 2).otherwise(1)
    return (
        per_user.select(
            r.alias("r_score"), f.alias("f_score"), m.alias("m_score"), "monetary"
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(dcast("monetary")).cast("double").alias("segment_value"),
        )
    )


@query(
    "events_interarrival_stats",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           MIN(gap_us) AS min_gap_us,
           MAX(gap_us) AS max_gap_us,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) AS mean_gap_us
    FROM gaps
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    tags=("events", "window", "timeseries"),
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time statistics per user: gaps between
    consecutive events as exact epoch-microsecond integers (lag over
    the same (ts, event_id) total order every other per-user window
    in this engine uses), aggregated to count/min/max/mean. The mean
    is a decimal-exact integer sum over a count — bit-identical
    across engines; no float timestamp arithmetic anywhere.

    Scale: one user-keyed window + one user-keyed aggregate riding
    the same exchange. The gap distribution is the input to burst
    detection and session-gap calibration (the 30-minute session
    threshold in this repo's sessionizers is exactly the kind of
    number this query justifies)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        (F.sum("gap_us").cast("double") / F.count("gap_us")).alias("mean_gap_us"),
    )


@query(
    "events_burst_detection",
    oracle="""
    WITH counted AS (
        SELECT user_id, ts, event_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                              RANGE BETWEEN 300000000 PRECEDING
                                        AND CURRENT ROW) AS burst
        FROM events
    )
    SELECT user_id,
           MAX(burst) AS max_burst_5m,
           MIN(CASE WHEN burst = mb THEN us END) AS burst_end_us
    FROM (
        SELECT user_id, burst, epoch_us(ts) AS us,
               MAX(burst) OVER (PARTITION BY user_id) AS mb
        FROM counted
    )
    GROUP BY user_id
    """,
    tags=("events", "window", "range", "abuse"),
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: each user's maximum event count inside any
    trailing 5-minute window, plus the (earliest) time that peak
    burst ended — the rate-limiting / abuse-detection primitive. The
    trailing count is a RANGE frame over exact epoch-microseconds
    (every event anchors a candidate window ending at itself, which
    covers all maximal bursts), so no bucketing approximation: a
    burst straddling a 5-minute bucket boundary is still counted.

    Scale: one user-keyed window sort; the RANGE frame holds at most
    one window's events in state. Ties on the peak pick the earliest
    end time (MIN over the equal-burst rows) — engine-deterministic.
    The frame is on epoch_us (not the timestamp) so frame inclusion
    is integer comparison in both engines."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us").rangeBetween(-300000000, 0)
    counted = ev.select(
        "user_id", "us", F.count("*").over(w).alias("burst")
    )
    wm = Window.partitionBy("user_id")
    flagged = counted.select(
        "user_id", "burst", "us", F.max("burst").over(wm).alias("mb")
    )
    return flagged.groupBy("user_id").agg(
        F.max("burst").alias("max_burst_5m"),
        F.min(F.when(F.col("burst") == F.col("mb"), F.col("us"))).alias("burst_end_us"),
    )


@query(
    "events_user_trend_slope",
    oracle="""
    WITH base AS (
        SELECT user_id,
               (epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id))
                 // 60000000 AS x,
               value AS y
        FROM events
    ),
    sums AS (
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        FROM base
        GROUP BY user_id
    )
    SELECT user_id, n,
           CASE WHEN n * sxx - sx * sx > 0
                THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                ELSE 0.0 END AS slope_per_minute
    FROM sums
    """,
    tags=("events", "agg", "regression"),
)
def events_user_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of event value over time — is
    each user's activity value rising or falling? Slope =
    (n Sxy - Sx Sy) / (n Sxx - Sx^2) with x = minutes since the
    user's first event (integer; anchoring per user keeps x small so
    every sum stays exactly representable) and the cross-sums routed
    through DECIMAL (y is fractional — the decimal path applies; x
    sums are plain integers). All four sums cast to double EXACTLY
    (magnitudes << 2^53), and the final arithmetic mirrors the same
    expression tree on both engines, so the slope is bit-identical
    without any regr_slope() builtin dependency.

    Scale: one window (per-user min) and one aggregate sharing the
    user_id exchange; no driver math."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    base = ev.select(
        "user_id",
        F.expr(
            "(unix_micros(ts) - min(unix_micros(ts)) OVER (PARTITION BY user_id))"
            " div 60000000"
        ).alias("x"),
        F.col("value").alias("y"),
    )
    sums = base.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(dcast("y")).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(dcast(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return sums.select(
        "user_id",
        "n",
        F.when(denom > 0, num / denom).otherwise(F.lit(0.0)).alias("slope_per_minute"),
    )


@query(
    "events_peak_concurrency",
    oracle="""
    WITH deltas AS (
        SELECT event_type, epoch_us(ts) AS t_us, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, epoch_us(ts) + 900000000 AS t_us, -1 AS delta
        FROM events
    ), run AS (
        SELECT event_type, t_us,
               SUM(delta) OVER (
                   PARTITION BY event_type ORDER BY t_us, delta
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS concurrency
        FROM deltas
    ), peak AS (
        SELECT event_type, CAST(MAX(concurrency) AS BIGINT) AS peak_concurrency
        FROM run GROUP BY event_type
    )
    SELECT r.event_type,
           p.peak_concurrency,
           MIN(r.t_us) AS peak_at_us
    FROM run r
    JOIN peak p
      ON r.event_type = p.event_type
     AND r.concurrency = p.peak_concurrency
    GROUP BY r.event_type, p.peak_concurrency
    ORDER BY r.event_type
    """,
    tags=("events", "window", "sweep"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity per event type via the sweep-line
    (+1/-1) interval-overlap pattern: each event opens a 15-minute
    activity window [ts, ts+15m); the running sum of +1 (open) and
    -1 (close) deltas ordered by time IS the concurrency curve, and
    its max is the peak. Half-open semantics come free from the
    (t_us, delta) sort key: at equal instants the -1 sorts first, so
    a window closing exactly when another opens never double-counts.
    `peak_at_us` is the earliest instant the peak is reached —
    deterministic because reordering equal (t, delta) ties permutes
    identical deltas and leaves every prefix sum unchanged.

    Exactness: all arithmetic is integer (epoch micros, unit deltas).

    Scale — TWO-STAGE SLICED SWEEP (the pack_sequences_global recipe,
    operators/corpus.py): events has ~5 distinct event types, so a
    single Window.partitionBy(event_type) would sort the entire
    doubled delta stream inside 5 partitions — a scale-killer at
    100 TB. Instead:
      1. slice = t_us div 1 day; slice is monotone in t_us and equal
         instants share a slice, so ordering by (slice, t_us, delta)
         IS the global (t_us, delta) order — semantics unchanged;
      2. the local sweep runs per (event_type, slice): the sort is
         bounded by one type-day of deltas, parallel across
         types x days partitions (hashpartitioning(event_type, slice));
      3. per-slice delta totals (a map-side partial agg — never
         sorted) roll into carry-in offsets via a window over the
         tiny (types x days)-row totals table, broadcast back;
      4. concurrency = carry_in + local_run.
    The argmax (peak value + earliest instant reaching it) is ONE
    aggregate over the curve — max(struct(concurrency, -t_us)) picks
    max concurrency then min t_us — so the curve and its sort are
    computed exactly once: no self-join, no second window pass, no
    broadcast-back onto the full curve.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("t_us")
    )
    deltas = ev.select("event_type", "t_us", F.lit(1).alias("delta")).unionAll(
        ev.select(
            "event_type",
            (F.col("t_us") + F.lit(900_000_000)).alias("t_us"),
            F.lit(-1).alias("delta"),
        )
    )
    SLICE_US = 86_400_000_000  # 1 day of epoch micros
    deltas = deltas.withColumn("slice", F.expr(f"t_us div {SLICE_US}"))
    from pyspark.sql import Window

    # stage 1: local sweep, bounded sort per (event_type, slice)
    local = Window.partitionBy("event_type", "slice").orderBy("t_us", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    swept = deltas.withColumn("local_run", F.sum("delta").over(local))
    # stage 2: carry-in = running total of whole-slice delta sums over
    # all earlier slices of the same type. The totals branch is a
    # partial-agg scan (no sort); the running-total window sees only
    # types x days rows and its result broadcasts.
    totals = deltas.groupBy("event_type", "slice").agg(
        F.sum("delta").cast("long").alias("slice_total")
    )
    w_carry = Window.partitionBy("event_type").orderBy("slice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = totals.select(
        "event_type",
        "slice",
        F.coalesce(F.sum("slice_total").over(w_carry), F.lit(0)).cast("long").alias("carry_in"),
    )
    run = swept.join(F.broadcast(carry), ["event_type", "slice"]).withColumn(
        "concurrency", F.col("carry_in") + F.col("local_run")
    )
    # argmax in one agg: struct orders by concurrency first, then
    # -t_us (t_us > 0), so max() = (peak, earliest instant at peak)
    best = run.groupBy("event_type").agg(
        F.max(F.struct(F.col("concurrency"), (-F.col("t_us")).alias("neg_t"))).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.concurrency").alias("peak_concurrency"),
        (-F.col("b.neg_t")).alias("peak_at_us"),
    ).orderBy("event_type")


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS p
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("events", "markov", "paths", "window"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for
    each (from, to) event-type pair, the count of consecutive
    occurrences in per-user timelines and the row-normalized
    transition probability — the model behind next-action
    prediction, funnel leak diagnosis, and the top-paths mining of
    events_top_paths (which enumerates realized sequences; this
    summarizes the chain that generates them).

    Determinism: the successor is defined by the total order
    (ts, event_id); `p` is one integer/integer double division per
    output row (5x5 matrix), computed AFTER exact counts.

    Scale: lead() runs on the per-user exchange (the same single
    user-keyed shuffle every sessionization query here uses), the
    pair count is map-side combined, and the row-normalizing window
    sees only |types|^2 rows. Nothing global touches raw events."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    w_row = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w_row)).alias("p"),
    ).orderBy("from_type", "to_type")


@query(
    "events_audience_overlap",
    oracle="""
    WITH tu AS (
        SELECT DISTINCT event_type, user_id FROM events
    ), sizes AS (
        SELECT event_type, COUNT(*) AS n FROM tu GROUP BY event_type
    ), inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_both,
           sa.n AS n_a, sb.n AS n_b,
           CAST(i.n_both AS DOUBLE) / (sa.n + sb.n - i.n_both) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
    tags=("events", "audience", "jaccard", "join"),
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: for every pair of event types, the
    exact count of shared users and the Jaccard similarity of their
    audiences — the segmentation question ('do clickers also
    purchase?') behind campaign targeting and funnel design.

    Scale shape: the raw facts shrink FIRST to distinct (type, user)
    pairs (one map-combined dedup — at most |types| rows per user
    survive), and the pair intersection is a self-equi-join ON
    user_id of that shrunken table: per-user fan-out is bounded by
    |types|^2 = 25, never data-dependent. Audience sizes ride a
    #types-row aggregate broadcast back onto the 10-row pair matrix.
    The jaccard is one double division of exact integers."""
    tu = load(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    sizes = tu.groupBy("event_type").agg(F.count("*").alias("n"))
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "events_longest_streak",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS day
        FROM events
    ), isl AS (
        SELECT user_id, day,
               day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
        FROM ud
    ), streaks AS (
        SELECT user_id, island, COUNT(*) AS len, MIN(day) AS start_day
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           MAX(len) AS longest_streak_days,
           MIN(CASE WHEN len = (SELECT MAX(len) FROM streaks s2
                                WHERE s2.user_id = streaks.user_id)
                    THEN start_day END) AS streak_start_day
    FROM streaks GROUP BY user_id
    """,
    tags=("events", "streak", "islands", "window"),
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (plus the
    earliest day a longest streak starts) — the gaps-and-islands
    pattern: on the deduped (user, day) table, `day - row_number()`
    is constant exactly within a run of consecutive days, so the
    island id costs one window over user-days and streaks are a
    plain group-by. The engagement metric behind 'N-day streak'
    product mechanics and habit-formation cohorts.

    Deterministic: days are integer epoch-day ordinals; the
    tie-break for equal-length streaks is MIN(start_day) — computed
    with max_by-free integer logic (max(struct(len, -start)) picks
    longest then earliest).

    Scale: the dedup shrink (at most days-per-month rows per user)
    comes FIRST, then one user-keyed window over user-days — the
    same single exchange every sessionization query here rides;
    islands never leave their user partition."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        (F.unix_micros(F.date_trunc("day", "ts")) / F.lit(86_400_000_000))
        .cast("long")
        .alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = ud.withColumn("island", F.col("day") - F.row_number().over(w))
    streaks = isl.groupBy("user_id", "island").agg(
        F.count("*").alias("len"), F.min("day").alias("start_day")
    )
    best = streaks.groupBy("user_id").agg(
        F.max(F.struct(F.col("len"), (-F.col("start_day")).alias("neg"))).alias("b")
    )
    return best.select(
        "user_id",
        F.col("b.len").alias("longest_streak_days"),
        (-F.col("b.neg")).alias("streak_start_day"),
    ).orderBy("user_id")


@query(
    "events_dow_seasonality",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow
        FROM events
    ), c AS (
        SELECT event_type, dow, COUNT(*) AS n FROM d GROUP BY 1, 2
    )
    SELECT event_type, dow, n,
           CAST(7 * n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY event_type) AS seasonality_index
    FROM c
    """,
    tags=("events", "seasonality", "agg"),
)
def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: 7 * dow_count /
    total — 1.0 means a flat week, >1 a hot day. The capacity-planning
    and anomaly-baseline primitive (a Monday spike is only an anomaly
    against the MONDAY baseline).

    Convention pinned to Spark's dayofweek (1 = Sunday); DuckDB's is
    0-based, so the oracle adds one. The index
    is one exact-integer division per output row (types x 7 rows).
    Scale: one map + one 35-group aggregate; the normalizing window
    runs over the 35-row result."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    )
    c = ev.groupBy("event_type", "dow").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "dow",
        "n",
        ((7 * F.col("n")).cast("double") / F.sum("n").over(w)).alias(
            "seasonality_index"
        ),
    ).orderBy("event_type", "dow")


@query(
    "events_session_depth_histogram",
    oracle="""
    WITH marks AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                         OR ts > LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                              + INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ), sess AS (
        SELECT user_id,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marks
    ), sizes AS (
        SELECT user_id, sid, COUNT(*) AS depth FROM sess GROUP BY 1, 2
    )
    SELECT LENGTH(BIN(depth)) - 1 AS depth_log2,
           COUNT(*) AS n_sessions,
           MIN(depth) AS min_depth,
           MAX(depth) AS max_depth
    FROM sizes GROUP BY 1
    """,
    tags=("events", "session", "histogram"),
)
def events_session_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth distribution: how many events a 30-minute-gap
    session contains, bucketed log2 — the engagement-shape metric
    (bounce-heavy vs deep-session product) that complements the
    bounce RATE (events_bounce_rate) with the whole curve.

    Same lag+cumsum sessionization as events_session_30m on the one
    user-keyed exchange; the histogram buckets with the integer
    bit-length trick (qa_skew_histogram) — no float log. The
    (ts, event_id) tiebreak makes session boundaries deterministic
    under timestamp ties."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    marks = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
        ).otherwise(0),
    )
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = marks.withColumn("sid", F.sum("new_s").over(w_run))
    sizes = sess.groupBy("user_id", "sid").agg(F.count("*").alias("depth"))
    return (
        sizes.withColumn("depth_log2", (F.length(F.bin("depth")) - 1).cast("long"))
        .groupBy("depth_log2")
        .agg(
            F.count("*").alias("n_sessions"),
            F.min("depth").alias("min_depth"),
            F.max("depth").alias("max_depth"),
        )
        .orderBy("depth_log2")
    )


@query(
    "events_new_vs_returning",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_us(date_trunc('day', ts)) AS day_us
        FROM events
    ), tagged AS (
        SELECT user_id, day_us,
               MIN(day_us) OVER (PARTITION BY user_id) AS first_day
        FROM ud
    )
    SELECT day_us,
           CAST(SUM(CASE WHEN day_us = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN day_us > first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
           CAST(SUM(CASE WHEN day_us = first_day THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS new_share
    FROM tagged GROUP BY day_us
    """,
    tags=("events", "growth", "retention"),
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split: each active user-day is 'new' iff
    it is that user's first-ever day — the top-line growth decompo-
    sition (is traffic growth acquisition or retention?) sitting
    one step before the cohort retention matrix
    (events_retention_cohort).

    Scale: shrink to distinct (user, day) FIRST, tag with a min()
    window on the same user-keyed exchange (no join back to facts),
    then one day-keyed aggregate over user-days. All counts exact;
    `new_share` is one double division."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.unix_micros(F.date_trunc("day", "ts")).alias("day_us")
    ).distinct()
    w = Window.partitionBy("user_id")
    tagged = ud.withColumn("first_day", F.min("day_us").over(w))
    return (
        tagged.groupBy("day_us")
        .agg(
            F.sum(F.when(F.col("day_us") == F.col("first_day"), 1).otherwise(0)).alias(
                "n_new"
            ),
            F.sum(F.when(F.col("day_us") > F.col("first_day"), 1).otherwise(0)).alias(
                "n_returning"
            ),
            F.count("*").alias("n_active"),
        )
        .select(
            "day_us",
            "n_new",
            "n_returning",
            (F.col("n_new").cast("double") / F.col("n_active")).alias("new_share"),
        )
        .orderBy("day_us")
    )


@query(
    "events_hour_profile",
    oracle="""
    WITH h AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod FROM events
    ), c AS (
        SELECT event_type, hod, COUNT(*) AS n FROM h GROUP BY 1, 2
    )
    SELECT event_type, hod, n,
           CAST(24 * n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY event_type) AS hour_index
    FROM c
    """,
    tags=("events", "seasonality", "agg"),
)
def events_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type (24 * hour_count /
    total; 1.0 = flat day) — the intraday twin of
    events_dow_seasonality, the baseline curve for staffing and
    rate-limit scheduling. hour() on a UTC-pinned session is
    identical cross-engine; one map + a types x 24 aggregate with a
    window over the tiny result."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("long").alias("hod")
    )
    c = ev.groupBy("event_type", "hod").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "hod",
        "n",
        ((24 * F.col("n")).cast("double") / F.sum("n").over(w)).alias("hour_index"),
    ).orderBy("event_type", "hod")


@query(
    "events_volume_anomaly_dow_adjusted",
    oracle="""
    WITH d AS (
        SELECT event_type,
               epoch_us(date_trunc('day', ts)) AS day_us,
               CAST(dayofweek(ts) + 1 AS BIGINT) AS dow
        FROM events
    ), daily AS (
        SELECT event_type, day_us, dow, COUNT(*) AS n
        FROM d GROUP BY 1, 2, 3
    ), base AS (
        SELECT event_type, dow,
               CAST(SUM(n) AS BIGINT) AS dow_total, COUNT(*) AS dow_days
        FROM daily GROUP BY 1, 2
    )
    SELECT d.event_type, d.day_us, d.n,
           b.dow_total, b.dow_days,
           CASE WHEN 2 * d.n * b.dow_days > 3 * b.dow_total
                THEN 1 ELSE 0 END AS is_anomalous
    FROM daily d JOIN base b
      ON d.event_type = b.event_type AND d.dow = b.dow
    """,
    tags=("events", "anomaly", "seasonality"),
)
def events_volume_anomaly_dow_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-ADJUSTED volume anomaly: a day is flagged when its
    count exceeds 1.5x the mean of the SAME WEEKDAY — so a busy
    Monday is judged against Mondays, fixing the false alarms a flat
    baseline (events_anomaly_daily_zscore's complement) raises on
    weekly-patterned traffic.

    The 1.5x-mean test is division-free INTEGER arithmetic:
    2 * n * dow_days > 3 * dow_total — engine-exact by construction
    (the same inequality-clearing trick as the z-score query).

    Scale: daily counts are one map-combined aggregate; the per-
    (type, dow) baseline is a types x 7 table broadcast back onto
    the types x days daily counts."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.date_trunc("day", "ts")).alias("day_us"),
        # Spark dayofweek is already 1=Sunday (the oracle shifts
        # DuckDB's 0-based value to match); dow only GROUPS here —
        # it never reaches the output
        F.dayofweek("ts").cast("long").alias("dow"),
    )
    daily = ev.groupBy("event_type", "day_us", "dow").agg(F.count("*").alias("n"))
    base = daily.groupBy(
        F.col("event_type").alias("bt"), F.col("dow").alias("bd")
    ).agg(F.sum("n").alias("dow_total"), F.count("*").alias("dow_days"))
    return (
        daily.join(
            F.broadcast(base),
            (F.col("event_type") == F.col("bt")) & (F.col("dow") == F.col("bd")),
        )
        .select(
            "event_type",
            "day_us",
            "n",
            "dow_total",
            "dow_days",
            F.when(
                2 * F.col("n") * F.col("dow_days") > 3 * F.col("dow_total"), 1
            )
            .otherwise(0)
            .alias("is_anomalous"),
        )
        .orderBy("event_type", "day_us")
    )
