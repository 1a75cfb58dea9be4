"""Time-series diagnostics over the events table (round 5): CUSUM
changepoint detection, weekly-seasonality autocorrelation, and a
data-freshness audit.

These are the monitoring queries an event pipeline runs continuously:
"when did the level shift?" (CUSUM), "how weekly is this signal?"
(lag-7 autocorrelation), "is any source stale?" (freshness lag).
All three follow the registry determinism contract — integer or
exact-decimal sufficient statistics end-to-end, one double division
(or an identically-shaped double formula) at the very end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "events_changepoint_cusum",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    curve AS (
        SELECT event_type, day, x,
               SUM(x)     OVER w AS prefix,
               ROW_NUMBER() OVER w AS k,
               SUM(x)   OVER (PARTITION BY event_type) AS total,
               COUNT(*) OVER (PARTITION BY event_type) AS n_days
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    scored AS (
        SELECT event_type, day, total, n_days,
               abs(n_days * prefix - k * total) AS abs_cusum_scaled,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY abs(n_days * prefix - k * total) DESC,
                                           day ASC) AS rn
        FROM curve
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS cp_day,
           n_days,
           CAST(total AS BIGINT) AS total_events,
           CAST(abs_cusum_scaled AS BIGINT) AS abs_cusum_scaled,
           CAST(abs_cusum_scaled AS DOUBLE) / n_days AS cusum_peak
    FROM scored WHERE rn = 1
    """,
    tags=("events", "timeseries", "changepoint", "window"),
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the day where the
    cumulative sum of deviations from the series mean peaks in
    absolute value — the classic single-changepoint estimator (the
    max-|CUSUM| location splits the series where the level shifted).
    The statistic is kept INTEGER by scaling: with D days and total T,
    S_k = prefix_k - k*T/D is rescaled to D*prefix_k - k*T, so the
    argmax (and its tie-break to the earliest day) is exact
    arithmetic in both engines; the reported `cusum_peak` divides
    back by D in one final double division.

    Scale: raw events collapse to (type, day) counts in one map-side
    combined aggregate; every window after that runs over the tiny
    types x days table (a few thousand rows regardless of corpus
    size), so no per-event sort exists anywhere — the same
    "aggregate first, analyze the small curve" discipline as the
    anomaly and seasonality queries."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    w_all = Window.partitionBy("event_type")
    curve = daily.select(
        "event_type",
        "day",
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("prefix"),
        F.row_number().over(w).alias("k"),
        F.sum("x").over(w_all).alias("total"),
        F.count("*").over(w_all).alias("n_days"),
    )
    scored = curve.select(
        "event_type",
        "day",
        "total",
        "n_days",
        F.abs(F.col("n_days") * F.col("prefix") - F.col("k") * F.col("total")).alias(
            "abs_cusum_scaled"
        ),
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc("abs_cusum_scaled"), F.asc("day"))
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("cp_day"),
            "n_days",
            F.col("total").alias("total_events"),
            "abs_cusum_scaled",
            (F.col("abs_cusum_scaled").cast("double") / F.col("n_days")).alias("cusum_peak"),
        )
    )


@query(
    "events_autocorr_lag7",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type, a.x AS x, b.x AS y
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.day = a.day - INTERVAL 7 DAY
    ),
    s AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM pairs GROUP BY 1
    )
    SELECT event_type, n AS n_pairs,
           CASE WHEN (n * sxx - sx * sx) <= 0 OR (n * syy - sy * sy) <= 0 THEN NULL
                ELSE (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
           END AS autocorr_lag7
    FROM s
    """,
    tags=("events", "timeseries", "seasonality"),
)
def events_autocorr_lag7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-7 autocorrelation of daily volume per event type — the
    weekly-seasonality strength score (near 1: strongly weekly; near
    0: no weekly structure). Pairs are matched by CALENDAR day
    (equi-join on day = day - 7), not by row offset, so calendar
    gaps cannot silently misalign the lag. Sufficient statistics
    (n, sx, sy, sxx, syy, sxy) are exact BIGINT sums of daily counts;
    the zero-variance guard is an exact integer comparison, and the
    final Pearson formula is the identical double expression in both
    engines (sqrt is IEEE correctly-rounded, so exact inputs give
    bit-identical outputs).

    Scale: one map-side combined aggregate collapses events to the
    types x days curve; the lag join and the stats aggregate run on
    that tiny table. Nothing after the first aggregate touches raw
    events."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") == F.date_sub(F.col("a.day"), 7)),
    ).select(F.col("a.event_type").alias("event_type"), F.col("a.x").alias("x"), F.col("b.x").alias("y"))
    s = pairs.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    var_x = n * sxx - sx * sx  # exact bigint
    var_y = n * syy - sy * sy
    corr = (n.cast("double") * sxy - sx.cast("double") * sy) / (
        F.sqrt(n.cast("double") * sxx - sx.cast("double") * sx)
        * F.sqrt(n.cast("double") * syy - sy.cast("double") * sy)
    )
    return s.select(
        "event_type",
        n.alias("n_pairs"),
        F.when((var_x <= 0) | (var_y <= 0), F.lit(None).cast("double"))
        .otherwise(corr)
        .alias("autocorr_lag7"),
    )


@query(
    "events_freshness_lag",
    oracle="""
    WITH pt AS (
        SELECT event_type, MAX(epoch_us(ts)) AS last_us, COUNT(*) AS n_events
        FROM events GROUP BY 1
    ),
    g AS (SELECT MAX(last_us) AS gmax FROM pt),
    recent AS (
        SELECT event_type, COUNT(*) AS n_last24h
        FROM events, g
        WHERE epoch_us(ts) >= g.gmax - 86400000000
        GROUP BY event_type
    )
    SELECT pt.event_type,
           pt.last_us AS last_event_us,
           (g.gmax - pt.last_us) // 60000000 AS lag_minutes,
           pt.n_events,
           COALESCE(r.n_last24h, 0) AS n_last24h
    FROM pt CROSS JOIN g
    LEFT JOIN recent r ON r.event_type = pt.event_type
    """,
    tags=("events", "qa", "freshness"),
)
def events_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness audit: per event type, the last-seen timestamp,
    its lag in whole minutes behind the freshest type anywhere in the
    table, and the volume inside the trailing 24 h of data — the
    "is a source silently stale?" check every ingestion pipeline
    schedules. All integer (epoch micros, floor-division minutes).

    Scale: TWO scans of events, both map-side combined aggregates
    (per-type max/count; per-type count over the 24 h predicate) —
    the global max is a 1-row broadcast derived from the 5-row
    per-type table, never a global window over facts. The 24 h
    filter compares against that broadcast scalar, so it pushes into
    the scan-side predicate evaluation after AQE resolves it."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("t_us")
    )
    pt = ev.groupBy("event_type").agg(
        F.max("t_us").alias("last_us"), F.count("*").alias("n_events")
    )
    g = pt.agg(F.max("last_us").alias("gmax"))
    recent = (
        ev.join(F.broadcast(g))
        .filter(F.col("t_us") >= F.col("gmax") - F.lit(86_400_000_000))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_last24h"))
    )
    return (
        pt.join(F.broadcast(g))
        .join(recent, "event_type", "left")
        .select(
            "event_type",
            F.col("last_us").alias("last_event_us"),
            F.expr("(gmax - last_us) div 60000000").alias("lag_minutes"),
            "n_events",
            F.coalesce("n_last24h", F.lit(0)).alias("n_last24h"),
        )
    )


@query(
    "events_bot_flag_rules",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, epoch_us(ts) AS t_us,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ),
    per_user AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               MAX(t_us) - MIN(t_us) AS span_us,
               COUNT(DISTINCT gap_us) AS n_distinct_gaps,
               COUNT(DISTINCT event_type) AS n_types
        FROM seq GROUP BY user_id
    )
    SELECT user_id, n_events,
           span_us // 60000000 AS span_minutes,
           CAST((span_us = 0 AND n_events >= 10)
                OR (span_us > 0 AND n_events * 60000000 > 2 * span_us) AS INT)
               AS rule_rate,
           CAST(n_events >= 5 AND n_distinct_gaps = 1 AS INT) AS rule_periodic,
           CAST(n_events >= 20 AND n_types = 1 AS INT) AS rule_single_type,
           CAST((span_us = 0 AND n_events >= 10)
                OR (span_us > 0 AND n_events * 60000000 > 2 * span_us)
                OR (n_events >= 5 AND n_distinct_gaps = 1)
                OR (n_events >= 20 AND n_types = 1) AS INT) AS is_bot
    FROM per_user
    """,
    tags=("events", "qa", "bot", "rules", "window"),
)
def events_bot_flag_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based bot detection — the traffic-hygiene pass a
    training-data pipeline runs before trusting behavioral data (bot
    sessions poison funnels, retention, and any corpus built from
    user interactions). Three Gopher-style integer rules per user:
    sustained rate above 2 events/minute over the account's active
    span (cross-multiplied, division-free), perfectly periodic
    inter-arrival gaps (>= 5 events, exactly one distinct gap — the
    cron-job signature), and single-type monomania (>= 20 events, one
    event type). `is_bot` is the OR; each rule bit ships separately
    so thresholds can be audited and retuned per rule.

    Determinism: every rule is integer arithmetic on exact counts and
    epoch-micro spans; gap sequence is defined by the strict
    (ts, event_id) order.

    Scale: the lag window and the per-user aggregate ride ONE user_id
    exchange (same key); distinct-gap and distinct-type counts are
    per-group hash distincts bounded by the user's own events. No
    joins, no broadcast, nothing global."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    )
    per_user = seq.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.max("t_us") - F.min("t_us")).alias("span_us"),
        F.count_distinct("gap_us").alias("n_distinct_gaps"),
        F.count_distinct("event_type").alias("n_types"),
    )
    n, span = F.col("n_events"), F.col("span_us")
    rule_rate = ((span == 0) & (n >= 10)) | ((span > 0) & (n * 60_000_000 > 2 * span))
    rule_periodic = (n >= 5) & (F.col("n_distinct_gaps") == 1)
    rule_single = (n >= 20) & (F.col("n_types") == 1)
    return per_user.select(
        "user_id",
        "n_events",
        F.expr("span_us div 60000000").alias("span_minutes"),
        rule_rate.cast("int").alias("rule_rate"),
        rule_periodic.cast("int").alias("rule_periodic"),
        rule_single.cast("int").alias("rule_single_type"),
        (rule_rate | rule_periodic | rule_single).cast("int").alias("is_bot"),
    )


@query(
    "events_ab_test_zflag",
    oracle="""
    WITH assign AS (
        SELECT user_id, user_id % 2 AS variant,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    w AS (
        SELECT
          CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
          CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS c0,
          CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS c1
        FROM assign
    )
    SELECT n0 AS n_users_a, c0 AS n_conv_a,
           CASE WHEN n0 > 0 THEN CAST(c0 AS DOUBLE) / n0 END AS cvr_a,
           n1 AS n_users_b, c1 AS n_conv_b,
           CASE WHEN n1 > 0 THEN CAST(c1 AS DOUBLE) / n1 END AS cvr_b,
           CASE WHEN n0 > 0 AND n1 > 0
                THEN CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0
           END AS lift_abs,
           CAST(2401 * CAST((c0 + c1) AS DECIMAL(38,0))
                        * ((n0 + n1) - (c0 + c1)) * n0 * n1 > 0
                AND 625 * (CAST(c1 AS DECIMAL(38,0)) * n0 - CAST(c0 AS DECIMAL(38,0)) * n1)
                     * (CAST(c1 AS DECIMAL(38,0)) * n0 - CAST(c0 AS DECIMAL(38,0)) * n1)
                     * (n0 + n1)
                >= 2401 * CAST((c0 + c1) AS DECIMAL(38,0))
                        * ((n0 + n1) - (c0 + c1)) * n0 * n1 AS INT)
               AS significant_95
    FROM w
    """,
    tags=("events", "experiment", "abtest", "statistics"),
)
def events_ab_test_zflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with an EXACT significance flag: users
    hash into two variants (user_id parity — the deterministic
    assignment stand-in), the metric is purchase conversion, and the
    two-proportion z-test at 95% is cleared of every division and
    sqrt into one integer inequality:
        625 * (c1*n0 - c0*n1)^2 * N  >=  2401 * C * (N - C) * n0*n1
    (z_crit = 1.96 = 49/25, so z^2 = 2401/625 stays rational; C, N are
    pooled conversions/users; a degenerate pooled variance — nobody
    or everybody converted — is explicitly NOT significant, since z
    is undefined there). The flag is therefore a THEOREM about
    the counts — no float variance, no boundary flapping between
    engines — while the human-facing rates and lift are single
    divisions. Products run in DECIMAL(38,0) (the squared term
    overflows int64 at cluster-scale user counts; DuckDB computes the
    same values in HUGEINT).

    Scale: one map-side combined per-user aggregate (the max() makes
    conversion idempotent per user), then ONE conditional global
    aggregate (four sums in a single reduce — exactly one output row
    even when a variant is empty) — experiment readouts at 100 TB are
    exactly this shape, the raw events never shuffle twice."""
    ev = load(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    )
    # one conditional aggregation over the per-user table (NOT two
    # filtered 1-row frames cross-joined): if a variant has zero
    # users, the cross-join form would emit 0 rows while the oracle
    # emits one — the conditional-sum form emits exactly one row in
    # both engines on every input, degenerate or not
    variant = F.col("user_id") % 2
    w = assign.agg(
        F.sum(F.when(variant == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(variant == 0, F.col("converted")).otherwise(0)).alias("c0"),
        F.sum(F.when(variant == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(variant == 1, F.col("converted")).otherwise(0)).alias("c1"),
    )
    dec = "decimal(38,0)"
    n0, c0, n1, c1 = (F.col(x) for x in ("n0", "c0", "n1", "c1"))
    diff = c1.cast(dec) * n0 - c0.cast(dec) * n1
    pooled_c = (c0 + c1).cast(dec)
    lhs = F.lit(625).cast(dec) * diff * diff * (n0 + n1)
    rhs = F.lit(2401).cast(dec) * pooled_c * ((n0 + n1) - (c0 + c1)) * n0 * n1
    significant = (rhs > 0) & (lhs >= rhs)
    # empty-variant guard: ANSI mode makes x/0 an error, and the rate
    # of an empty variant is undefined anyway — NULL in both engines
    cvr_a = F.when(n0 > 0, c0.cast("double") / n0)
    cvr_b = F.when(n1 > 0, c1.cast("double") / n1)
    return w.select(
        n0.alias("n_users_a"),
        c0.alias("n_conv_a"),
        cvr_a.alias("cvr_a"),
        n1.alias("n_users_b"),
        c1.alias("n_conv_b"),
        cvr_b.alias("cvr_b"),
        F.when((n0 > 0) & (n1 > 0), cvr_b - cvr_a).alias("lift_abs"),
        significant.cast("int").alias("significant_95"),
    )
