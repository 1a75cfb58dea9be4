"""Analytical extensions: linear regression aggregates, distribution
entropy, and ratio-to-report windows — serving-layer metrics built on
the exact-statistics discipline (SURVEY.md §2.4/2.5 long tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdata_project_spark.exact import dcast
from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load


@query(
    "agg_regression_price_on_qty",
    oracle="""
    WITH c AS (
        SELECT l_returnflag,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
        FROM lineitem
    ), s AS (
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxy
        FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_cents_per_unit,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept_cents
    FROM s
    """,
    tags=("agg", "regression"),
)
def agg_regression_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression aggregates (regr_slope / regr_intercept
    semantics) from exact integer sufficient statistics — one pass,
    map-side combinable; price in cents so every sum is exact."""
    l = load(spark, sf_dir, "lineitem")
    x = F.round("l_quantity", 0).cast("long")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    c = l.select("l_returnflag", x.alias("x"), y.alias("y"))
    yd = F.col("y").cast("decimal(38,0)")
    s = c.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(yd * F.col("x")).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, sxy = (F.col(k) for k in ("n", "sx", "sxx", "sy", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        "n",
        slope.alias("slope_cents_per_unit"),
        ((sy - slope * sx) / n).alias("intercept_cents"),
    )


@query(
    "agg_user_event_entropy",
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type
    ), totals AS (
        SELECT user_id, SUM(c) AS total FROM counts GROUP BY user_id
    )
    SELECT c.user_id,
           ROUND(-SUM((CAST(c.c AS DOUBLE) / t.total) * LN(CAST(c.c AS DOUBLE) / t.total)), 6)
               AS entropy_nats,
           COUNT(*) AS n_types
    FROM counts c JOIN totals t ON c.user_id = t.user_id
    GROUP BY c.user_id
    """,
    tags=("agg", "entropy"),
)
def agg_user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature (and a quality signal for LLM-corpus
    source mixing). ln rounded to 6 (libm ulps); everything feeding
    it is exact integer ratios so the sum has a fixed tiny term count
    (<= 5 types) and identical association order after the group sort.
    """
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    totals = counts.groupBy("user_id").agg(F.sum("c").alias("total"))
    p = F.col("c").cast("double") / F.col("total")
    joined = counts.join(totals, "user_id")
    # fixed summation order: sort terms by event_type inside the group
    per_type = joined.select("user_id", "event_type", (p * F.log(p)).alias("term"))
    terms = per_type.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("event_type", "term"))).alias("ts")
    )
    ent = F.round(
        -F.aggregate(F.col("ts"), F.lit(0.0), lambda acc, s: acc + s["term"]), 6
    )
    return terms.select(
        "user_id",
        ent.alias("entropy_nats"),
        F.size("ts").alias("n_types"),
    )


@query(
    "window_ratio_to_report",
    oracle="""
    SELECT n_name, o_orderkey,
           o_totalprice,
           o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
               OVER (PARTITION BY n_name) AS DOUBLE) AS share_of_nation
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderkey % 25 = 0
    """,
    tags=("window", "ratio"),
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order's share of its nation's total —
    the market-share window (decimal-exact denominator, one
    deterministic division per row)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    j = o.join(c, o.o_custkey == c.c_custkey).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    total = F.sum(dcast("o_totalprice")).over(W.partitionBy("n_name")).cast("double")
    return j.select(
        "n_name",
        "o_orderkey",
        "o_totalprice",
        (F.col("o_totalprice") / total).alias("share_of_nation"),
    )


@query(
    "scd2_user_status_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us
    FROM changes
    """,
    tags=("window", "scd2", "warehouse"),
)
def scd2_user_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build — the warehouse pattern for 'what was this
    entity's state at time T': collapse each user's event stream to
    status-CHANGE rows (lag inequality), then close each change's
    validity interval with the next change's timestamp (lead); the
    open interval (valid_to_us NULL) is the current state.

    One shuffle: both windows partition by user_id with the same
    (ts, event_id) total order, so Catalyst plans a single exchange +
    sort and runs lag and lead in consecutive Window operators over
    the same partitioning. (event_id breaks same-timestamp ties, so
    the interval chain is engine-independent.)"""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    return changes.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
    )


@query(
    "lake_merge_upsert_projection",
    oracle="""
    WITH target AS (SELECT doc_id, text FROM documents),
    source AS (
        SELECT doc_id, 'REVISED ' || text AS text
        FROM documents WHERE doc_id % 10 = 9
        UNION ALL
        SELECT doc_id + 10000000, 'NEW DOC ' || CAST(doc_id AS VARCHAR)
        FROM documents WHERE doc_id % 100 = 42
    )
    SELECT COALESCE(t.doc_id, s.doc_id) AS doc_id,
           md5(COALESCE(s.text, t.text)) AS text_hash,
           CAST(t.doc_id IS NOT NULL AND s.doc_id IS NOT NULL AS INT) AS was_updated,
           CAST(t.doc_id IS NULL AS INT) AS was_inserted
    FROM target t FULL OUTER JOIN source s ON s.doc_id = t.doc_id
    """,
    tags=("join", "merge", "warehouse"),
)
def lake_merge_upsert_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a projection — the upsert SELECT a lake
    engine (Delta/Iceberg) compiles MERGE to: FULL OUTER JOIN target
    with the change batch, take the source row when matched (update)
    or unmatched-by-target (insert), else keep the target row. The
    change batch is derived deterministically (every 10th doc revised,
    every 100th+42 inserted under a shifted key) so both engines build
    identical inputs.

    Scale note: a real MERGE prunes the join to the partitions the
    batch touches (file-level min/max on the key) — the FULL OUTER
    here is the worst-case full-table form; with the batch small and
    the join keyed on doc_id, AQE broadcasts the batch side and the
    target is a single scan."""
    docs = load(spark, sf_dir, "documents")
    target = docs.select("doc_id", "text")
    source = (
        docs.filter(F.col("doc_id") % 10 == 9)
        .select("doc_id", F.concat(F.lit("REVISED "), F.col("text")).alias("text"))
        .unionByName(
            docs.filter(F.col("doc_id") % 100 == 42).select(
                (F.col("doc_id") + 10000000).alias("doc_id"),
                F.concat(F.lit("NEW DOC "), F.col("doc_id").cast("string")).alias("text"),
            )
        )
    )
    t = target.alias("t")
    s = source.alias("s")
    return t.join(s, F.col("t.doc_id") == F.col("s.doc_id"), "full_outer").select(
        F.coalesce("t.doc_id", "s.doc_id").alias("doc_id"),
        F.md5(F.coalesce("s.text", "t.text")).alias("text_hash"),
        (F.col("t.doc_id").isNotNull() & F.col("s.doc_id").isNotNull()).cast("int").alias("was_updated"),
        F.col("t.doc_id").isNull().cast("int").alias("was_inserted"),
    )


@query(
    "scd2_snapshot_diff",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    hist AS (
        SELECT user_id, event_type, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM changes
    ),
    t1 AS (
        SELECT user_id, event_type AS status_t1 FROM hist
        WHERE valid_from <= TIMESTAMP '2024-01-10'
          AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-10')
    ),
    t2 AS (
        SELECT user_id, event_type AS status_t2 FROM hist
        WHERE valid_from <= TIMESTAMP '2024-01-20'
          AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-20')
    )
    SELECT COALESCE(t1.status_t1, 'absent') AS status_t1,
           COALESCE(t2.status_t2, 'absent') AS status_t2,
           COUNT(*) AS n_users
    FROM t1 FULL OUTER JOIN t2 ON t1.user_id = t2.user_id
    GROUP BY 1, 2
    """,
    tags=("scd2", "warehouse", "diff"),
)
def scd2_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 history: reconstruct every user's
    status as-of two snapshot times (valid_from <= T < valid_to — an
    interval point-lookup, no event replay) and emit the transition
    matrix between the snapshots, 'absent' marking users not yet
    seen. This is the audit query behind 'what changed between
    yesterday's and today's snapshot' on a lakehouse table.

    Scale: the history build is the existing one-shuffle SCD2 plan;
    each snapshot is a FILTER on it (no extra shuffle), and the diff
    joins two (user -> status) maps on the user key they are already
    grouped by. The transition matrix is at most #status^2 rows."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    from bigdata_project_spark.caching import tracked_persist

    hist = tracked_persist(hist)

    def snapshot(t: str, alias: str) -> DataFrame:
        ts = F.lit(t).cast("timestamp")
        return hist.filter(
            (F.col("valid_from") <= ts)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
        ).select("user_id", F.col("event_type").alias(alias))

    t1 = snapshot("2024-01-10", "status_t1")
    t2 = snapshot("2024-01-20", "status_t2").withColumnRenamed("user_id", "u2")
    return (
        t1.join(t2, t1.user_id == F.col("u2"), "full_outer")
        .groupBy(
            F.coalesce("status_t1", F.lit("absent")).alias("status_t1"),
            F.coalesce("status_t2", F.lit("absent")).alias("status_t2"),
        )
        .agg(F.count("*").alias("n_users"))
    )


_CORR_VARS = ("qty", "price", "disc", "tax")
_CORR_PAIRS = [
    (a, b) for i, a in enumerate(_CORR_VARS) for b in _CORR_VARS[i + 1 :]
]


def _sql_corr(x: str, y: str) -> str:
    num = f"(n * s_{x}{y} - s_{x} * s_{y})"
    vx = f"(n * s_{x}{x} - s_{x} * s_{x})"
    vy = f"(n * s_{y}{y} - s_{y} * s_{y})"
    return f"CASE WHEN {vx} <= 0 OR {vy} <= 0 THEN NULL ELSE {num} / (sqrt({vx}) * sqrt({vy})) END"


@query(
    "agg_correlation_matrix",
    oracle=f"""
    WITH c AS (
        SELECT l_returnflag,
               CAST(CAST(ROUND(l_quantity, 0)            AS BIGINT) AS DECIMAL(38,0)) AS qty,
               CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS DECIMAL(38,0)) AS price,
               CAST(CAST(ROUND(l_discount * 100, 0)      AS BIGINT) AS DECIMAL(38,0)) AS disc,
               CAST(CAST(ROUND(l_tax * 100, 0)           AS BIGINT) AS DECIMAL(38,0)) AS tax
        FROM lineitem
    ), s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               {", ".join(f"CAST(SUM({v}) AS DOUBLE) AS s_{v}" for v in _CORR_VARS)},
               {", ".join(f"CAST(SUM({a} * {b}) AS DOUBLE) AS s_{a}{b}" for a in _CORR_VARS for b in _CORR_VARS if a <= b)}
        FROM c GROUP BY l_returnflag
    )
    {" UNION ALL ".join(
        f"SELECT l_returnflag, '{a}_{b}' AS measure_pair, CAST(n AS BIGINT) AS n, "
        f"{_sql_corr(*sorted((a, b)))} AS corr FROM s"
        for a, b in _CORR_PAIRS
    )}
    """,
    tags=("agg", "statistics", "correlation"),
)
def agg_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of the four lineitem
    measures (quantity, price, discount, tax) per return flag — all
    six pairs from ONE scan: the aggregate collects the shared
    sufficient statistics (4 sums, 4 sums of squares, 6 cross sums,
    n = 15 exact DECIMAL aggregates, map-side combined), and each
    correlation is then a closed-form double expression over them.
    Calling corr() six times would scan the fact table six times;
    this is the standard one-pass moment-matrix form (the same trick
    a covariance-matrix or PCA-prep job uses over 100 TB).

    Determinism: measures are integerized first (units, cents, basis
    points), every sufficient statistic is an exact DECIMAL(38,0) sum
    cast to double only at the end, and both engines evaluate the
    IDENTICAL final double formula (sqrt is IEEE correctly-rounded),
    so the doubles match bit-for-bit. Zero-variance pairs yield NULL
    via the same guard on both sides.

    Scale: one shuffle of 15-value partial aggregates per flag; the
    unpivot to (pair, corr) rows happens on the 3-row result."""
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    # per-row values and products stay in LONG — the integerized
    # measures are bounded (price cents ~1e7, so the largest product
    # is ~1e14, four orders under int64) — and only the ACCUMULATOR
    # is DECIMAL, where row counts can push sums past 2^63. Keeping
    # the per-row multiply out of BigDecimal is a measured ~25% win
    # on the scan-bound aggregate with identical exact sums.
    c = li.select(
        "l_returnflag",
        F.round("l_quantity", 0).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("price"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("disc"),
        F.round(F.col("l_tax") * 100, 0).cast("long").alias("tax"),
    )
    aggs = [F.count("*").cast("double").alias("n")]
    aggs += [F.sum(F.col(v).cast(dec)).cast("double").alias(f"s_{v}") for v in _CORR_VARS]
    aggs += [
        F.sum((F.col(a) * F.col(b)).cast(dec)).cast("double").alias(f"s_{a}{b}")
        for a in _CORR_VARS
        for b in _CORR_VARS
        if a <= b
    ]
    s = c.groupBy("l_returnflag").agg(*aggs)

    def corr_col(a: str, b: str) -> F.Column:
        x, y = sorted((a, b))
        n = F.col("n")
        num = n * F.col(f"s_{x}{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        vx = n * F.col(f"s_{x}{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")
        vy = n * F.col(f"s_{y}{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")
        return F.when((vx <= 0) | (vy <= 0), F.lit(None).cast("double")).otherwise(
            num / (F.sqrt(vx) * F.sqrt(vy))
        )

    stack_args: list = []
    for a, b in _CORR_PAIRS:
        stack_args += [F.lit(f"{a}_{b}"), corr_col(a, b)]
    return s.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.stack(F.lit(len(_CORR_PAIRS)), *stack_args).alias("measure_pair", "corr"),
    ).select("l_returnflag", "measure_pair", "n", "corr")
