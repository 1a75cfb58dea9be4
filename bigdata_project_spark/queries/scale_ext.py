"""Scale-pattern analytics (round 5). Each query is the SCALE-SAFE
shape of a classically quadratic or single-partition problem:

- agg_heavy_hitters_exact: "which keys exceed 1/K of all traffic"
  without trusting an approximate sketch — a map-only mergeable-
  summary (Misra-Gries) pass generates a guaranteed-superset
  candidate set, one exact counting pass verifies. Output is EXACT.
- sort_pareto_frontier: the skyline operator (non-dominated points)
  without the O(n^2) NOT-EXISTS self-join the naive SQL implies —
  bucketed local frontiers + a broadcast cross-bucket carry, the
  same sliced-sweep recipe as events_peak_concurrency.
- join_geo_grid_radius: "all pairs within R km" without a cross
  join — integer grid cells + a 9-cell neighborhood equi-join bound
  the candidate pairs, exact haversine verifies.
- join_interval_overlap_binned: big-big temporal overlap with no
  shared key — time-slice binning turns the range join into an
  equi-join with a fixed 2x fan-out.
- sim_knn_quantized_int8: int8 fixed-point vector quantization with
  a power-of-two scale — bit-exact in any float width, exact
  integer dot-product top-k.
- ivm_join_view_delta: incremental join-view maintenance via the
  delta-join identity — O(delta) refresh, never a view recompute.

Deterministic per the registry contract; oracles in DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_project_spark.registry import query
from bigdata_project_spark.tables import load

# Heavy-hitter threshold: tokens with count * K > total token count,
# i.e. > 1/K of the token stream. Mirrored in the oracle SQL below.
_HH_K = 40


def mg_merge(counts: dict, batch_counts, cap: int) -> dict:
    """One mergeable-summaries step (Agarwal et al., 'Mergeable
    Summaries'): add a batch of exact counts into a Misra-Gries
    summary, then if it exceeds `cap` entries subtract the (cap+1)-th
    largest count from every entry and drop non-positives. Guarantee
    preserved: every key's summary count underestimates its true
    count by at most (stream length)/(cap+1). Module-level (not a
    closure) so the property test can drive it with synthetic skewed
    streams where the prune actually fires."""
    for k, v in batch_counts:
        counts[k] = counts.get(k, 0) + int(v)
    if len(counts) > cap:
        vals = sorted(counts.values(), reverse=True)
        sub = vals[cap]  # (cap+1)-th largest
        counts = {k: c - sub for k, c in counts.items() if c > sub}
    return counts


@query(
    "agg_heavy_hitters_exact",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT tok,
           COUNT(*) AS n_tok,
           CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM toks) AS share
    FROM toks
    GROUP BY tok
    HAVING COUNT(*) * {_HH_K} > (SELECT COUNT(*) FROM toks)
    """,
    tags=("agg", "sketch", "heavy-hitter", "llm", "text"),
)
def agg_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters over the corpus token stream (tokens with
    > 1/K of all occurrences, K=40 — the boilerplate/stopword screen
    of a training-data pipeline) via the candidate-then-verify
    pattern — the scale-correct way to get exact answers when the key
    space (web-scale vocabulary) is too large to group exactly:

    1. CANDIDATES — a map-only mapInPandas pass builds one Misra-
       Gries summary per partition (capacity K, merged batch-at-a-
       time with the mergeable-summaries prune in `mg_merge`). MG's
       guarantee: a key's summary count underestimates its partition-
       local count by at most n_p/(K+1). A key with global count
       > n/K must, by averaging, have count > n_p/K >= n_p/(K+1) in
       at least one partition — so the union of per-partition
       summaries is a SUPERSET of every true heavy hitter. At most
       K x n_partitions candidate rows leave the map stage; the raw
       token stream is never shuffled.
    2. VERIFY — one exact counting pass restricted to the candidates
       (broadcast left-semi join, map-side partial counts), filtered
       by the exact integer predicate count * K > total. The
       surviving keys are by construction the most frequent — the
       partial aggregation combines them map-side, so the heavy keys
       themselves cannot skew the (tiny) shuffle.

    The candidate SET depends on partition boundaries; the OUTPUT
    does not — verification recounts exactly, so the result equals
    the oracle's plain GROUP BY ... HAVING on any partitioning.

    Testbed honesty: documents' synthetic vocabulary (31 tokens) is
    smaller than the capacity, so the prune never fires here — the
    prune path is property-tested on synthetic skewed streams with
    |vocab| >> capacity (tests/test_scale_ext.py). All threshold
    comparisons are integer (count * K > total); `share` is one
    double division — IEEE-identical in both engines.
    """
    toks = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )

    cap = _HH_K

    def mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # inline copy of mg_merge (kept in lock-step; module-level
        # twin exists for the property test) so cloudpickle ships the
        # closure by value — workers never import this repo
        counts: dict[str, int] = {}
        for pdf in batches:
            for k, v in pdf["tok"].value_counts().items():
                counts[k] = counts.get(k, 0) + int(v)
            if len(counts) > cap:
                vals = sorted(counts.values(), reverse=True)
                sub = vals[cap]
                counts = {k: c - sub for k, c in counts.items() if c > sub}
        if counts:
            yield pd.DataFrame({"tok": list(counts.keys())})

    candidates = toks.mapInPandas(mg_candidates, "tok string").distinct()

    total = toks.agg(F.count("*").alias("total"))
    exact = (
        toks.join(F.broadcast(candidates), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("n_tok"))
    )
    return (
        exact.join(F.broadcast(total))
        .filter(F.col("n_tok") * _HH_K > F.col("total"))
        .select(
            "tok",
            "n_tok",
            (F.col("n_tok").cast("double") / F.col("total")).alias("share"),
        )
        .orderBy(F.desc("n_tok"), "tok")
    )


@query(
    "sort_pareto_frontier",
    oracle="""
    -- rows with unknown price/size are excluded up front: under raw
    -- NOT EXISTS a NULL price is vacuously undominated (every
    -- comparison is UNKNOWN), which would put every null row on the
    -- frontier — not a meaningful skyline membership
    WITH pp AS (
        SELECT p_partkey, p_retailprice, p_size FROM part
        WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    )
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM pp p
    WHERE NOT EXISTS (
        SELECT 1 FROM pp q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    tags=("sort", "skyline", "window"),
)
def sort_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier / skyline: parts not dominated on (cheaper
    price, larger size). The oracle is the O(n^2) NOT-EXISTS
    definition; the Spark plan is the two-stage bucketed sweep that
    replaces it at scale (the sliced-sweep recipe of
    events_peak_concurrency / pack_sequences_global):

    1. bucket = floor(price / 100): a fixed price-range slice, so
       every strictly-cheaper point is either in the same bucket or
       a strictly smaller one;
    2. per (bucket, price) group-max of size (`gmax`) collapses the
       facts to one row per distinct price BEFORE any window — the
       window input is the deduped price table, orders of magnitude
       smaller than the facts;
    3. within a bucket, `m1` = running max of gmax over strictly
       cheaper prices (rows-frame to -1 on the deduped table, where
       each price occurs exactly once — bounded sort per bucket);
    4. across buckets, the carry is a running max over the per-
       bucket maxima — a #buckets-row table (the single-partition
       window is over ~dozens of rows) broadcast back;
    5. a price survives iff gmax beats BOTH m1 and the carry
       strictly; facts join the surviving (tiny) price list by
       broadcast and keep rows with size == gmax. Equal-price
       equal-size duplicates are all on the frontier (neither
       dominates), matching the NOT-EXISTS semantics exactly.
    """
    p = (
        load(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        # unknown price/size can't participate in dominance (see oracle)
        .filter(F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull())
    )
    p = p.withColumn("bucket", F.floor(F.col("p_retailprice") / F.lit(100.0)))

    g = p.groupBy("bucket", "p_retailprice").agg(F.max("p_size").alias("gmax"))
    w_prev = (
        Window.partitionBy("bucket")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn("m1", F.max("gmax").over(w_prev))

    btot = g.groupBy("bucket").agg(F.max("gmax").alias("bmax"))
    w_carry = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    carry = btot.select("bucket", F.max("bmax").over(w_carry).alias("carry"))

    keep = (
        g.join(F.broadcast(carry), "bucket")
        .filter(
            (F.col("m1").isNull() | (F.col("gmax") > F.col("m1")))
            & (F.col("carry").isNull() | (F.col("gmax") > F.col("carry")))
        )
        .select("bucket", "p_retailprice", "gmax")
    )
    return (
        p.join(F.broadcast(keep), ["bucket", "p_retailprice"])
        .filter(F.col("p_size") == F.col("gmax"))
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", F.desc("p_size"), "p_partkey")
    )


@query(
    "join_geo_grid_radius",
    oracle="""
    WITH pts AS (
        SELECT s_suppkey AS s,
               20.0 + (s_suppkey * 37 % 100) / 100.0 AS lat,
               105.0 + (s_suppkey * 91 % 100) / 100.0 AS lon
        FROM supplier
    )
    SELECT * FROM (
        SELECT a.s AS s_a, b.s AS s_b,
               CAST(ROUND(
                 2 * 6371.0 * ASIN(SQRT(
                   POW(SIN(RADIANS(b.lat - a.lat) / 2), 2)
                   + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                     * POW(SIN(RADIANS(b.lon - a.lon) / 2), 2)
                 )), 0) AS BIGINT) AS km
        FROM pts a JOIN pts b ON a.s < b.s
    ) WHERE km <= 45
    """,
    tags=("join", "geo", "grid"),
)
def join_geo_grid_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All supplier pairs within 45 km (whole-km rounding), the
    spatial radius self-join. The oracle is the O(n^2) cross join;
    the Spark plan is the grid-bucketed candidate join:

    - coordinates are synthesized deterministically from s_suppkey
      into a 1 x 1 degree area (lat 20-21, lon 105-106 — the
      reference corpus's region, BASELINE.md), by pure integer
      modulo arithmetic shared with the oracle;
    - cell = integer 0.5-degree grid id ((k*37 % 200) div 50 —
      integer division, no float boundary risk);
    - candidates = equi-join on the 9-cell neighborhood (one explode
      of the 3x3 offsets on the left side, then a plain equi-join on
      the shifted cell id). Correctness of +-1: at |lat| <= 21 a
      45 km haversine distance implies dLat <= 0.41 deg and
      dLon <= 0.44 deg (1 deg lon >= 103.81 km at lat 21), both
      < 0.5 deg, so any qualifying pair is in same-or-adjacent
      cells; a given pair is produced exactly once because the right
      row's cell is covered by exactly one of the left row's nine
      offsets.
    - exact haversine verifies each candidate. Distance is rounded
      to whole km before output AND threshold (libm trig differs in
      the last ulp across engines; integer km is portable — same
      convention as scalar_geo_haversine_km).

    Scale: candidate volume is sum over cells of |cell| x |3x3
    neighborhood| — linear in points for bounded density, vs the
    cross join's quadratic blowup. The equi-join shuffles on the
    cell id; skewed (dense) cells are exactly the AQE skew-join
    case. At planet scale, cells become partition keys of the
    stored table and the neighborhood join is co-located.
    """
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("s"),
        (F.lit(20.0) + (F.col("s_suppkey") * 37 % 100) / 100.0).alias("lat"),
        (F.lit(105.0) + (F.col("s_suppkey") * 91 % 100) / 100.0).alias("lon"),
        F.expr("(s_suppkey * 37 % 100) div 50").alias("cy"),
        F.expr("(s_suppkey * 91 % 100) div 50").alias("cx"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    a = (
        s.withColumn("o", F.explode(offs))
        .select(
            F.col("s").alias("s_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            (F.col("cy") + F.col("o.dy")).alias("ncy"),
            (F.col("cx") + F.col("o.dx")).alias("ncx"),
        )
    )
    b = s.select(
        F.col("s").alias("s_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cy").alias("ncy"),
        F.col("cx").alias("ncx"),
    )
    cand = a.join(b, ["ncy", "ncx"]).filter(F.col("s_a") < F.col("s_b"))
    dlat = F.radians(F.col("lat_b") - F.col("lat_a")) / 2
    dlon = F.radians(F.col("lon_b") - F.col("lon_a")) / 2
    hav = F.pow(F.sin(dlat), 2) + F.cos(F.radians("lat_a")) * F.cos(
        F.radians("lat_b")
    ) * F.pow(F.sin(dlon), 2)
    km = F.round(2 * 6371.0 * F.asin(F.sqrt(hav)), 0).cast("long")
    return (
        cand.select("s_a", "s_b", km.alias("km"))
        .filter(F.col("km") <= 45)
        .orderBy("s_a", "s_b")
    )


@query(
    "join_interval_overlap_binned",
    oracle="""
    WITH v AS (
        SELECT ts AS vt FROM events WHERE event_type = 'view'
    ), p AS (
        SELECT event_id, ts AS pt FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id, COUNT(v.vt) AS n_active_views
    FROM p LEFT JOIN v
      ON v.vt <= p.pt AND p.pt < v.vt + INTERVAL '15 minutes'
    GROUP BY p.event_id
    """,
    tags=("join", "interval", "range"),
)
def join_interval_overlap_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big temporal overlap join with NO shared equi-key: for
    each purchase, how many 15-minute view-activity windows (any
    user) contain it. The naive form is a pure range join — a
    nested-loop/cartesian at scale, since neither side broadcasts
    and there is no key to hash on. The scale-correct rewrite is
    TIME-SLICE BINNING, the standard interval-join decomposition:

    - slice width == max interval length (15 min), so a view window
      [t, t+15m) overlaps at most TWO slices — each view emits
      exactly 2 candidate rows (slice k and k+1), a fixed 2x, never
      a data-dependent fan-out;
    - a purchase instant lives in exactly one slice, so every
      qualifying (view, purchase) pair meets in exactly one slice —
      candidates are produced once, no dedup pass;
    - the join becomes a plain EQUI join on the slice id with the
      exact interval predicate as a residual filter, and the LEFT
      join keeps zero-view purchases (count(vt) counts matches
      only).

    All arithmetic is integer epoch-micros (slice = t div 15min).
    Scale: candidate volume is sum over slices of |views_in_slice| x
    |purchases_in_slice| — density-bounded by the slice width, vs
    the nested-loop's |V| x |P|; a bursty slice is precisely the
    AQE skew-join case. This is the same binning that makes the
    stream-stream interval join's state bounded (watermark slices).
    """
    ev = load(spark, sf_dir, "events")
    S = 900_000_000  # 15 minutes of epoch micros
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(F.unix_micros("ts").alias("vt"))
        .withColumn("slice", F.explode(F.array(F.expr(f"vt div {S}"), F.expr(f"vt div {S} + 1"))))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), F.unix_micros("ts").alias("pt"))
        .withColumn("slice", F.expr(f"pt div {S}"))
    )
    joined = purchases.join(
        views,
        (purchases.slice == views.slice)
        & (F.col("vt") <= F.col("pt"))
        & (F.col("pt") < F.col("vt") + S),
        "left",
    )
    return (
        joined.groupBy("purchase_id")
        .agg(F.count("vt").alias("n_active_views"))
        .orderBy("purchase_id")
    )


@query(
    "sim_knn_quantized_int8",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS qv
        FROM embeddings WHERE vec_id < 5
    ), d AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS dv
        FROM embeddings
    )
    SELECT query_id, neighbor_id, qdot, rnk FROM (
        SELECT q.query_id, d.vec_id AS neighbor_id,
               CAST(list_dot_product(qv, dv) AS BIGINT) AS qdot,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY list_dot_product(qv, dv) DESC,
                                           d.vec_id) AS rnk
        FROM q JOIN d ON d.vec_id <> q.query_id
    ) WHERE rnk <= 5
    """,
    tags=("similarity", "quantization", "llm", "topk"),
)
def sim_knn_quantized_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors under int8-style fixed-point quantization —
    the vector-index compression step of a production ANN stack:
    q_i = floor(v_i * 256) stores each float32 component in one byte
    (range here: [-135, 118]), shrinking the index 4x and turning
    every similarity into EXACT integer arithmetic.

    Cross-engine exactness by construction: 256 is a power of two, so
    v * 256 is a pure exponent shift — lossless in float32 OR float64
    — and floor of an exact product is exact. Integer dot products
    (<= 64 * 135^2 ~ 1.2M) never overflow or round. The entire query
    is therefore bit-deterministic on both engines with NO rounding
    convention needed — unlike float cosine, where libm/fma ulps
    differ.

    Scale: quantization is a pure map (stays in the scan stage);
    the 5 query vectors broadcast; integer dot products are 4x
    denser per cache line than float and SIMD-friendly. The brute
    force here is the VERIFY stage shape — the same quantized
    vectors drop into the IVF cells (sim_ann_ivf_probe) or LSH bands
    (sim_ann_lsh_banded) for candidate generation at corpus scale.
    Quality loss is bounded: |q/256 - v| < 1/256 per component
    (recall vs float32 checked in tests/test_scale_ext.py)."""
    emb = load(spark, sf_dir, "embeddings")
    quant = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 256).cast("long")
        ).alias("qv"),
    )
    queries = quant.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("query_qv")
    )
    pairs = quant.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    )
    dot = F.aggregate(
        F.zip_with("query_qv", "qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), dot.alias("qdot")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .orderBy("query_id", "rnk")
    )


@query(
    "ivm_join_view_delta",
    oracle="""
    SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey % 10 = 9 OR c_custkey % 10 = 9
    """,
    tags=("ivm", "join", "incremental", "lakehouse"),
)
def ivm_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (IVM) of a join view: given the
    previous snapshot (A_old, B_old) and new deltas (dA, dB), the
    NEW rows of V = A JOIN B are computed WITHOUT recomputing the
    view, by the standard delta-join identity

        V_new - V_old  =  (dA JOIN B_new)  UNION ALL  (A_old JOIN dB)

    (disjoint by construction: a pair in both branches would need its
    A-row in dA and in A_old simultaneously). The testbed simulates
    the snapshot split deterministically: rows with key % 10 == 9 are
    'this batch's arrivals'; the oracle states the SEMANTICS directly
    — the full join filtered to pairs touching a delta row — so the
    identity itself is what gets verified.

    Scale: this is the continuous-aggregate / materialized-view
    refresh pattern for joins. Both deltas broadcast (a refresh
    batch is small by definition), so each branch is a map-side probe
    of one big table — refresh cost is O(|delta| + one scan of the
    probed side's matching partitions), never O(|A JOIN B|); with the
    lake bucketed on the join key (test_bucketed_join_eliminates_
    shuffle) the probe touches only the delta's buckets and the scan
    term drops away too. foreachBatch upserts these delta rows into
    the serving store (stream_incremental_rollup is the aggregate
    twin)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dA = o.filter(F.col("o_orderkey") % 10 == 9)
    a_old = o.filter(F.col("o_orderkey") % 10 != 9)
    dB = c.filter(F.col("c_custkey") % 10 == 9)

    new_from_a = dA.join(c, dA.o_custkey == c.c_custkey)  # dA x B_new
    new_from_b = a_old.join(F.broadcast(dB), a_old.o_custkey == dB.c_custkey)
    return (
        new_from_a.select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")
        .unionAll(
            new_from_b.select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")
        )
        .orderBy("o_orderkey", "c_custkey")
    )


@query(
    "agg_weighted_median_exact",
    oracle="""
    WITH f AS (
        SELECT l_returnflag AS flag,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS wt
        FROM lineitem
    ), g AS (
        SELECT flag, v, SUM(wt) AS w FROM f GROUP BY 1, 2
    ), c AS (
        SELECT flag, v,
               SUM(w) OVER (PARTITION BY flag ORDER BY v) AS cum,
               SUM(w) OVER (PARTITION BY flag) AS tot
        FROM g
    )
    SELECT flag AS l_returnflag, MIN(v) AS weighted_median_cents
    FROM c WHERE 2 * cum >= tot GROUP BY flag
    """,
    tags=("agg", "percentile", "weighted", "two-stage"),
)
def agg_weighted_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted median of line price (cents) weighted by
    quantity, per return flag — the weighted-quantile primitive
    (fairness metrics, cost-weighted SLO cutoffs) that Spark has no
    built-in for. Definition: the smallest v with
    2 * cumweight(<= v) >= totalweight, all integer arithmetic.

    The oracle is the direct one-window definition; with only 3
    return-flag groups that window would sort EVERYTHING inside 3
    partitions at 100 TB — the peak-concurrency scale-killer shape.
    The Spark plan is the TWO-STAGE BUCKETED form instead:

    1. per (flag, price-bucket) weight totals (bucket = cents div
       10000, i.e. $100 ranges) — the usual map-combined aggregate;
    2. a running total over the tiny (flags x buckets) table locates
       each flag's MEDIAN BUCKET and its carry-in cumweight
       (broadcast back);
    3. only rows IN the median bucket are re-aggregated per distinct
       value and swept with a bounded per-(flag, bucket) sort; the
       answer is min(v) where 2 * (carry + local cum) >= total.
       Collapsing to distinct v BEFORE the cumsum makes ties exact
       (no intra-tie ordering dependence), mirroring the oracle's
       GROUP BY flag, v.
    The full-fact sort never happens; stage 3 touches one bucket's
    rows per group."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("v"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("wt"),
    )
    BUCKET = 10_000  # $100 in cents
    li = li.withColumn("bucket", F.expr(f"v div {BUCKET}"))

    btot = li.groupBy("flag", "bucket").agg(F.sum("wt").alias("bw"))
    w_cum = Window.partitionBy("flag").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy("flag").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    marked = btot.select(
        "flag",
        "bucket",
        "bw",
        F.sum("bw").over(w_cum).alias("cum"),
        F.sum("bw").over(w_all).alias("tot"),
    )
    med_bucket = (
        marked.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            F.min(F.struct("bucket", "cum", "bw", "tot")).alias("m")
        )
        .select(
            F.col("flag").alias("mflag"),
            F.col("m.bucket").alias("mbucket"),
            (F.col("m.cum") - F.col("m.bw")).alias("carry"),
            F.col("m.tot").alias("tot"),
        )
    )
    in_bucket = li.join(
        F.broadcast(med_bucket),
        (F.col("flag") == F.col("mflag")) & (F.col("bucket") == F.col("mbucket")),
    ).select("flag", "v", "wt", "carry", "tot")
    per_v = in_bucket.groupBy("flag", "carry", "tot", "v").agg(
        F.sum("wt").alias("w")
    )
    w_local = Window.partitionBy("flag").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    swept = per_v.withColumn("lcum", F.sum("w").over(w_local))
    return (
        swept.filter(2 * (F.col("carry") + F.col("lcum")) >= F.col("tot"))
        .groupBy(F.col("flag").alias("l_returnflag"))
        .agg(F.min("v").alias("weighted_median_cents"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_gini_spend_concentration",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment AS segment, c.c_custkey AS ck,
               CAST(ROUND(SUM(o.o_totalprice) * 100, 0) AS BIGINT) AS cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT segment, cents,
               ROW_NUMBER() OVER (PARTITION BY segment
                                  ORDER BY cents, ck) AS rnk
        FROM spend
    ), agg AS (
        SELECT segment,
               COUNT(*) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(SUM(rnk * cents) AS BIGINT) AS s_rank_weighted
        FROM ranked GROUP BY segment
    )
    SELECT segment, n_customers, total_cents,
           CAST(2 * s_rank_weighted - (n_customers + 1) * total_cents AS DOUBLE)
             / (CAST(n_customers AS DOUBLE) * CAST(total_cents AS DOUBLE)) AS gini
    FROM agg
    """,
    tags=("agg", "gini", "concentration", "two-stage"),
)
def agg_gini_spend_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per market segment — the
    revenue-concentration metric ('do 1% of customers carry the
    segment?'). Rank formula: G = (2 * sum(rank_i * x_i)
    - (n + 1) * sum(x)) / (n * sum(x)) over spend sorted ascending
    with a custkey tiebreak (ties must have deterministic ranks or
    the numerator is engine-dependent).

    Exactness: spend in integer cents; rank * cents products and
    their sums stay in BIGINT at test scale (decimal(38,0) is the
    drop-in at 10^8+ customers); the single final division casts two
    identical exact integers to double on both engines.

    Scale: the oracle ranks with one window per segment — a
    5-partition full sort of all customers at 100 TB. The Spark plan
    is the TWO-STAGE RANK instead (the weighted-median recipe):
    per-(segment, spend-bucket) counts locate each bucket's rank
    offset via a running count over the tiny bucket table (broadcast
    back), and row_number runs only WITHIN each (segment, bucket) —
    global rank = bucket carry + local rank, bounded sorts only."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("c_custkey").alias("ck"))
        .agg(F.round(F.sum("o_totalprice") * 100, 0).cast("long").alias("cents"))
    )
    BUCKET = 100_000  # $1000 spend bands
    spend = spend.withColumn("bucket", F.expr(f"cents div {BUCKET}"))

    bcount = spend.groupBy("segment", "bucket").agg(F.count("*").alias("bn"))
    w_prev = Window.partitionBy("segment").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = bcount.select(
        F.col("segment").alias("cseg"),
        F.col("bucket").alias("cbucket"),
        F.coalesce(F.sum("bn").over(w_prev), F.lit(0)).alias("carry"),
    )
    w_local = Window.partitionBy("segment", "bucket").orderBy("cents", "ck")
    ranked = (
        spend.join(
            F.broadcast(carry),
            (F.col("segment") == F.col("cseg")) & (F.col("bucket") == F.col("cbucket")),
        )
        .withColumn("rnk", F.col("carry") + F.row_number().over(w_local))
    )
    agg = ranked.groupBy("segment").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("rnk") * F.col("cents")).alias("s"),
    )
    gini = (
        (2 * F.col("s") - (F.col("n_customers") + 1) * F.col("total_cents")).cast("double")
        / (F.col("n_customers").cast("double") * F.col("total_cents").cast("double"))
    )
    return agg.select(
        "segment", "n_customers", "total_cents", gini.alias("gini")
    ).orderBy("segment")


@query(
    "agg_hhi_market_concentration",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment AS segment, c.c_custkey AS ck,
               CAST(ROUND(SUM(o.o_totalprice) * 100, 0) AS BIGINT) AS cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    )
    SELECT segment,
           COUNT(*) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0)) AS DOUBLE)
             / (CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE)) AS hhi
    FROM spend GROUP BY segment
    """,
    tags=("agg", "hhi", "concentration"),
)
def agg_hhi_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of customer spend per segment —
    sum of squared revenue shares, the antitrust-style concentration
    measure that complements the Gini (HHI weights the head, Gini
    the whole curve). HHI = sum(x_i^2) / (sum x)^2 needs NO ranks at
    all: one aggregate, no sort, no window — the cheapest member of
    the concentration family and the one to reach for first at
    100 TB.

    Exactness: cents^2 reaches ~1e19 at test scale and far beyond
    2^63 at cluster scale, so the squared sum rides DECIMAL(38,0)
    (exact, associative); sum(cents) stays BIGINT. Each final cast
    converts one exact integer to double (single rounding, identical
    both engines) and the division is one IEEE op."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "c_custkey")
        .agg(F.round(F.sum("o_totalprice") * 100, 0).cast("long").alias("cents"))
    )
    agg = spend.groupBy("segment").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).cast("decimal(38,0)").alias("s2"),
    )
    hhi = F.col("s2").cast("double") / (
        F.col("total_cents").cast("double") * F.col("total_cents").cast("double")
    )
    return agg.select(
        "segment", "n_customers", "total_cents", hhi.alias("hhi")
    ).orderBy("segment")


@query(
    "events_users_for_p80",
    oracle="""
    WITH ucount AS (
        SELECT event_type, user_id, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT event_type, n,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, user_id) AS rnk,
               SUM(n) OVER (PARTITION BY event_type
                            ORDER BY n DESC, user_id
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(n) OVER (PARTITION BY event_type) AS tot,
               COUNT(*) OVER (PARTITION BY event_type) AS n_users
        FROM ucount
    )
    SELECT event_type, n_users,
           MIN(rnk) AS k_users_p80,
           CAST(MIN(rnk) AS DOUBLE) / n_users AS share_users_p80
    FROM ranked WHERE 5 * cum >= 4 * tot
    GROUP BY event_type, n_users
    """,
    tags=("events", "concentration", "pareto", "two-stage"),
)
def events_users_for_p80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 question, exactly: the minimum number of top users
    whose combined activity covers 80% of each event type's traffic
    (and that count as a share of the audience) — the 'how many
    whales' metric behind capacity planning and abuse thresholds,
    the quantile cousin of Gini/HHI.

    The oracle ranks with one window per type (a |types|-partition
    full sort at 100 TB). The Spark plan exploits that rank position
    is CLOSED-FORM within an activity level: bucket users by their
    exact count n; for the users at level n, rank = (users at higher
    levels) + row_number within the level, and cumulative activity =
    (events at higher levels) + rank-within-level * n — so the only
    windows run over the tiny per-(type, level) table (carry sums)
    and within levels (bounded row_number by user id). All integer;
    the final share is one double division."""
    ev = load(spark, sf_dir, "events")
    uc = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))

    lvl = uc.groupBy("event_type", "n").agg(
        F.count("*").alias("cnt"), F.sum("n").alias("lvl_ev")
    )
    w_hi = Window.partitionBy("event_type").orderBy(F.desc("n")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    carry = lvl.select(
        F.col("event_type").alias("ct"),
        F.col("n").alias("cn"),
        F.coalesce(F.sum("cnt").over(w_hi), F.lit(0)).alias("carry_users"),
        F.coalesce(F.sum("lvl_ev").over(w_hi), F.lit(0)).alias("carry_ev"),
        F.sum("lvl_ev").over(w_all).alias("tot"),
        F.sum("cnt").over(w_all).alias("n_users"),
    )
    w_in = Window.partitionBy("event_type", "n").orderBy("user_id")
    ranked = (
        uc.join(
            F.broadcast(carry),
            (F.col("event_type") == F.col("ct")) & (F.col("n") == F.col("cn")),
        )
        .withColumn("rn", F.row_number().over(w_in))
        .withColumn("rnk", F.col("carry_users") + F.col("rn"))
        .withColumn("cum", F.col("carry_ev") + F.col("rn") * F.col("n"))
    )
    return (
        ranked.filter(5 * F.col("cum") >= 4 * F.col("tot"))
        .groupBy("event_type", "n_users")
        .agg(F.min("rnk").alias("k_users_p80"))
        .select(
            "event_type",
            "n_users",
            "k_users_p80",
            (F.col("k_users_p80").cast("double") / F.col("n_users")).alias(
                "share_users_p80"
            ),
        )
        .orderBy("event_type")
    )
