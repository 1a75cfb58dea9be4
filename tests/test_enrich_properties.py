"""Independent pure-Python reimplementations of the trickiest round-5
semantics, cross-checked against the registered Spark plans — a third
voice besides the DuckDB oracle, so a shared misreading of the spec in
both SQL dialects cannot slip through.
"""

from __future__ import annotations

import duckdb

from bigdata_project_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

_DAY_US = 86_400_000_000


def _events(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, epoch_us(ts), user_id, event_id, value "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_peak_concurrency_matches_bruteforce_sweep(spark, sf_dir):
    # brute force: materialize every (t, delta) point, sort globally by
    # (t, delta) per type, walk the prefix sum — no slicing, no Spark,
    # no SQL. The registered two-stage sliced plan must agree exactly.
    rows = _events(sf_dir)
    by_type: dict[str, list[tuple[int, int]]] = {}
    for et, t_us, *_ in rows:
        by_type.setdefault(et, []).append((t_us, 1))
        by_type.setdefault(et, []).append((t_us + 900_000_000, -1))
    expected = {}
    for et, pts in by_type.items():
        pts.sort()  # (t, delta): -1 before +1 at equal instants
        run, best, best_t = 0, None, None
        for t, d in pts:
            run += d
            if best is None or run > best:
                best, best_t = run, t
        expected[et] = (best, best_t)

    got = {
        r["event_type"]: (r["peak_concurrency"], r["peak_at_us"])
        for r in REGISTRY["events_peak_concurrency"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_attribution_matches_bruteforce_scan(spark, sf_dir):
    # brute force: for each purchase, linearly scan that user's clicks
    # for the max (t, event_id) click at-or-before within 7 days.
    rows = _events(sf_dir)
    clicks: dict[int, list[tuple[int, int]]] = {}
    for et, t_us, uid, eid, _ in rows:
        if et == "click":
            clicks.setdefault(uid, []).append((t_us, eid))
    expected = {}
    for et, t_us, uid, eid, _ in rows:
        if et != "purchase":
            continue
        cand = [
            (ct, cid)
            for ct, cid in clicks.get(uid, [])
            if ct <= t_us and ct >= t_us - 7 * _DAY_US
        ]
        expected[eid] = max(cand)[1] if cand else None

    got = {
        r["event_id"]: r["attributed_click_id"]
        for r in REGISTRY["events_attribution_last_touch"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_sliding_distinct_matches_bruteforce_sets(spark, sf_dir):
    rows = _events(sf_dir)
    user_days = {(uid, t_us // _DAY_US) for _, t_us, uid, *_ in rows}
    days = {d for _, d in user_days}
    expected = {
        d: len({u for u, ud in user_days if d - 6 <= ud <= d}) for d in days
    }
    got = {
        r["day"]: r["users_7d"]
        for r in REGISTRY["events_sliding_distinct_users"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_pareto_frontier_matches_bruteforce_dominance(spark, sf_dir):
    # brute force: literal O(n^2) dominance scan over (price, size) —
    # no buckets, no windows. The registered bucketed sweep must agree.
    con = duckdb.connect()
    pts = con.execute(
        f"SELECT p_partkey, p_retailprice, p_size "
        f"FROM read_parquet('{sf_dir}/part.parquet')"
    ).fetchall()
    con.close()
    expected = set()
    for pk, price, size in pts:
        dominated = any(
            qprice <= price and qsize >= size and (qprice < price or qsize > size)
            for _, qprice, qsize in pts
        )
        if not dominated:
            expected.add((pk, price, size))

    got = {
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in REGISTRY["sort_pareto_frontier"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_interval_overlap_matches_bruteforce_scan(spark, sf_dir):
    # brute force: for each purchase instant, count views in the
    # trailing 15 minutes by linear scan — no slices, no join.
    rows = _events(sf_dir)
    view_ts = sorted(t for et, t, *_ in rows if et == "view")
    import bisect

    expected = {}
    for et, t, _, eid, _ in rows:
        if et != "purchase":
            continue
        # views with vt <= t < vt + 15m  <=>  vt in (t - 15m, t]
        lo = bisect.bisect_right(view_ts, t - 900_000_000)
        hi = bisect.bisect_right(view_ts, t)
        expected[eid] = hi - lo

    got = {
        r["purchase_id"]: r["n_active_views"]
        for r in REGISTRY["join_interval_overlap_binned"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_heavy_hitters_matches_bruteforce_count(spark, sf_dir):
    # brute force: a python Counter over the whole token stream — no
    # sketch, no candidates. The MG-then-verify plan must agree.
    from collections import Counter

    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    counts: Counter = Counter()
    for (text,) in texts:
        counts.update(text.split(" "))
    n = sum(counts.values())
    expected = {tok: c for tok, c in counts.items() if c * 40 > n}

    got = {
        r["tok"]: r["n_tok"]
        for r in REGISTRY["agg_heavy_hitters_exact"].fn(spark, sf_dir).collect()
    }
    assert got == expected
