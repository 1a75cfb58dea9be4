"""Property-based invariants for the time-series diagnostics
(queries/timeseries_ext.py) on generated event tables — tie-heavy
inputs the fixed testdata can't produce (equal |CUSUM| peaks, constant
series, single-day series).
"""

from __future__ import annotations

import datetime
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# default 6 keeps the suite fast; set TS_PROP_MAX_EXAMPLES=200 for a
# deep one-off soak (the r7 flake was only drawn at higher counts)
_settings = settings(
    max_examples=int(os.environ.get("TS_PROP_MAX_EXAMPLES", "6")),
    deadline=None,
    suppress_health_check=list(HealthCheck),
)

# per event type: a short list of small daily counts (zeros allowed =
# missing days, constants allowed = all-|CUSUM| ties)
_series = st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=10)
_tables = st.dictionaries(
    st.sampled_from(["view", "click"]), _series, min_size=1, max_size=2
)


def _write_events(spark, tmpdir, tables):
    rows = []
    eid = 0
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    for etype, counts in tables.items():
        for day_i, n in enumerate(counts):
            for k in range(n):
                rows.append(
                    (
                        eid,
                        base + datetime.timedelta(days=day_i, seconds=k),
                        eid % 3,
                        etype,
                        1.0,
                        "{}",
                    )
                )
                eid += 1
    if not rows:  # all-zero series: keep one event so the table exists
        rows.append((0, base, 0, next(iter(tables)), 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")
    return tmpdir


@given(tables=_tables)
@_settings
def test_cusum_matches_python_bruteforce(spark, tmp_path_factory, tables):
    """The scaled-integer CUSUM argmax (D*prefix_k - k*T, ties to the
    earliest day) must equal a direct Python evaluation on any series
    — including constant series (all CUSUM values tie at 0) and
    single-day series."""
    from bigdata_project_spark.registry import all_queries

    d = _write_events(spark, str(tmp_path_factory.mktemp("cusum")), tables)
    got = {
        r["event_type"]: (r["cp_day"], r["n_days"], r["total_events"], r["abs_cusum_scaled"])
        for r in all_queries()["events_changepoint_cusum"](spark, d).collect()
    }
    base = datetime.date(2024, 3, 1)
    want = {}
    for etype, counts in tables.items():
        days = [(base + datetime.timedelta(days=i), n) for i, n in enumerate(counts) if n > 0]
        # the writer adds its placeholder event only when NO rows at
        # all were written (every series all-zero) — mirror that
        # exactly, not "this series is empty" (r7 verdict: a draw like
        # {'view': [0], 'click': [1]} must NOT invent a 'view' row)
        if (
            not days
            and etype == next(iter(tables))
            and all(sum(c) == 0 for c in tables.values())
        ):
            days = [(base, 1)]  # the placeholder event
        if not days:
            continue
        D = len(days)
        T = sum(n for _, n in days)
        best = None
        prefix = 0
        for k, (day, n) in enumerate(days, start=1):
            prefix += n
            s = abs(D * prefix - k * T)
            if best is None or s > best[1]:
                best = (day, s)
        want[etype] = (best[0].isoformat(), D, T, best[1])
    assert got == want


def test_ab_test_zflag_single_variant_still_one_row(spark, tmp_path_factory):
    """Degenerate experiment input: every user hashes to variant B
    (all user_ids odd), so variant A is EMPTY. The readout must still
    emit exactly one row — and the same row the DuckDB oracle emits.
    The earlier two-filtered-frames + cross-join formulation returned
    0 rows here while the oracle returned one row of NULL-rate stats;
    the conditional-aggregation form keeps both engines at one row on
    every input."""
    import duckdb

    from bigdata_project_spark.registry import REGISTRY, _ensure_loaded
    from tests.oracle import compare

    _ensure_loaded()
    d = str(tmp_path_factory.mktemp("abtest"))
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 2 * i + 1,
         "purchase" if i % 3 == 0 else "view", 1.0, "{}")
        for i in range(12)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    spec = REGISTRY["events_ab_test_zflag"]
    df = spec.fn(spark, d)
    got = df.collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_users_a"], r["n_conv_a"]) == (0, 0)
    assert r["n_users_b"] == 12
    # pooled variance includes an empty variant -> z undefined -> NOT significant
    assert r["significant_95"] == 0

    con = duckdb.connect()
    # Spark writes a directory of part files; glob them for DuckDB
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
    res = compare("events_ab_test_zflag_degenerate", df, con, spec.oracle)
    con.close()
    assert res.ok, res.detail
