"""URL canonicalization rules (operators/urlcanon.py).

The oracle gate proves the registered query's canonical strings
value-for-value; these pin each rule in isolation on hand-written
URLs the synthesis doesn't generate — non-default ports survive,
tracking-only queries collapse to no '?', IDN hosts case-fold, and
canonicalization is idempotent (canon(canon(u)) == canon(u))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_project_spark.operators.urlcanon import canonicalize_url

CASES = [
    # (raw, canonical)
    ("https://Example.COM/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("HTTPS://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),  # non-default kept
    ("http://example.com:443/a", "http://example.com:443/a"),  # 443 not http's default
    ("https://example.com/a?utm_source=x&utm_medium=y", "https://example.com/a"),
    ("https://example.com/a?b=1&fbclid=Z&gclid=Q", "https://example.com/a?b=1"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?", "https://example.com/a"),  # empty query
    ("https://example.com/a?b=1&&c=2", "https://example.com/a?b=1&c=2"),  # empty param
    ("https://GÄTEWAY.example.com/a", "https://gäteway.example.com/a"),  # IDN fold
    ("https://example.com/A/B?x=1#f", "https://example.com/A/B?x=1"),  # path case kept
]


def _canon_all(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]


def test_rules(spark):
    got = _canon_all(spark, [raw for raw, _ in CASES])
    for (raw, want), g in zip(CASES, got):
        assert g == want, (raw, g, want)


def test_idempotent(spark):
    once = _canon_all(spark, [raw for raw, _ in CASES])
    twice = _canon_all(spark, once)
    assert once == twice


@pytest.mark.parametrize("name", ["crawl_url_canonical_dedup"])
def test_first_seen_keeper_is_min(spark, sf_dir, name):
    """Every group's keeper is its minimum doc_id and is the one
    non-dup row of the group."""
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()[name](spark, sf_dir).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["canonical"], []).append(r)
    for canon, members in groups.items():
        lo = min(m["doc_id"] for m in members)
        for m in members:
            assert m["keeper_doc"] == lo, canon
            assert m["is_dup"] == (0 if m["doc_id"] == lo else 1), canon


def test_politeness_host_affinity_and_slots(spark, sf_dir):
    """Politeness invariants: every host maps to exactly one worker,
    per-host slots are contiguous from 0 in doc_id order, and
    scheduled_ms == slot * the host's crawl delay."""
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["crawl_politeness_schedule"](spark, sf_dir).collect()
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host) >= 2  # ascii + IDN hosts at least
    for host, members in by_host.items():
        assert len({m["worker"] for m in members}) == 1, host
        assert len({m["delay_ms"] for m in members}) == 1, host
        members.sort(key=lambda m: m["doc_id"])
        for i, m in enumerate(members):
            assert m["slot"] == i, (host, i, m["slot"])
            assert m["scheduled_ms"] == i * m["delay_ms"]
        assert members[0]["delay_ms"] in (500, 750, 1000)


def test_frontier_stream_state_carry(spark, sf_dir):
    """The streaming form must resolve cross-batch duplicates through
    the persisted seen store: the fragment-only canonical (one key
    shared by every 5th doc corpus-wide) appears in every micro-batch,
    so docs in batches 2 and 3 can only learn keeper_doc=4 from state
    written by batch 1."""
    from bigdata_project_spark.operators.urlcanon import run_frontier_stream

    res, n_batches = run_frontier_stream(spark, sf_dir, n_chunks=3)
    assert n_batches == 3
    rows = res.collect()
    # fragment-form docs, minus the IDN subset (doc_id % 97 == 0 owns
    # its own host and therefore its own canonical key)
    frag = [
        r for r in rows if "?" not in r["canonical"] and r["doc_id"] % 97 != 0
    ]
    assert len(frag) == len(
        [r for r in rows if r["doc_id"] % 5 == 4 and r["doc_id"] % 97 != 0]
    )
    keeper = min(r["doc_id"] for r in frag)
    late = [r for r in frag if r["doc_id"] > max(r2["doc_id"] for r2 in rows) // 3]
    assert late, "no fragment-form docs beyond the first micro-batch"
    for r in frag:
        assert r["keeper_doc"] == keeper
        assert r["is_dup"] == (0 if r["doc_id"] == keeper else 1)


def test_robots_longest_match_semantics(spark, sf_dir):
    """Pin the resolution order on hand-checkable cases: nested Allow
    under Disallow, nested Disallow under Allow, and the '/'
    catch-all — plus a full re-derivation of every verdict from the
    rule table."""
    from bigdata_project_spark.operators.urlcanon import _ROBOTS_RULES
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["crawl_robots_gate"](spark, sf_dir).collect()
    rules: dict = {}
    for h, p, a in _ROBOTS_RULES:
        rules.setdefault(h, []).append((p, a))
    for r in rows:
        cands = [(p, a) for p, a in rules[r["host"]] if r["path"].startswith(p)]
        # longest wins; Allow wins a length tie
        best = max(cands, key=lambda pa: (len(pa[0]), pa[1]))
        assert r["matched_rule"] == best[0], dict(r.asDict())
        assert r["allowed"] == best[1]
    # the interesting nestings actually occur on the testbed
    seen = {(r["matched_rule"], r["allowed"]) for r in rows}
    assert ("/ads/private", 0) in seen  # Disallow nested under Allow
    assert ("/api/public", 1) in seen  # Allow nested under Disallow
    assert ("/", 1) in seen  # catch-all
