"""Perceptual dHash image near-dup (multimodal_dhash_neardup).

The oracle gate proves the full pipeline (PNG encode -> CRC'd parse
-> unfilter -> box-sum dHash -> pigeonhole block join -> exact
Hamming) bit-exactly against the integer SQL replay; these pin the
properties the hash can't see:

- the 1-pixel perturbation moves AT MOST two dHash bits (one grid
  cell feeds exactly two horizontal compares), so every
  (base, variant) pair is within the declared radius by construction
  — the recall-1.0 claim of pigeonhole blocking is exercised on
  pairs that genuinely differ, not only hash-equal ones;
- the operator's pair set EQUALS a brute-force all-pairs Hamming scan
  over the same signatures (exactness of the blocking, not just
  recall on planted pairs);
- cross-group signatures are far apart (md5 pixels are i.i.d. across
  groups), so the planted within-group structure is exactly what the
  radius recovers on the testbed.
"""

from __future__ import annotations

import numpy as np

from bigdata_project_spark.operators.multimodal import (
    _dhash64,
    _dhash_pixels,
    _DHASH_GROUP,
    _encode_png,
    _parse_png,
)


def _bits(sig_hex: str) -> np.ndarray:
    return np.array(
        [(int(c, 16) >> k) & 1 for c in sig_hex for k in (3, 2, 1, 0)], dtype=np.int64
    )


def _hamming(a: str, b: str) -> int:
    return int((_bits(a) != _bits(b)).sum())


def test_variant_within_two_bits_of_base():
    """One perturbed pixel lands in one 2x2 grid cell, which feeds at
    most two horizontal neighbor compares — so every variant is
    Hamming <= 2 from its group's base image, for any group."""
    for g in range(40):
        base = _dhash64(_dhash_pixels(g * _DHASH_GROUP))
        for v in range(1, _DHASH_GROUP):
            sig = _dhash64(_dhash_pixels(g * _DHASH_GROUP + v))
            assert _hamming(base, sig) <= 2


def test_cross_group_signatures_far_apart():
    """md5-derived pixels are independent across groups: unrelated
    images sit a near-Binomial(64, 1/2) Hamming distance apart —
    far outside the radius-3 ball. Pin a conservative floor."""
    sigs = [_dhash64(_dhash_pixels(g * _DHASH_GROUP)) for g in range(60)]
    dists = [
        _hamming(sigs[i], sigs[j])
        for i in range(len(sigs))
        for j in range(i + 1, len(sigs))
    ]
    assert min(dists) > 3


def test_png_roundtrip_preserves_dhash_pixels():
    """The signature must be computed from pixels RECOVERED from the
    PNG container, so the codec path is load-bearing: encode then
    parse must reproduce the generator's array exactly."""
    for did in (0, 1, 7, 123, 999):
        arr = _dhash_pixels(did)
        w, h, back = _parse_png(_encode_png(arr))
        assert (w, h) == (arr.shape[1], arr.shape[0])
        assert np.array_equal(arr, back)


def test_operator_equals_bruteforce_hamming(spark, sf_dir):
    """Exactness of pigeonhole blocking: the registered operator's
    pair set equals an all-pairs Hamming scan over the same
    signatures (radius 3) — nothing missed by blocking, nothing
    extra admitted by the verify step."""
    from bigdata_project_spark.registry import all_queries

    df = all_queries()["multimodal_dhash_neardup"](spark, sf_dir)
    got = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in df.collect()}

    n_docs = 500  # sf0.01 testbed
    sigs = {i: _dhash64(_dhash_pixels(i)) for i in range(n_docs)}
    want = set()
    bit_cache = {i: _bits(s) for i, s in sigs.items()}
    arr = np.stack([bit_cache[i] for i in range(n_docs)])
    for i in range(n_docs):
        d = (arr[i + 1 :] != arr[i]).sum(axis=1)
        for off in np.nonzero(d <= 3)[0]:
            want.add((i, i + 1 + int(off), int(d[off])))
    assert got == want


def test_keeper_verdict_consistent_with_pairs(spark, sf_dir):
    """The keeper query must be exactly the transitive closure of the
    pair query: every pair's two docs share a component, every
    component's keeper is its min member, component_reach counts
    members, and docs in no pair are singletons."""
    from bigdata_project_spark.registry import all_queries

    qs = all_queries()
    pairs = [(r["doc_a"], r["doc_b"]) for r in qs["multimodal_dhash_neardup"](spark, sf_dir).collect()]
    rows = qs["multimodal_dhash_dedup_keeper"](spark, sf_dir).collect()
    comp = {r["doc_id"]: r["component"] for r in rows}
    reach = {r["doc_id"]: r["component_reach"] for r in rows}
    # union-find ground truth from the pairs
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_members: dict = {}
    for d in comp:
        root = find(d) if d in parent else d
        want_members.setdefault(root, set()).add(d)
    # min-relabel roots
    for root, members in want_members.items():
        m = min(members)
        for d in members:
            assert comp[d] == m, (d, comp[d], m)
            assert reach[d] == len(members)
    for r in rows:
        assert r["is_dup"] == (0 if r["doc_id"] == r["component"] else 1)
