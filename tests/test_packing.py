"""FFD sequence packing (operators/packing.py) validity + economics.

The oracle gate proves pack ids value-for-value against the
recursive-CTE replay; these pin the bin-packing INVARIANTS and the
reason the operator exists:

- validity: every (block, pack) window's token load fits the
  capacity (a window may exceed it only by holding a single
  oversize document), every document lands in exactly one window;
- economics: FFD uses <= next-fit windows on EVERY block, and
  strictly fewer in aggregate on the testbed — the audit row the
  operator ships must actually show the win it claims.
"""

from __future__ import annotations

from bigdata_project_spark.operators.corpus import _CTX_TOKENS
from bigdata_project_spark.operators.packing import _FFD_BLOCK


def test_pack_validity(spark, sf_dir):
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["pack_sequences_ffd"](spark, sf_dir).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows)  # one window per doc
    loads: dict = {}
    counts: dict = {}
    for r in rows:
        key = (r["source"], r["block_id"], r["pack_id"])
        loads[key] = loads.get(key, 0) + r["n_tokens"]
        counts[key] = counts.get(key, 0) + 1
        bkey = (r["source"], r["block_id"])
    for key, load in loads.items():
        assert load <= _CTX_TOKENS or counts[key] == 1, (key, load, counts[key])
    # block boundedness
    per_block: dict = {}
    for r in rows:
        b = (r["source"], r["block_id"])
        per_block[b] = per_block.get(b, 0) + 1
    assert all(n <= _FFD_BLOCK for n in per_block.values())


def test_ffd_beats_or_ties_nextfit_everywhere(spark, sf_dir):
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["pack_ffd_waste_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["ffd_packs"] <= r["nextfit_packs"], dict(r.asDict())
        assert r["ffd_pad_tokens"] <= r["nextfit_pad_tokens"]
    total_ffd = sum(r["ffd_packs"] for r in rows)
    total_nf = sum(r["nextfit_packs"] for r in rows)
    assert total_ffd < total_nf, (total_ffd, total_nf)  # the win is real, not vacuous


def test_global_ids_are_a_bijection_onto_blocks(spark, sf_dir):
    """pack_ffd_global_ids must renumber (source, block, pack) tuples
    into one contiguous 0..N-1 global id space, preserving each
    block's local structure."""
    from bigdata_project_spark.registry import all_queries

    rows = all_queries()["pack_ffd_global_ids"](spark, sf_dir).collect()
    pairs = {(r["source"], r["block_id"], r["pack_id"]): r["global_pack_id"] for r in rows}
    gids = sorted(set(pairs.values()))
    assert gids == list(range(len(gids)))  # contiguous, no gaps
    assert len(gids) == len(pairs)  # one global id per (block, pack)
    # order-preserving within a block
    for (s, b, p), g in pairs.items():
        if (s, b, p + 1) in pairs:
            assert pairs[(s, b, p + 1)] == g + 1
