"""SCALE.md's wall-time slope table must cover the full headline set.

The table is measurement output (regenerate with
`python tools/scaling_probe.py --walltime` and paste); this hygiene
gate catches the drift mode where a query is added to bench.HEADLINE
but its scaling behavior is never measured — the exact blind spot the
r7 verdict flagged (a plan audit cannot see a quadratic candidate
class; only the slope table can).
"""

from __future__ import annotations

import pathlib
import re


def test_slope_table_covers_every_headline_query():
    import bench

    scale_md = (pathlib.Path(__file__).resolve().parent.parent / "SCALE.md").read_text()
    m = re.search(
        r"## Measured wall-time slopes.*?\n(\|.*?)(?:\n\n|\n#|\Z)", scale_md, re.DOTALL
    )
    assert m, "wall-time slope section missing from SCALE.md"
    table = m.group(1)
    table_queries = {
        line.split("|")[1].strip()
        for line in table.splitlines()
        if line.startswith("|") and not line.startswith("|---") and not line.startswith("| query")
    }
    missing = set(bench.HEADLINE) - table_queries
    stale = table_queries - set(bench.HEADLINE)
    assert not missing, (
        f"headline queries missing from SCALE.md slope table (re-run "
        f"tools/scaling_probe.py --walltime and refresh): {sorted(missing)}"
    )
    assert not stale, f"slope-table rows no longer in bench.HEADLINE: {sorted(stale)}"
