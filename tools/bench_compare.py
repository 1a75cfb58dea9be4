#!/usr/bin/env python
"""Diff two bench JSON lines (BENCH_r{N}.json files or raw bench.py
output) per query:

    python tools/bench_compare.py BENCH_r02.json BENCH_r03.json [--sf 0.1]

Prints per-query deltas for the common set, totals for common and
full sets, and names queries present in only one side — so a new
headline entry is never mistaken for a regression of the total.
"""

from __future__ import annotations

import json
import sys


def load(path: str, sf: float | None):
    text = open(path).read()
    try:  # driver BENCH_r{N}.json: one wrapper object with "parsed"
        doc = json.loads(text)
        if isinstance(doc, dict) and "parsed" in doc:
            lines = doc["parsed"] if isinstance(doc["parsed"], list) else [doc["parsed"]]
        else:
            lines = [doc]
    except json.JSONDecodeError:  # raw bench.py output: one JSON per line
        lines = [json.loads(ln) for ln in text.splitlines() if ln.strip().startswith("{")]
    if sf is not None:
        lines = [ln for ln in lines if ln.get("sf") == sf]
    return lines[-1]  # primary line is printed last


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = None
    if "--sf" in sys.argv:
        sf = float(sys.argv[sys.argv.index("--sf") + 1])
    old, new = load(args[0], sf), load(args[1], sf)
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn), key=lambda q: qo[q] - qn[q])
    print(f"{'query':42s} {'old':>7s} {'new':>7s} {'delta':>8s}")
    for q in common:
        print(f"{q:42s} {qo[q]:7.2f} {qn[q]:7.2f} {qn[q] - qo[q]:+8.2f}")
    co, cn = sum(qo[q] for q in common), sum(qn[q] for q in common)
    print(f"\ncommon set ({len(common)}): {co:.2f}s -> {cn:.2f}s ({(cn - co) / co * 100:+.1f}%)")
    print(f"full totals: old {old['value']:.2f}s ({len(qo)} queries), new {new['value']:.2f}s ({len(qn)})")
    for label, only in (("only-old", set(qo) - set(qn)), ("only-new", set(qn) - set(qo))):
        if only:
            print(f"{label}: {', '.join(sorted(only))}")


if __name__ == "__main__":
    main()
