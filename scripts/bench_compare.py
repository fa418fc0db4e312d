"""Diff two bench JSON outputs: regressions, improvements, new/missing.

Usage: python scripts/bench_compare.py OLD.json NEW.json [ratio=1.3] [abs=0.3]

Accepts either bench.py's raw line ({"metric": ..., "queries": {...}}) or
the driver's BENCH_r{N}.json wrapper ({"parsed": {...}}).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        parsed = d["parsed"]
        if parsed is None:
            # driver wrapper with a truncated tail (no parseable record):
            # salvage per-query timings from the tail fragment
            import re

            qs = {
                k: float(v)
                for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', d.get("tail", ""))
                if k not in ("value", "sf", "n_queries")  # record scalars, not queries
            }
            if not qs:
                raise SystemExit(f"{path}: no parseable bench record")
            return {"queries": qs, "value": float("nan")}
        d = parsed
    return d


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    min_abs = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    oq, nq = old["queries"], new["queries"]

    def ok(v: float) -> bool:
        return v == v  # not NaN

    reg = [
        (k, oq[k], nq[k])
        for k in oq
        if k in nq and ok(oq[k]) and ok(nq[k])
        and nq[k] > ratio * oq[k] and nq[k] - oq[k] > min_abs
    ]
    imp = [
        (k, oq[k], nq[k])
        for k in oq
        if k in nq and ok(oq[k]) and ok(nq[k])
        and oq[k] > ratio * nq[k] and oq[k] - nq[k] > min_abs
    ]
    print(f"total: {old.get('value')} ({len(oq)} q) -> {new.get('value')} ({len(nq)} q)")
    print(f"regressions (>{ratio}x and >{min_abs}s):")
    for k, o, n in sorted(reg, key=lambda x: x[1] - x[2]):
        print(f"  {k}: {o:.2f} -> {n:.2f}")
    print("improvements:")
    for k, o, n in sorted(imp, key=lambda x: x[2] - x[1]):
        print(f"  {k}: {o:.2f} -> {n:.2f}")
    added = sorted(set(nq) - set(oq))
    gone = sorted(set(oq) - set(nq))
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if gone:
        print(f"missing queries ({len(gone)}): {', '.join(gone)}")
    return 1 if reg or gone else 0


if __name__ == "__main__":
    raise SystemExit(main())
