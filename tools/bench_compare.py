"""Compare two bench outputs and flag real regressions.

Accepts either the driver's BENCH_r{N}.json wrapper (with the JSON line
embedded in "tail") or a raw bench.py JSON line file.  Queries outside
the per-query min/max band of the newer run are annotated so shared-box
variance is not mistaken for a plan regression.

Usage: python tools/bench_compare.py OLD NEW [ratio_threshold=1.3]
Exit 1 if any query regressed beyond the threshold AND outside the
newer run's own min/max variance band.
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict:
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    # driver wrapper: the bench line is embedded in "tail" (escaped)
    text = raw if d is None else json.dumps(d)
    m = None
    for m in re.finditer(r'\{\\?"metric.*', text):
        pass
    if m is None:
        raise SystemExit(f"{path}: no bench JSON line found")
    line = m.group(0)
    if line.startswith('{\\"'):
        line = line.encode().decode("unicode_escape")
    line = line.split("\\n")[0].split("\n")[0]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    minmax = new.get("query_minmax", {})
    bad = []
    # Global box-drift factor: the MEDIAN per-query ratio across the
    # frozen set.  Round 9 measured sessions where every query —
    # including paths untouched for 8 rounds — moved +12-19% together
    # (shared-host speed drift); dividing each ratio by the median
    # separates "the box got slower" from "this query's plan got
    # slower".  A real regression moves a query AHEAD of the fleet.
    ratios = sorted(
        t / old["queries"][q]
        for q, t in new["queries"].items()
        if old["queries"].get(q)
    )
    drift = ratios[len(ratios) // 2] if ratios else 1.0
    print(f"total: {old['value']:.2f}s -> {new['value']:.2f}s "
          f"({new['value'] / old['value']:.2f}x; "
          f"median per-query drift {drift:.2f}x)")
    for q, t in new["queries"].items():
        p = old["queries"].get(q)
        if p is None:
            print(f"  {q}: (new) {t}s")
            continue
        note = ""
        adj = t / (p * drift)
        if adj > thresh:
            lo, hi = minmax.get(q, (t, t))
            # regression is "real" only if even the new run's best rep
            # is above threshold x the drift-adjusted old median
            if lo / (p * drift) > thresh:
                note = f" REGRESSION ({adj:.2f}x drift-adjusted)"
                bad.append(q)
            else:
                note = f" (noisy: min {lo}s within drift-adjusted band)"
        elif adj < 1 / thresh:
            note = f" improved ({adj:.2f}x drift-adjusted)"
        if note:
            print(f"  {q}: {p}s -> {t}s{note}")
    if bad:
        print(f"\nregressed: {bad}")
        sys.exit(1)
    print("\nno real regressions (drift-adjusted)")


if __name__ == "__main__":
    main()
