"""Per-query drift report between two committed bench snapshots —
generated from the per-rep `spreads` maps instead of hand-maintained
cells (VERDICT r6 ask #7's reporting half).

A query is flagged only when its rep RANGES do not overlap (the
spread-aware definition of drift: best-of readings can differ 1.3×
while the machines' envelopes still intersect).  Usage:

    python tools/drift_report.py bench_full_r6.json bench_full_r7.json
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    sa, sb = a.get("spreads", {}), b.get("spreads", {})
    rows = []
    for k in sorted(set(sa) & set(sb)):
        ra, rb = sa[k], sb[k]
        lo_a, hi_a, lo_b, hi_b = min(ra), max(ra), min(rb), max(rb)
        overlap = not (lo_b > hi_a or lo_a > hi_b)
        ratio = lo_b / lo_a if lo_a else float("inf")
        rows.append((k, lo_a, hi_a, lo_b, hi_b, ratio, overlap))
    print(f"| query | {sys.argv[1]} range | {sys.argv[2]} range |"
          " best ratio | verdict |")
    print("|---|---|---|---|---|")
    flagged = 0
    for k, lo_a, hi_a, lo_b, hi_b, ratio, overlap in rows:
        verdict = "in spread" if overlap else (
            "FASTER" if ratio < 1 else "DRIFT")
        if not overlap:
            flagged += 1
        print(f"| {k} | {lo_a:.3f}–{hi_a:.3f} | {lo_b:.3f}–{hi_b:.3f} |"
              f" {ratio:.2f}× | {verdict} |")
    print(f"\n{flagged} of {len(rows)} queries outside spread overlap")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
