"""Standing round-close scale tier: the top-N most expensive bench
queries re-run at growing multipliers with the two plan-health checks
automated — the instrument that caught the LPA broadcast regression
(non-monotone 15.8/46.3/35.0s readings at 5/10/20x) and the
connected-components edge replay, promoted from ad-hoc to checklist.

Per query and multiplier pair (m1 < m2) it flags:

  NON-MONOTONE  t(m2) < t(m1) * 0.8 — runtime FELL while input grew
                by m2/m1: the plan changed shape under size estimates
                (a broadcast flipped to SortMergeJoin somewhere
                cheaper, a checkpoint got re-planned...).  Not
                "faster is fine": instability here means the SLOWER
                tier is one AQE estimate away at any scale.
  SUPERLINEAR   t(m2)/t(m1) > (m2/m1) * 2.0 — worse than 2x the
                input growth: a pair-emitting path or driver
                materialization is outgrowing the data.

Usage:
    python tools/roundclose_smoke.py [--top N] [--tiers 5,20,50]
                                     [--bench bench_full_rX.json]
                                     [--names a,b,c]

Reads the committed quiesced bench snapshot to pick the top-N
heaviest queries (skipping bench-only composites that have no
registry entry), shells out to scale_smoke.py once per tier, then
prints a markdown table ready for SURVEY section 6 plus one JSON
line with the verdicts.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# bench entries with no queries() twin (streaming harnesses and
# bench-only ablations) — scale_smoke cannot run them
BENCH_ONLY = {"streaming_screen_availablenow", "curation_pipeline_noprepass"}

MONOTONE_SLACK = 0.8   # t(m2) below 0.8*t(m1) flags NON-MONOTONE
SUPERLINEAR_SLACK = 2.0  # t growth beyond 2x input growth flags


def pick_top(bench_path: str, top: int) -> list[str]:
    with open(bench_path) as fh:
        bench = json.load(fh)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    registry = set(mod.queries())
    ranked = sorted(
        (
            (name, sec)
            for name, sec in bench["queries"].items()
            if name in registry and name not in BENCH_ONLY
        ),
        key=lambda kv: -kv[1],
    )
    return [name for name, _ in ranked[:top]]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--tiers", default="5,20,50")
    ap.add_argument("--bench", default=os.path.join(REPO, "bench_full.json"))
    ap.add_argument("--names", default=None,
                    help="explicit comma list instead of bench top-N")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    tiers = [int(t) for t in args.tiers.split(",")]
    if args.names:
        names = args.names.split(",")
    else:
        names = pick_top(args.bench, args.top)
    print(f"roundclose: {len(names)} queries x tiers {tiers}",
          file=sys.stderr, flush=True)

    results: dict[str, dict[int, float]] = {n: {} for n in names}
    for m in tiers:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "scale_smoke.py"),
             str(m), args.src, ",".join(names)],
            capture_output=True, text=True, cwd=REPO,
        )
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            return 1
        payload = json.loads(proc.stdout.strip().splitlines()[-1])
        for name, t in payload["timings"].items():
            results[name][m] = t["sec"]
        print(f"roundclose: tier {m}x done", file=sys.stderr, flush=True)

    flags: dict[str, list[str]] = {}
    for name, per in results.items():
        f = []
        for m1, m2 in zip(tiers, tiers[1:]):
            t1, t2 = per.get(m1), per.get(m2)
            if t1 is None or t2 is None or t1 <= 0:
                continue
            if t2 < t1 * MONOTONE_SLACK:
                f.append(f"NON-MONOTONE {m1}x->{m2}x ({t1}s -> {t2}s)")
            if t2 / t1 > (m2 / m1) * SUPERLINEAR_SLACK:
                f.append(
                    f"SUPERLINEAR {m1}x->{m2}x "
                    f"({t2 / t1:.1f}x time for {m2 / m1:.1f}x data)"
                )
        flags[name] = f

    hdr = "| query | " + " | ".join(f"{m}x" for m in tiers) + " | verdict |"
    sep = "|---" * (len(tiers) + 2) + "|"
    lines = [hdr, sep]
    for name in names:
        per = results[name]
        cells = " | ".join(f"{per.get(m, float('nan'))}s" for m in tiers)
        verdict = "; ".join(flags[name]) if flags[name] else "ok"
        lines.append(f"| {name} | {cells} | {verdict} |")
    print("\n".join(lines))
    print(json.dumps({
        "tiers": tiers,
        "timings": {n: results[n] for n in names},
        "flags": {n: f for n, f in flags.items() if f},
        "n_flagged": sum(bool(f) for f in flags.values()),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
