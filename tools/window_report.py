"""Driver-window integrity report — the verification half of the
per-round rotation, automated (every round re-derives this by hand
from the CORRECTNESS artifacts; the hand-rolled version has caught
shadowed keys and off-by-one staging blocks, so the checks are worth
a tool).

Prints and checks:
  1. the FIRST 50 queries() keys (the driver window): each must have
     an oracle_sql() twin and must be absent from every committed
     CORRECTNESS_r*.json (never driver-checked);
  2. the staging block at positions 51-100: how many are fresh oracle
     keys (a rotation-ready block reads exactly 50/50);
  3. the seed pool past position 100: fresh oracle keys that top up
     the NEXT round's staging block;
  4. duplicate-key sanity: every queries() key unique, every
     oracle_sql() key present in queries().

Exit 0 when (1) holds completely and (4) is clean; exit 1 otherwise.
Run it immediately after editing the registry order and again right
before the driver fires.

Usage: python tools/window_report.py
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = list(mod.queries().keys())
    o = set(mod.oracle_sql())

    prior: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        tag = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        for key in json.load(open(path)):
            prior.setdefault(key, tag)

    ok = True
    window = q[:50]
    stale = [(k, prior[k]) for k in window if k in prior]
    unoracled = [k for k in window if k not in o]
    print(f"window (first 50): {len(window) - len(stale)}/50 never "
          f"driver-checked, {50 - len(unoracled)}/50 oracle-backed")
    if stale:
        ok = False
        for k, tag in stale:
            print(f"  STALE window key {k}: already green in {tag}")
    if unoracled:
        ok = False
        for k in unoracled:
            print(f"  ROWS-ONLY window key {k}: no oracle_sql twin")

    staging = q[50:100]
    fresh_staged = [k for k in staging if k not in prior and k in o]
    print(f"staging block (51-100): {len(fresh_staged)}/50 fresh oracle "
          f"keys ({'rotation-ready' if len(fresh_staged) == 50 else 'TOP UP'})")

    pool = [k for k in q[100:] if k not in prior and k in o]
    print(f"seed pool (101+): {len(pool)} fresh oracle keys: "
          f"{', '.join(pool[:8])}{' …' if len(pool) > 8 else ''}")

    if len(set(q)) != len(q):
        ok = False
        seen: set = set()
        dups = [k for k in q if k in seen or seen.add(k)]
        print(f"  DUPLICATE queries() keys: {dups}")
    orphans = [k for k in o if k not in set(q)]
    if orphans:
        ok = False
        print(f"  ORPHAN oracle_sql keys (no queries() entry): {orphans}")

    total_checked = len([k for k in q if k in prior])
    print(f"cumulative driver coverage: {total_checked} of {len(o)} oracle "
          f"keys have a CORRECTNESS row ({len(q)} registry total)")
    print("WINDOW OK" if ok else "WINDOW BROKEN")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
