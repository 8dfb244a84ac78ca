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
  4. duplicate-key sanity: the registry dict LITERAL in
     __spark_entry__.py is parsed with ast and checked for duplicate
     string keys — a shadowed key in the literal silently drops the
     earlier entry and is invisible in the materialized dict (the r7
     failure mode); plus every oracle_sql() key present in queries().

Pre- vs post-rotation: at round close, BEFORE the rotation edit, the
current first-50 are the round's own freshly-greened keys, so every
one reads "stale" — that is the healthy pending state, not a broken
window.  When the stale set exactly equals the NEWEST artifact's key
set the report prints ROTATION PENDING (exit 2) instead of BROKEN;
`--pre-rotation` makes that state exit 0 for round-close scripting.

Exit 0 when (1) holds completely and (4) is clean (or pending state
under --pre-rotation); exit 2 on rotation-pending without the flag;
exit 1 otherwise.  Run it immediately after editing the registry
order and again right before the driver fires.

Usage: python tools/window_report.py [--pre-rotation]
"""

from __future__ import annotations

import ast
import glob
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _literal_dup_keys(path: str) -> list[str]:
    """Duplicate string keys in any dict literal of the module whose
    values reference q_* functions (the registry shape) — checked on
    the SOURCE, because the materialized dict can never show them."""
    tree = ast.parse(open(path).read())
    dups: list[str] = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Dict):
            continue
        keys = [k.value for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)]
        if len(keys) < 10:
            continue  # small literals (configs, test fixtures) — skip
        seen: set = set()
        for k in keys:
            if k in seen:
                dups.append(k)
            seen.add(k)
    return dups


def main() -> int:
    pre_rotation = "--pre-rotation" in sys.argv[1:]
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = list(mod.queries().keys())
    o = set(mod.oracle_sql())

    prior: dict[str, str] = {}
    newest_keys: set = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        tag = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        keys = set(json.load(open(path)))
        newest_keys = keys  # sorted() → the last one is the newest round
        for key in keys:
            prior.setdefault(key, tag)

    ok = True
    window = q[:50]
    stale = [(k, prior[k]) for k in window if k in prior]
    unoracled = [k for k in window if k not in o]
    print(f"window (first 50): {len(window) - len(stale)}/50 never "
          f"driver-checked, {50 - len(unoracled)}/50 oracle-backed")
    # round-close state: the window is exactly the newest artifact's
    # keys (all green, rotation not yet performed) — pending, not
    # broken
    rotation_pending = (
        not unoracled
        and len(stale) == 50
        and {k for k, _ in stale} == newest_keys
    )
    if rotation_pending:
        print("  ROTATION PENDING: first-50 == newest artifact's window "
              "(all green) — rotate before the driver fires")
    elif stale:
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

    dups = _literal_dup_keys(os.path.join(REPO, "__spark_entry__.py"))
    if dups:
        ok = False
        print(f"  DUPLICATE literal keys in registry dicts "
              f"(earlier entry silently shadowed): {sorted(set(dups))}")
    orphans = [k for k in o if k not in set(q)]
    if orphans:
        ok = False
        print(f"  ORPHAN oracle_sql keys (no queries() entry): {orphans}")

    total_checked = len([k for k in q if k in prior])
    print(f"cumulative driver coverage: {total_checked} of {len(o)} oracle "
          f"keys have a CORRECTNESS row ({len(q)} registry total)")
    if ok and rotation_pending:
        print("WINDOW OK (rotation pending)" if pre_rotation
              else "WINDOW PENDING ROTATION")
        return 0 if pre_rotation else 2
    print("WINDOW OK" if ok else "WINDOW BROKEN")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
