"""Interleaved HEAD-vs-worktree A/B for one module function: loads the
committed (HEAD) version of a module via ``git show``, swaps the named
function in and out of the live module object between reps, and times
named registry queries alternating old/new in ONE process so host
noise lands on both.  Output identity is asserted once per query
before any timing.

Usage: python tools/ab_head_worktree.py --module fuel_spark.ops.dedup \
           --func edit_distance_pairs --queries dedup_edit_distance \
           [--reps 9] [--out FILE]
"""

from __future__ import annotations

import argparse
import importlib
import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def load_head_module(module: str, ref: str = "HEAD"):
    rel = module.replace(".", "/") + ".py"
    src = subprocess.run(
        ["git", "show", f"{ref}:{rel}"], capture_output=True, cwd=REPO,
        check=True,
    ).stdout
    fd, path = tempfile.mkstemp(suffix="_head.py")
    with os.fdopen(fd, "wb") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location(module + "_head", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--module", required=True)
    ap.add_argument("--func", required=True)
    ap.add_argument("--queries", required=True,
                    help="comma-separated registry keys")
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/ab_head_worktree.json")
    ap.add_argument("--ref", default="HEAD",
                    help="git ref for the OLD version (default HEAD)")
    ap.add_argument("--no-identity", action="store_true",
                    help="skip the output-identity collect (scale "
                         "smokes where identity is already gated)")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from fuel_spark.session import get_spark

    live = importlib.import_module(args.module)
    head = load_head_module(args.module, args.ref)
    fn_new = getattr(live, args.func)
    fn_old = getattr(head, args.func)

    spark = get_spark("ab-head-worktree",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def force(df):
        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("chk")).collect()

    def quiesce():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def run(qname, fn):
        setattr(live, args.func, fn)
        quiesce()
        t0 = time.perf_counter()
        force(qs[qname](spark, args.sf_dir))
        return round(time.perf_counter() - t0, 3)

    results = {}
    for qname in args.queries.split(","):
        if not args.no_identity:
            setattr(live, args.func, fn_old)
            rows_old = sorted(
                map(tuple, qs[qname](spark, args.sf_dir).collect()))
            setattr(live, args.func, fn_new)
            rows_new = sorted(
                map(tuple, qs[qname](spark, args.sf_dir).collect()))
            assert rows_old == rows_new, f"{qname}: old/new outputs differ"
            print(f"{qname}: outputs identical ({len(rows_new)} rows)",
                  flush=True)
        res = {"old": [], "new": []}
        for rep in range(args.reps):
            for label, fn in (("old", fn_old), ("new", fn_new)):
                spark.sparkContext.setJobDescription(
                    f"ab {qname} {label} r{rep}")
                res[label].append(run(qname, fn))
            print(f"{qname} rep{rep}: old={res['old'][-1]}"
                  f" new={res['new'][-1]}", flush=True)
        results[qname] = res

    setattr(live, args.func, fn_new)
    summary = {
        q: {v: {"best": min(r), "median": sorted(r)[len(r) // 2], "reps": r}
            for v, r in res.items()}
        for q, res in results.items()
    }
    summary["load_avg"] = list(os.getloadavg())
    summary["module"] = args.module
    summary["func"] = args.func
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({q: {v: d["best"] for v, d in res.items()}
                      for q, res in summary.items()
                      if isinstance(res, dict) and "old" in res}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
