"""Three-variant interleaved A/B for the r11 edit-distance width work,
decomposed (quiet-host follow-up to ab_ed_width / ab_ed_width_20x):

  A = pre-change code (git ref, default a566e73)
  B = worktree (groups-checkpoint width + explicit gi/gp repartitions
      + explode fanout)
  C = groups-checkpoint width fix ONLY (A's source with just the
      checkpoint line widened — keeps the map-side partial collect_set
      and the original distinct tail)

All three run alternating per rep in ONE process.  Output identity of
B and C against A is asserted once before timing.

Usage: python tools/ab_r11h.py [--reps 5] [--sf-dir D] [--ref R] [--out F]
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

OLD_CKPT = "    groups = groups.localCheckpoint(eager=False)\n"
WIDE_CKPT = (
    "    groups = groups.repartition(\n"
    "        df.sparkSession.sparkContext.defaultParallelism\n"
    "    ).localCheckpoint(eager=False)\n"
)


def load_module_from_source(src: bytes, name: str):
    fd, path = tempfile.mkstemp(suffix=f"_{name}.py")
    with os.fdopen(fd, "wb") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--ref", default="a566e73")
    ap.add_argument("--out", default="/tmp/ab_r11h.json")
    ap.add_argument("--no-identity", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from fuel_spark.ops import dedup as dedup_mod
    from fuel_spark.session import get_spark

    src_old = subprocess.run(
        ["git", "show", f"{args.ref}:fuel_spark/ops/dedup.py"],
        capture_output=True, cwd=REPO, check=True,
    ).stdout
    assert OLD_CKPT.encode() in src_old, "old checkpoint line not found"
    src_c = src_old.replace(OLD_CKPT.encode(), WIDE_CKPT.encode(), 1)
    mod_a = load_module_from_source(src_old, "dedup_ed_a")
    mod_c = load_module_from_source(src_c, "dedup_ed_c")

    impls = {
        "A_old": mod_a.edit_distance_pairs,
        "B_worktree": dedup_mod.edit_distance_pairs,
        "C_groups_width_only": mod_c.edit_distance_pairs,
    }

    spark = get_spark("ab-r11h",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    qname = "dedup_edit_distance"

    def force(df):
        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("chk")).collect()

    def run(fn):
        dedup_mod.edit_distance_pairs = fn
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        force(qs[qname](spark, args.sf_dir))
        return round(time.perf_counter() - t0, 3)

    if not args.no_identity:
        ref_rows = None
        for label, fn in impls.items():
            dedup_mod.edit_distance_pairs = fn
            rows = sorted(
                map(tuple, qs[qname](spark, args.sf_dir).collect()))
            if ref_rows is None:
                ref_rows = rows
            else:
                assert rows == ref_rows, f"{label}: output differs from A"
        print(f"outputs identical across 3 variants "
              f"({len(ref_rows)} rows)", flush=True)
    else:
        run(impls["A_old"])  # warmup

    res = {k: [] for k in impls}
    for rep in range(args.reps):
        for label, fn in impls.items():
            spark.sparkContext.setJobDescription(f"ab {label} r{rep}")
            res[label].append(run(fn))
        print(f"rep{rep}: " + " ".join(
            f"{k}={res[k][-1]}" for k in impls), flush=True)

    dedup_mod.edit_distance_pairs = impls["B_worktree"]
    summary = {
        k: {"best": min(r), "median": sorted(r)[len(r) // 2], "reps": r}
        for k, r in res.items()
    }
    summary["load_avg"] = list(os.getloadavg())
    summary["sf_dir"] = args.sf_dir
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: v["best"] for k, v in summary.items()
                      if isinstance(v, dict) and "best" in v}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
