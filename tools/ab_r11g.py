"""Interleaved A/B for
``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning``: with the
default (false), a ``.cache()`` freezes its plan's shuffle width at
``spark.sql.shuffle.partitions`` — the iterative loops (connected
components, pagerank) then run every per-iteration stage 32..64 tasks
wide over kilobyte-sized label frames, paying per-task overhead for
nothing.  With the flag on, AQE's partition coalescing applies to
cached plans too, so the loop width tracks the data size (guide §2:
scale-adaptive partitioning instead of a constant).

The conf is toggled at runtime between variants in ONE process;
output identity is asserted per query before timing.

Usage: python tools/ab_r11g.py [--reps 7] [--out FILE] [--only Q]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

FLAG = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/ab_r11g.json")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from fuel_spark.session import get_spark

    spark = get_spark("ab-r11g",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def force(df):
        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("chk")).collect()

    def run(qname, flag_on):
        spark.conf.set(FLAG, "true" if flag_on else "false")
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        force(qs[qname](spark, args.sf_dir))
        return round(time.perf_counter() - t0, 3)

    queries = ["linkage_pipeline", "text_textrank_keywords",
               "part_pagerank"]
    if args.only:
        queries = [args.only]
    results = {}
    for qname in queries:
        spark.conf.set(FLAG, "false")
        rows_old = sorted(map(tuple, qs[qname](spark, args.sf_dir).collect()))
        spark.conf.set(FLAG, "true")
        rows_new = sorted(map(tuple, qs[qname](spark, args.sf_dir).collect()))
        assert rows_old == rows_new, f"{qname}: flag changed the output"
        print(f"{qname}: outputs identical ({len(rows_new)} rows)",
              flush=True)
        res = {"off": [], "on": []}
        for rep in range(args.reps):
            for label, flag_on in (("off", False), ("on", True)):
                spark.sparkContext.setJobDescription(
                    f"ab {qname} flag={label} r{rep}")
                res[label].append(run(qname, flag_on))
            print(f"{qname} rep{rep}: off={res['off'][-1]}"
                  f" on={res['on'][-1]}", flush=True)
        results[qname] = res

    spark.conf.set(FLAG, "false")
    summary = {
        q: {v: {"best": min(r), "median": sorted(r)[len(r) // 2], "reps": r}
            for v, r in res.items()}
        for q, res in results.items()
    }
    summary["load_avg"] = list(os.getloadavg())
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({q: {v: d["best"] for v, d in res.items()}
                      for q, res in summary.items()
                      if isinstance(res, dict) and "off" in res}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
