"""SHJ skew audit at a scale tier (VERDICT r10 ask #7).

``preferSortMergeJoin=false`` is session-global since r10; a shuffled
hash join cannot spill its build side the way sort-merge can, so a
skewed build-side partition is the failure mode to audit.  This tool
re-runs the skew-heaviest join queries on an N-multiplied dataset
(scale_smoke's key-shifted copies) and, after each query, reads the
Spark UI REST API for per-stage TASK TIME and SHUFFLE READ
distributions — reporting max/median ratios per stage so a skewed
build side shows up as numbers, not vibes.

Flag rule (guide §2.5): a stage is SKEWED when max/median task time
> 5 AND the stage's max task time is > 10% of the query wall.

Usage: python tools/skew_audit.py [--mult 50] [--names a,b,c] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_NAMES = [
    "linkage_pipeline",
    "pretrain_pipeline",
    "basket_association_rules",
    "events_salted_join",
    "dedup_apply",
]

SHIFT = 10_000_000
KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=50)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--names", default=",".join(DEFAULT_NAMES))
    ap.add_argument("--out", default="/tmp/skew_audit.json")
    ap.add_argument("--top-stages", type=int, default=8)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F
    from fuel_spark.session import get_spark
    from fuel_spark.sources import TABLE_NAMES, load_table

    spark = get_spark(
        "skew-audit",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    n = args.mult
    out_dir = tempfile.mkdtemp(prefix="fuel_spark_skew_")
    try:
        for t in TABLE_NAMES:
            df = load_table(spark, args.src, t)
            if t in KEYED:
                copies = []
                for i in range(n):
                    c = df
                    for k in KEYED[t]:
                        if k in ("c_nationkey", "s_nationkey"):
                            continue
                        c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
                    copies.append(c)
                from functools import reduce

                df = reduce(lambda a, b: a.unionByName(b), copies)
            df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))
        print(f"staged {n}x dataset at {out_dir}", flush=True)

        qs = entry_mod.queries()
        report = {}
        for name in args.names.split(","):
            name = name.strip()
            fn = qs[name]
            before = {s["stageId"] for s in _api(base, "/stages?status=complete")}
            spark.sparkContext.setJobDescription(f"skew-audit {name} {n}x")
            t0 = time.perf_counter()
            df = fn(spark, out_dir)
            df.select(
                F.bit_xor(F.xxhash64(*df.columns)).alias("chk")
            ).collect()
            wall = time.perf_counter() - t0
            stages = [
                s
                for s in _api(base, "/stages?status=complete")
                if s["stageId"] not in before
            ]
            stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
            rows = []
            for s in stages[: args.top_stages]:
                sid, att = s["stageId"], s["attemptId"]
                try:
                    q = _api(
                        base,
                        f"/stages/{sid}/{att}/taskSummary"
                        "?quantiles=0.0,0.5,1.0",
                    )
                except Exception:
                    continue
                dur = q.get("duration") or [0, 0, 0]
                srd = (q.get("shuffleReadMetrics") or {}).get(
                    "readBytes"
                ) or [0, 0, 0]
                med = dur[1] or 0.001
                rows.append(
                    {
                        "stage": sid,
                        "tasks": s.get("numCompleteTasks"),
                        "task_ms_median": round(dur[1], 1),
                        "task_ms_max": round(dur[2], 1),
                        "max_over_median": round(dur[2] / med, 2),
                        "shuffle_read_max_mb": round(srd[2] / 1e6, 2),
                        "skewed": bool(
                            dur[2] / med > 5 and dur[2] > wall * 1000 * 0.10
                        ),
                    }
                )
            report[name] = {
                "wall_sec": round(wall, 2),
                "n_new_stages": len(stages),
                "stages": rows,
                "any_skewed": any(r["skewed"] for r in rows),
            }
            print(
                f"{name}: {wall:.1f}s, {len(stages)} stages, skewed="
                f"{report[name]['any_skewed']}",
                flush=True,
            )
        report["mult"] = n
        report["load_avg"] = list(os.getloadavg())
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(json.dumps({k: v.get("any_skewed") for k, v in report.items()
                          if isinstance(v, dict) and "any_skewed" in v}))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
