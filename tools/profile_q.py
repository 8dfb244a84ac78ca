"""Per-query job/stage profile via the Spark UI REST API: run a named
registry query once (post-warmup), then report every job and the top
stages by executor task time — the instrument for "where do this
query's seconds actually go" (guide §1/§7.1) without the interactive
UI.

Usage: python tools/profile_q.py QUERY [QUERY ...] [--sf-dir D] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/profile_q.json")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from fuel_spark.session import get_spark

    spark = get_spark("profile-q",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    def force(df):
        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("chk")).collect()

    report = {}
    for qname in args.queries:
        force(qs[qname](spark, args.sf_dir))  # warmup
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
        spark.sparkContext.setJobDescription(f"profile {qname}")
        t0 = time.perf_counter()
        force(qs[qname](spark, args.sf_dir))
        wall = round(time.perf_counter() - t0, 3)
        jobs = [j for j in _api(base, "/jobs")
                if j["jobId"] not in jobs_before]
        job_rows = []
        stage_ids = set()
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            dur = None
            if j.get("completionTime") and j.get("submissionTime"):
                from datetime import datetime
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = round(
                    (datetime.strptime(j["completionTime"], fmt)
                     - datetime.strptime(j["submissionTime"], fmt))
                    .total_seconds(), 3)
            job_rows.append({"job": j["jobId"], "wall": dur,
                             "stages": j.get("stageIds", []),
                             "tasks": j.get("numCompletedTasks")})
            stage_ids.update(j.get("stageIds", []))
        stage_rows = []
        for s in _api(base, "/stages?status=complete"):
            if s["stageId"] not in stage_ids:
                continue
            stage_rows.append({
                "stage": s["stageId"],
                "tasks": s.get("numCompleteTasks"),
                "task_time_s": round(s.get("executorRunTime", 0) / 1000, 2),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "shuffle_read_mb": round(
                    s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuffle_write_mb": round(
                    s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "name": (s.get("name") or "")[:80],
            })
        stage_rows.sort(key=lambda r: -r["task_time_s"])
        report[qname] = {"wall": wall, "n_jobs": len(job_rows),
                         "jobs": job_rows, "top_stages": stage_rows[:14]}
        print(f"{qname}: wall={wall}s jobs={len(job_rows)}", flush=True)
        for r in stage_rows[:10]:
            print(f"  stage {r['stage']}: task_time={r['task_time_s']}s "
                  f"cpu={r['cpu_s']}s tasks={r['tasks']} "
                  f"sr={r['shuffle_read_mb']}MB sw={r['shuffle_write_mb']}MB "
                  f"in={r['input_mb']}MB {r['name']}", flush=True)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
