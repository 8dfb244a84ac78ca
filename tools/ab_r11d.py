"""Interleaved old-vs-new A/B for the r11 compact_index rewrite
(one-exchange window form vs r10 dedup+sizes-join form), timed on
incremental_dedup_pipeline (the benched consumer).

Usage: python tools/ab_r11d.py [--reps 9] [--out FILE]
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


def compact_old(index, live_ids=None, id_col="doc_id",
                max_bucket=None, index_id_col="doc_id"):
    from fuel_spark.ops.dedup import DEFAULT_MAX_BUCKET

    if max_bucket is None:
        max_bucket = DEFAULT_MAX_BUCKET
    cols = index.columns
    idx_id = index_id_col
    out = index.dropDuplicates(cols)
    if live_ids is not None:
        id_type = dict(index.dtypes)[idx_id]
        keep = live_ids.select(
            F.col(id_col).cast(id_type).alias(idx_id)
        ).distinct()
        out = out.join(keep, idx_id, "left_semi")
    if max_bucket is not None:
        sizes = out.groupBy("band_id", "band_key").agg(
            F.count(F.lit(1)).alias("_bucket_n")
        )
        out = (
            out.join(sizes, ["band_id", "band_key"])
            .where(F.col("_bucket_n") <= int(max_bucket))
            .drop("_bucket_n")
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/ab_r11d.json")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from fuel_spark.ops import dedup as dedup_mod
    from fuel_spark.session import get_spark

    spark = get_spark("ab-r11d",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    new_fn = dedup_mod.compact_index
    qs = entry.queries()

    def force(df):
        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("chk")).collect()

    def quiesce():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    res = {"old": [], "new": []}
    # warmup
    force(qs["incremental_dedup_pipeline"](spark, args.sf_dir))
    for rep in range(args.reps):
        for label, impl in (("old", compact_old), ("new", new_fn)):
            dedup_mod.compact_index = impl
            spark.sparkContext.setJobDescription(f"ab ci {label} r{rep}")
            quiesce()
            t0 = time.perf_counter()
            force(qs["incremental_dedup_pipeline"](spark, args.sf_dir))
            res[label].append(round(time.perf_counter() - t0, 3))
        print(f"rep{rep}: old={res['old'][-1]} new={res['new'][-1]}",
              flush=True)
    dedup_mod.compact_index = new_fn
    summary = {
        "incremental_dedup_pipeline": {
            v: {"best": min(r), "median": sorted(r)[len(r) // 2], "reps": r}
            for v, r in res.items()
        },
        "load_avg": list(os.getloadavg()),
    }
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary["incremental_dedup_pipeline"], default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
