"""Interleaved old-vs-new A/B for the r11 edit-distance probe bound
(segment-index-aware multi-match selection).  OLD = the r10 probe
window (delta-based bound only), reconstructed by re-deriving the
probe expressions; NEW = working-tree code.  Also profiles
graph_hits_fixed job/stage structure (VERDICT item 4 receipt).

Usage: python tools/ab_r11c.py [--reps 9] [--out FILE] [--only ed|hits]
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


def ed_old(df, id_col, text_col, max_dist=5, max_bucket=None,
           prededup_exact=True):
    """edit_distance_pairs with the r10 probe window (no segment-index
    bound); every other line identical to ops.dedup."""
    from fuel_spark.ops.dedup import (
        DEFAULT_MAX_BUCKET, ensure_parallelism, norm_text,
    )
    if max_bucket is None:
        max_bucket = DEFAULT_MAX_BUCKET

    tau = int(max_dist)
    nseg = tau + 1
    base = (
        df.select(F.col(id_col).alias("_id"), norm_text(F.col(text_col)).alias("_t"))
        .where(F.length("_t") >= 1)
        .withColumn("_L", F.length("_t"))
    )
    base = ensure_parallelism(base)

    if prededup_exact:
        groups = (
            base.groupBy(F.md5("_t").alias("_h"))
            .agg(
                F.min("_id").alias("_id"),
                F.first("_t").alias("_t"),
                F.first("_L").alias("_L"),
                F.array_sort(F.collect_list("_id")).alias("_ids"),
            )
            .drop("_h")
        )
    else:
        groups = base.withColumn("_ids", F.array("_id"))
    groups = groups.localCheckpoint(eager=False)

    def _seg(i, l_expr):
        blen = f"({l_expr} DIV {nseg})"
        nshort = f"({nseg} - ({l_expr} % {nseg}))"
        ln = f"({blen} + (CASE WHEN {i} >= {nshort} THEN 1 ELSE 0 END))"
        st = f"({i} * {blen} + GREATEST(0, {i} - {nshort}))"
        return st, ln

    idx_cols = []
    for i in range(nseg):
        st, ln = _seg(i, "_L")
        idx_cols.append(f"xxhash64(_L, {i}, substring(_t, {st} + 1, {ln}))")
    idx_long = groups.where(F.col("_L") >= nseg).select(
        "_id", F.explode(F.expr(f"array({', '.join(idx_cols)})")).alias("_k")
    )
    idx_short = groups.where(F.col("_L") < nseg).select(
        "_id", F.expr("xxhash64(_L, -1, '')").alias("_k")
    )

    probe_parts = []
    for i in range(nseg):
        st, ln = _seg(i, "l")
        lo = f"GREATEST(0, {st} - (({tau} - (_L - l)) DIV 2))"
        hi = f"LEAST(_L - {ln}, {st} + (({tau} + (_L - l)) DIV 2))"
        probe_parts.append(
            f"flatten(transform("
            f"filter(sequence(GREATEST(_L - {tau}, {nseg}), GREATEST(_L, {nseg})), l -> l <= _L), "
            f"l -> transform(filter(sequence({lo}, GREATEST({lo}, {hi})), s -> s <= {hi}), "
            f"s -> xxhash64(l, {i}, substring(_t, s + 1, {ln})))))"
        )
    short_lo = f"GREATEST(1, _L - {tau})"
    short_hi = f"LEAST({tau}, _L)"
    probe_parts.append(
        f"transform(filter(sequence({short_lo}, GREATEST({short_lo}, {short_hi})), "
        f"l -> l <= {short_hi}), l -> xxhash64(l, -1, ''))"
    )
    probes = groups.select(
        "_id",
        F.explode(
            F.expr(f"array_distinct(concat({', '.join(probe_parts)}))")
        ).alias("_k"),
    )

    gi = idx_long.unionByName(idx_short).groupBy("_k").agg(
        F.array_sort(F.collect_set("_id")).alias("_ai")
    )
    gp = probes.groupBy("_k").agg(
        F.array_sort(F.collect_set("_id")).alias("_ap")
    )
    if max_bucket is not None:
        gi = gi.where(F.size("_ai") <= max_bucket)
        gp = gp.where(F.size("_ap") <= max_bucket)
    pairs = (
        gi.join(gp, "_k")
        .select(F.explode("_ai").alias("_x"), "_ap")
        .select("_x", F.explode("_ap").alias("_y"))
        .where(F.col("_x") != F.col("_y"))
        .select(
            F.least("_x", "_y").alias("ra"),
            F.greatest("_x", "_y").alias("rb"),
        )
        .distinct()
    )
    pairs = pairs.repartition(df.sparkSession.sparkContext.defaultParallelism)
    ta = groups.select(F.col("_id").alias("ra"), F.col("_t").alias("_ta"))
    tb = groups.select(F.col("_id").alias("rb"), F.col("_t").alias("_tb"))
    rep_pairs = (
        pairs.join(ta, "ra")
        .join(tb, "rb")
        .withColumn("dist", F.levenshtein("_ta", "_tb", tau))
        .where(F.col("dist") >= 0)
        .select("ra", "rb", F.col("dist").cast("long").alias("dist"))
    )

    if not prededup_exact:
        return rep_pairs.select(
            F.col("ra").alias("id_a"), F.col("rb").alias("id_b"), "dist"
        )

    ga = groups.select(F.col("_id").alias("ra"), F.col("_ids").alias("_as"))
    gb = groups.select(F.col("_id").alias("rb"), F.col("_ids").alias("_bs"))
    expanded = (
        rep_pairs.join(ga, "ra")
        .join(gb, "rb")
        .select(F.explode("_as").alias("_a"), "_bs", "dist")
        .select("_a", F.explode("_bs").alias("_b"), "dist")
        .select(
            F.least("_a", "_b").alias("id_a"),
            F.greatest("_a", "_b").alias("id_b"),
            "dist",
        )
    )
    all_pairs = (
        "flatten(transform(sequence(1, size(_ids) - 1),"
        " i -> transform(slice(_ids, i + 1, size(_ids) - i),"
        " x -> struct(element_at(_ids, i) AS id_a, x AS id_b))))"
    )
    dist0 = (
        groups.where(F.size("_ids") > 1)
        .select(F.explode(F.expr(all_pairs)).alias("_p"))
        .select("_p.id_a", "_p.id_b", F.lit(0).cast("long").alias("dist"))
    )
    return expanded.unionByName(dist0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/ab_r11c.json")
    ap.add_argument("--only", default=None, choices=[None, "ed", "hits"])
    args = ap.parse_args()

    import __spark_entry__ as entry
    from fuel_spark.ops import dedup as dedup_mod
    from fuel_spark.session import get_spark

    spark = get_spark("ab-r11c",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    ed_new = dedup_mod.edit_distance_pairs
    qs = entry.queries()
    summary = {}

    def force(df):
        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("chk")).collect()

    def quiesce():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    if args.only in (None, "ed"):
        # sanity: identical output first
        a = sorted(map(tuple, ed_old(
            entry._t(spark, args.sf_dir)["documents"], "doc_id", "text",
            max_dist=5).collect()))
        b = sorted(map(tuple, ed_new(
            entry._t(spark, args.sf_dir)["documents"], "doc_id", "text",
            max_dist=5).collect()))
        assert a == b, "old/new edit-distance outputs differ!"
        print(f"ed outputs identical ({len(a)} pairs)", flush=True)

        res = {"old": [], "new": []}
        for rep in range(args.reps):
            for label, impl in (("old", ed_old), ("new", ed_new)):
                dedup_mod.edit_distance_pairs = impl
                spark.sparkContext.setJobDescription(f"ab ed {label} r{rep}")
                quiesce()
                t0 = time.perf_counter()
                force(qs["dedup_edit_distance"](spark, args.sf_dir))
                res[label].append(round(time.perf_counter() - t0, 3))
            print(f"ed rep{rep}: old={res['old'][-1]} new={res['new'][-1]}",
                  flush=True)
        dedup_mod.edit_distance_pairs = ed_new
        summary["dedup_edit_distance"] = {
            v: {"best": min(r), "median": sorted(r)[len(r) // 2], "reps": r}
            for v, r in res.items()
        }

    if args.only in (None, "hits"):
        # floor receipt: wall + job count for graph_hits_fixed
        st = spark.sparkContext.statusTracker()
        reps = []
        for rep in range(max(3, args.reps // 3)):
            quiesce()
            j0 = len(st.getJobIdsForGroup(None) or [])
            spark.sparkContext.setJobDescription(f"hits profile r{rep}")
            t0 = time.perf_counter()
            force(qs["graph_hits_fixed"](spark, args.sf_dir))
            wall = round(time.perf_counter() - t0, 3)
            j1 = len(st.getJobIdsForGroup(None) or [])
            reps.append({"wall": wall, "jobs": j1 - j0})
            print(f"hits rep{rep}: {wall}s {j1-j0} jobs", flush=True)
        summary["graph_hits_fixed_profile"] = reps

    summary["load_avg"] = list(os.getloadavg())
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "load_avg"},
                     default=str)[:400])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
