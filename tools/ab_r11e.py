"""Interleaved old-vs-new A/B for the r11 pagerank edge-frame
checkpoint: the post-distinct edge frame is referenced ~5x before any
cache materializes (verts x2, deg, the degree weld, deg again in
`base`), and for corpus-derived graphs each replay is the full
extraction+distinct pass.  OLD = pagerank without the checkpoint
(reconstructed verbatim below); NEW = the working-tree code.  Both run
alternating in ONE process so host noise hits them evenly; output
identity is asserted once per query before timing.

Usage: python tools/ab_r11e.py [--reps 9] [--out FILE] [--only Q]
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


# -------------------------------------------------- old pagerank (r10)
def pagerank_old(
    edges,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_interval: int = 3,
    undirected: bool = True,
    contrib_scale: int = 15,
    out_scale: int = 12,
    broadcast_ranks: bool = False,
):
    """r10 pagerank: identical to ops.graph.pagerank minus the
    post-distinct checkpoint_if_narrow."""
    DEC = "decimal(27,18)"
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.union(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
    e = e.distinct()

    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("vertex")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e = (
        e.join(deg.select(F.col("vertex").alias("src"), "deg"), "src")
        .select("src", "dst", F.col("deg").alias("src_deg"))
        .cache()
    )
    n_rel = verts.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    base = (
        verts.join(deg, "vertex", "left")
        .crossJoin(F.broadcast(n_rel))
        .select("vertex", F.coalesce("deg", F.lit(0)).alias("deg"), "_n")
        .cache()
    )
    ranks = base.select(
        "vertex", (F.lit(1.0) / F.col("_n")).alias("rank")
    ).cache()
    try:
        for it in range(iterations):
            r = F.broadcast(ranks) if broadcast_ranks else ranks
            contribs = (
                e.join(r, e.src == r.vertex)
                .select(
                    F.col("dst").alias("vertex"),
                    F.round(F.col("rank") / F.col("src_deg"), contrib_scale)
                    .cast(DEC)
                    .alias("c"),
                )
            )
            summed = contribs.groupBy("vertex").agg(
                F.sum("c").cast("double").alias("_in")
            )
            s = F.broadcast(summed) if broadcast_ranks else summed
            new_ranks = base.join(s, "vertex", "left")
            if undirected:
                dmass = F.lit(0.0)
            else:
                dangling = (
                    ranks.join(base.select("vertex", "deg"), "vertex")
                    .where(F.col("deg") == 0)
                    .groupBy()
                    .agg(
                        F.coalesce(
                            F.sum(F.round(F.col("rank"), 15).cast(DEC)),
                            F.lit(0).cast(DEC),
                        ).cast("double").alias("_dangling")
                    )
                )
                new_ranks = new_ranks.crossJoin(F.broadcast(dangling))
                dmass = F.col("_dangling")
            new_ranks = new_ranks.select(
                "vertex",
                (
                    (F.lit(1.0) - damping) / F.col("_n")
                    + F.lit(damping)
                    * (
                        F.coalesce("_in", F.lit(0.0))
                        + dmass / F.col("_n")
                    )
                ).alias("rank"),
            )
            if checkpoint_interval and (it + 1) % checkpoint_interval == 0:
                new_ranks = new_ranks.localCheckpoint(eager=True)
            else:
                new_ranks = new_ranks.cache()
            ranks.unpersist()
            ranks = new_ranks
        return ranks.select(
            "vertex", F.round(F.col("rank"), out_scale).alias("rank")
        )
    finally:
        e.unpersist()
        base.unpersist()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/ab_r11e.json")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from fuel_spark.ops import graph as graph_mod
    from fuel_spark.session import get_spark

    spark = get_spark("ab-r11e",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    pagerank_new = graph_mod.pagerank
    qs = entry.queries()

    def force(df):
        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("chk")).collect()

    def quiesce():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def run(qname, impl):
        graph_mod.pagerank = impl
        quiesce()
        t0 = time.perf_counter()
        force(qs[qname](spark, args.sf_dir))
        return round(time.perf_counter() - t0, 3)

    queries = ["text_textrank_keywords", "part_pagerank"]
    if args.only:
        queries = [args.only]
    results = {}
    for qname in queries:
        # output identity, old vs new, asserted before any timing
        graph_mod.pagerank = pagerank_old
        rows_old = sorted(map(tuple, qs[qname](spark, args.sf_dir).collect()))
        graph_mod.pagerank = pagerank_new
        rows_new = sorted(map(tuple, qs[qname](spark, args.sf_dir).collect()))
        assert rows_old == rows_new, f"{qname}: old/new outputs differ"
        print(f"{qname}: outputs identical ({len(rows_new)} rows)",
              flush=True)
        res = {"old": [], "new": []}
        for rep in range(args.reps):
            for label, impl in (("old", pagerank_old), ("new", pagerank_new)):
                spark.sparkContext.setJobDescription(
                    f"ab {qname} {label} r{rep}")
                res[label].append(run(qname, impl))
            print(f"{qname} rep{rep}: old={res['old'][-1]}"
                  f" new={res['new'][-1]}", flush=True)
        results[qname] = res

    graph_mod.pagerank = pagerank_new
    summary = {
        q: {v: {"best": min(r), "median": sorted(r)[len(r) // 2], "reps": r}
            for v, r in res.items()}
        for q, res in results.items()
    }
    summary["load_avg"] = list(os.getloadavg())
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({q: {v: d["best"] for v, d in res.items()}
                      for q, res in summary.items() if q != "load_avg"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
