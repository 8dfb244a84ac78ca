"""Interleaved old-vs-new A/B for the r11 structural changes:
connected_components sum-convergence, theta explode restructure,
kmeans array-fold assignment.  OLD = the r10 (HEAD~) implementations,
reconstructed below verbatim; NEW = the working-tree code.  Both run
alternating in ONE process so host noise hits them evenly.

Usage: python tools/ab_r11b.py [--reps 9] [--out FILE] [--only Q]
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


# ------------------------------------------------------------- old CC (r10)
def cc_old(pairs, id_a="id_a", id_b="id_b", max_iter=50,
           checkpoint_interval=3):
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("component", F.col("v"))
    ).cache()
    edges = edges.cache()
    try:
        for it in range(max_iter):
            msgs = (
                edges.join(labels, edges.src == labels.v)
                .select(F.col("dst").alias("v"), "component")
            )
            stepped = (
                labels.select("v", "component")
                .union(msgs)
                .groupBy("v")
                .agg(F.min("component").alias("component"))
            )
            parent = stepped.select(
                F.col("v").alias("_pv"), F.col("component").alias("_pc")
            )
            new_labels = (
                stepped.join(parent, stepped.component == F.col("_pv"), "left")
                .select(
                    "v",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("_pc"), F.col("component")),
                    ).alias("component"),
                )
            )
            if checkpoint_interval and (it + 1) % checkpoint_interval == 0:
                new_labels = new_labels.localCheckpoint(eager=True)
            else:
                new_labels = new_labels.cache()
            converged = (
                new_labels.alias("n")
                .join(labels.alias("o"), "v")
                .where(F.col("n.component") != F.col("o.component"))
                .isEmpty()
            )
            labels.unpersist()
            labels = new_labels
            if converged:
                break
        return labels.select("v", "component")
    finally:
        edges.unpersist()


# ---------------------------------------------------------- old theta (r10)
def theta_old(df, group_col, key_col, pairs, k=32, seed=7):
    from fuel_spark.ops.sketch import kmv_sketch, hash_uniform

    groups = sorted({g for p in pairs for g in p})
    scoped = df.filter(F.col(group_col).isin(groups))
    sk = kmv_sketch(scoped, group_col, key_col, k=k, seed=seed).select(
        F.col(group_col).alias("_g"), F.col(key_col).alias("_k"),
        "_h", "rank",
    ).localCheckpoint(eager=False)
    thetas = sk.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max(F.when(F.col("rank") == k, F.col("_h"))).alias("_hk"),
    ).select(
        "_g",
        F.when(F.col("_n") >= k, F.col("_hk"))
        .otherwise(F.lit(2.0))
        .alias("_theta"),
    )
    gidx = {g: i for i, g in enumerate(groups)}
    flags_all = scoped.groupBy(F.col(key_col).alias("_k")).agg(*[
        F.max(F.when(F.col(group_col) == g, 1).otherwise(0)).alias(f"_i{i}")
        for i, g in enumerate(groups)
    ])
    exact_all = flags_all.agg(*[
        agg
        for j, (a, b) in enumerate(pairs)
        for agg in (
            F.sum(
                F.when(
                    (F.col(f"_i{gidx[a]}") == 1) | (F.col(f"_i{gidx[b]}") == 1),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias(f"_ex{j}_union"),
            F.sum(F.col(f"_i{gidx[a]}") * F.col(f"_i{gidx[b]}"))
            .cast("bigint").alias(f"_ex{j}_intersection"),
            F.sum(F.col(f"_i{gidx[a]}") * (1 - F.col(f"_i{gidx[b]}")))
            .cast("bigint").alias(f"_ex{j}_a_not_b"),
        )
    ]).localCheckpoint(eager=False)
    out = None
    for j, (a, b) in enumerate(pairs):
        th = (
            thetas.filter(F.col("_g") == a)
            .select(F.col("_theta").alias("_ta"))
            .crossJoin(
                F.broadcast(
                    thetas.filter(F.col("_g") == b).select(
                        F.col("_theta").alias("_tb")
                    )
                )
            )
            .select(F.least("_ta", "_tb").alias("_theta"))
        )
        ska = sk.filter(F.col("_g") == a).select("_k", "_h")
        skb = sk.filter(F.col("_g") == b).select(
            F.col("_k").alias("_k"), F.lit(1).alias("_inb")
        )
        cand = (
            ska.join(skb, "_k", "full_outer")
            .select(
                "_k", "_h",
                F.col("_inb").isNotNull().alias("_in_b"),
                F.col("_h").isNotNull().alias("_in_a"),
            )
            .crossJoin(F.broadcast(th))
        )
        cand = cand.withColumn(
            "_hh", F.coalesce(F.col("_h"), hash_uniform(f"kmv{seed}", F.col("_k")))
        )
        below = F.col("_hh") < F.col("_theta")
        rate = F.least(F.col("_theta"), F.lit(1.0))
        est_row = cand.agg(
            F.round(
                F.sum(F.when(below, 1).otherwise(0)) / F.first(rate), 6
            ).alias("est_union"),
            F.round(
                F.sum(
                    F.when(below & F.col("_in_a") & F.col("_in_b"), 1)
                    .otherwise(0)
                )
                / F.first(rate),
                6,
            ).alias("est_intersection"),
            F.round(
                F.sum(
                    F.when(below & F.col("_in_a") & ~F.col("_in_b"), 1)
                    .otherwise(0)
                )
                / F.first(rate),
                6,
            ).alias("est_a_not_b"),
            F.round(F.first(F.col("_theta")), 6).alias("theta"),
        )
        exact_row = exact_all.select(
            F.col(f"_ex{j}_union").alias("exact_union"),
            F.col(f"_ex{j}_intersection").alias("exact_intersection"),
            F.col(f"_ex{j}_a_not_b").alias("exact_a_not_b"),
        )
        joined = est_row.crossJoin(F.broadcast(exact_row))
        for op in ("union", "intersection", "a_not_b"):
            est_c = F.col(f"est_{op}")
            ex_c = F.col(f"exact_{op}").cast("bigint")
            row = joined.select(
                F.lit(a).alias("group_a"),
                F.lit(b).alias("group_b"),
                F.lit(op).alias("set_op"),
                F.col("theta"),
                est_c.alias("est"),
                ex_c.alias("exact"),
                F.when(
                    ex_c > 0,
                    F.round(
                        F.abs(est_c - ex_c.cast("double"))
                        / ex_c.cast("double"),
                        6,
                    ),
                ).alias("rel_err"),
            )
            out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------- old kmeans (r10)
def kmeans_old(corpus, id_col="vec_id", vec_col="embedding", k=8,
               iterations=2):
    from pyspark.sql.functions import broadcast
    from fuel_spark.functions import cosine_expr

    DECC = "decimal(27,18)"
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).localCheckpoint(eager=False)
    cent = broadcast(
        corpus.select(
            F.col(id_col).alias("cluster"), F.col(vec_col).alias("cvec")
        )
        .orderBy("cluster")
        .limit(int(k))
    )

    def _assign(centroids):
        return (
            c.crossJoin(centroids)
            .withColumn("_negcos", -F.round(cosine_expr("vec", "cvec"), 6))
            .groupBy("vec_id")
            .agg(
                F.min(F.struct(F.col("_negcos"), F.col("cluster"))).alias("_m"),
                F.any_value("vec").alias("vec"),
            )
            .select("vec_id", "vec", F.col("_m.cluster").alias("cluster"))
        )

    for _ in range(int(iterations)):
        assigned = _assign(cent)
        upd = (
            assigned.select("cluster", F.posexplode("vec").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(
                F.round(
                    F.sum(
                        F.round(F.col("val").cast("double"), 9).cast(DECC)
                    ).cast("double")
                    / F.count(F.lit(1)),
                    9,
                ).alias("m")
            )
            .groupBy("cluster")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, m))),"
                    " s -> s.m)"
                ).alias("cvec")
            )
        )
        cent = broadcast(upd)

    final = _assign(cent)
    cvecs = cent.select("cluster", F.col("cvec").alias("_fc"))
    return (
        final.join(broadcast(cvecs), "cluster")
        .withColumn("cosine", F.round(cosine_expr("vec", "_fc"), 6))
        .select("vec_id", "cluster", "cosine")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/ab_r11b.json")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from fuel_spark import ml as ml_mod
    from fuel_spark.ops import dedup as dedup_mod
    from fuel_spark.ops import sketch as sketch_mod
    from fuel_spark.session import get_spark

    spark = get_spark("ab-r11b",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    new_impl = {
        "cc": dedup_mod.connected_components,
        "theta": sketch_mod.theta_set_ops_certificate,
        "kmeans": ml_mod.kmeans_fixed,
    }
    old_impl = {"cc": cc_old, "theta": theta_old, "kmeans": kmeans_old}
    qs = entry.queries()

    def force(df):
        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("chk")).collect()

    def quiesce():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def run(qname, impl):
        dedup_mod.connected_components = impl["cc"]
        sketch_mod.theta_set_ops_certificate = impl["theta"]
        ml_mod.kmeans_fixed = impl["kmeans"]
        quiesce()
        t0 = time.perf_counter()
        force(qs[qname](spark, args.sf_dir))
        return round(time.perf_counter() - t0, 3)

    queries = ["linkage_pipeline", "sketch_theta_set_ops",
               "embedding_kmeans_fixed"]
    if args.only:
        queries = [args.only]
    results = {}
    for qname in queries:
        run(qname, new_impl)  # warmup
        res = {"old": [], "new": []}
        for rep in range(args.reps):
            for label, impl in (("old", old_impl), ("new", new_impl)):
                spark.sparkContext.setJobDescription(
                    f"ab {qname} {label} r{rep}")
                res[label].append(run(qname, impl))
            print(f"{qname} rep{rep}: old={res['old'][-1]}"
                  f" new={res['new'][-1]}", flush=True)
        results[qname] = res

    for m, f in new_impl.items():
        pass
    dedup_mod.connected_components = new_impl["cc"]
    sketch_mod.theta_set_ops_certificate = new_impl["theta"]
    ml_mod.kmeans_fixed = new_impl["kmeans"]
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
