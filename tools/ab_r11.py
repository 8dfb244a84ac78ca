"""Round-11 interleaved A/B harness (VERDICT r10 item 1 follow-up).

Variants, monkeypatched per rep in one process, round-robin:

linkage_pipeline:
  A_r10      SHJ pref, isEmpty() convergence        (shipped r10)
  C_count    SHJ pref, count()==0 convergence       (r9 check)
  S_sum      SHJ pref, decimal-sum convergence      (no join, no waves)
  B_smj      SMJ default, isEmpty()                 (r10 minus SHJ)

sketch_theta_set_ops:
  A_r10      shipped r10 (9-branch union; est/exact replayed per op)
  T_fix      explode-of-struct: one evaluation per pair, thetas ckpt

Usage: python tools/ab_r11.py [--reps 7] [--out FILE] [--only Q]
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


# ---------------------------------------------------------------- CC variants
def _cc_body(pairs, id_a, id_b, max_iter, checkpoint_interval, check):
    """connected_components with a pluggable convergence check.
    check(new_labels, labels, state) -> (converged: bool, state)."""
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
    state = None
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
            converged, state = check(new_labels, labels, state)
            labels.unpersist()
            labels = new_labels
            if converged:
                break
        return labels.select("v", "component")
    finally:
        edges.unpersist()


def _check_isempty(new_labels, labels, state):
    return (
        new_labels.alias("n")
        .join(labels.alias("o"), "v")
        .where(F.col("n.component") != F.col("o.component"))
        .isEmpty()
    ), state


def _check_count(new_labels, labels, state):
    return (
        new_labels.alias("n")
        .join(labels.alias("o"), "v")
        .where(F.col("n.component") != F.col("o.component"))
        .count()
    ) == 0, state


def _check_sum(new_labels, labels, state):
    if state is None:  # first iteration: seed with the old frame's sum
        state = labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("_s")
        ).collect()[0][0]
    new_sum = new_labels.agg(
        F.sum(F.col("component").cast("decimal(38,0)")).alias("_s")
    ).collect()[0][0]
    return new_sum == state, new_sum


def cc_isempty(pairs, id_a="id_a", id_b="id_b", max_iter=50,
               checkpoint_interval=3):
    return _cc_body(pairs, id_a, id_b, max_iter, checkpoint_interval,
                    _check_isempty)


def cc_count(pairs, id_a="id_a", id_b="id_b", max_iter=50,
             checkpoint_interval=3):
    return _cc_body(pairs, id_a, id_b, max_iter, checkpoint_interval,
                    _check_count)


def cc_sum(pairs, id_a="id_a", id_b="id_b", max_iter=50,
           checkpoint_interval=3):
    return _cc_body(pairs, id_a, id_b, max_iter, checkpoint_interval,
                    _check_sum)


# ---------------------------------------------------------------- theta fix
def theta_fixed(df, group_col, key_col, pairs, k=32, seed=7):
    """theta_set_ops_certificate with the per-pair replay removed:
    thetas lazily checkpointed (tiny, referenced 2x per pair) and the
    3 set-op rows exploded from ONE struct array over the single
    est+exact row, so the estimate subtree is evaluated once per pair
    instead of once per (pair, op)."""
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
    ).localCheckpoint(eager=False)
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

        def op_struct(op):
            est_c = F.col(f"est_{op}")
            ex_c = F.col(f"exact_{op}").cast("bigint")
            return F.struct(
                F.lit(op).alias("set_op"),
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

        rows = joined.select(
            F.lit(a).alias("group_a"),
            F.lit(b).alias("group_b"),
            F.col("theta"),
            F.explode(F.array(
                op_struct("union"),
                op_struct("intersection"),
                op_struct("a_not_b"),
            )).alias("_s"),
        ).select(
            "group_a", "group_b",
            F.col("_s.set_op").alias("set_op"),
            "theta",
            F.col("_s.est").alias("est"),
            F.col("_s.exact").alias("exact"),
            F.col("_s.rel_err").alias("rel_err"),
        )
        out = rows if out is None else out.unionByName(rows)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/ab_r11.json")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from fuel_spark.ops import dedup as dedup_mod
    from fuel_spark.ops import sketch as sketch_mod
    from fuel_spark.session import get_spark

    spark = get_spark("ab-r11",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    theta_orig = sketch_mod.theta_set_ops_certificate
    qs = entry.queries()

    def force(df):
        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("chk")).collect()

    def quiesce():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def run(qname, shj, cc_fn, theta_fn):
        spark.conf.set("spark.sql.join.preferSortMergeJoin",
                       "false" if shj else "true")
        dedup_mod.connected_components = cc_fn
        sketch_mod.theta_set_ops_certificate = theta_fn
        quiesce()
        t0 = time.perf_counter()
        force(qs[qname](spark, args.sf_dir))
        return round(time.perf_counter() - t0, 3)

    variants = {
        "A_r10": (True, cc_isempty, theta_orig),
        "C_count": (True, cc_count, theta_orig),
        "S_sum": (True, cc_sum, theta_orig),
        "B_smj": (False, cc_isempty, theta_orig),
        "T_fix": (True, cc_isempty, theta_fixed),
    }
    plan = {
        "linkage_pipeline": ["A_r10", "C_count", "S_sum", "B_smj"],
        "sketch_theta_set_ops": ["A_r10", "T_fix"],
    }
    if args.only:
        plan = {args.only: plan[args.only]}
    results = {}
    for qname, vnames in plan.items():
        run(qname, *variants[vnames[0]])  # warmup
        res = {v: [] for v in vnames}
        for rep in range(args.reps):
            for v in vnames:
                spark.sparkContext.setJobDescription(f"ab {qname} {v} r{rep}")
                res[v].append(run(qname, *variants[v]))
            print(f"{qname} rep{rep}: "
                  + " ".join(f"{v}={res[v][-1]}" for v in vnames),
                  flush=True)
        results[qname] = res

    dedup_mod.connected_components = cc_isempty
    sketch_mod.theta_set_ops_certificate = theta_orig
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
