"""Interleaved A/B for the two r10 quiesced-rep regressions
(VERDICT r10 next-round item 1): isolate the session-wide
``preferSortMergeJoin=false`` flip from the connected-components
``isEmpty()`` convergence check on ``linkage_pipeline`` and
``sketch_theta_set_ops``.

Variants (one process, round-robin interleaved, best-of-N):
  A  r10 code           (SHJ pref on,  isEmpty)
  B  minus SHJ pref     (SMJ default,  isEmpty)
  C  minus isEmpty      (SHJ pref on,  count()==0)
  D  both reverted      (SMJ default,  count()==0)

sketch_theta_set_ops has no CC on its path, so it runs A/B only.
``preferSortMergeJoin`` is a runtime SQL conf (toggled per rep);
the count() variant monkeypatches ``dedup.connected_components``
with a copy whose ONLY diff is the convergence action.

Usage: python tools/ab_linkage_theta.py [--reps 7] [--out FILE]
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


def cc_count_variant(pairs, id_a="id_a", id_b="id_b", max_iter=50,
                     checkpoint_interval=3):
    """connected_components with the pre-r10 count()==0 convergence
    check; everything else byte-identical to ops.dedup."""
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
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "v")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select("v", "component")
    finally:
        edges.unpersist()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/ab_linkage_theta.json")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from fuel_spark import session as fsession
    from fuel_spark.ops import dedup as dedup_mod
    from fuel_spark.session import get_spark

    assert (
        fsession.DEFAULT_CONF["spark.sql.join.preferSortMergeJoin"] == "false"
    ), "expected r10 session default"

    spark = get_spark("ab-linkage-theta",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    cc_orig = dedup_mod.connected_components
    qs = entry.queries()

    def force(df):
        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("chk")).collect()

    def quiesce():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def run(qname: str, shj: bool, isempty: bool) -> float:
        spark.conf.set("spark.sql.join.preferSortMergeJoin",
                       "false" if shj else "true")
        dedup_mod.connected_components = cc_orig if isempty else cc_count_variant
        quiesce()
        t0 = time.perf_counter()
        force(qs[qname](spark, args.sf_dir))
        return round(time.perf_counter() - t0, 3)

    # (name, shj_pref, isempty)
    variants = {
        "A_r10": (True, True),
        "B_noSHJ": (False, True),
        "C_noIsEmpty": (True, False),
        "D_neither": (False, False),
    }
    plan = {
        "linkage_pipeline": ["A_r10", "B_noSHJ", "C_noIsEmpty", "D_neither"],
        "sketch_theta_set_ops": ["A_r10", "B_noSHJ"],
    }
    results: dict[str, dict[str, list[float]]] = {}
    for qname, vnames in plan.items():
        spark.sparkContext.setJobDescription(f"ab warmup {qname}")
        run(qname, *variants[vnames[0]])  # warmup
        res = {v: [] for v in vnames}
        for rep in range(args.reps):
            for v in vnames:
                spark.sparkContext.setJobDescription(
                    f"ab {qname} {v} rep{rep}")
                res[v].append(run(qname, *variants[v]))
            print(f"{qname} rep{rep}: "
                  + " ".join(f"{v}={res[v][-1]}" for v in vnames),
                  flush=True)
        results[qname] = res

    dedup_mod.connected_components = cc_orig
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
