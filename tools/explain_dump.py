"""Dump .explain("formatted") for bench headliners (or named queries).

Usage: python tools/explain_dump.py OUTDIR [suffix] [query ...]

Writes OUTDIR/<query>_<suffix>.txt (suffix defaults to "before").
Plans are captured lazily (no execution), so this is cheap and does
not need a quiet machine.  The streaming special-case has no batch
plan; it is skipped.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = sys.argv[3:]

    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from fuel_spark.session import get_spark

    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("fuel_spark-explain",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entry_mod.queries()
    names = only or [n for n in bench_mod.HEADLINERS if n in qs]
    for name in names:
        if name == "curation_pipeline_noprepass":
            fn = lambda s, d: entry_mod.q_curation_pipeline(
                s, d, prededup_exact=False)
        elif name not in qs:
            print(f"skip {name} (not a batch registry query)")
            continue
        else:
            fn = qs[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # pragma: no cover - capture tool
            plan = f"EXPLAIN FAILED: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, Exchange x{n_ex} -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
