"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": "..."}

Each query is forced end-to-end with a checksum action —
``bit_xor(xxhash64(*all_columns))`` — so every projected column must
be computed.  (A bare ``df.count()`` lets Catalyst prune projected
columns that don't affect cardinality, so projection-only queries
would time the scan, not the expression work.)  A warmup pass primes
the JVM/codegen caches; reported numbers are the best of ``--reps``
timed runs per query (steady-state throughput, the number that
scales), with every rep recorded in a ``spreads`` map so a noisy
shared VM is distinguishable from a plan regression.
``shared16_subtotal`` is the round-over-round regression-gate number
(the 16 headliners every round since r2 has run) written as one field
so the gate reads it directly instead of re-summing.

The stdout line is deliberately COMPACT (totals + per-query bests, no
spreads): BENCH_r05.json came back ``parsed: null`` because the
spreads map pushed the one-line artifact past the capture buffer.
The FULL result including spreads is written to ``--out``
(default ``bench_full.json``, committed alongside).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINERS = (
    "pricing_summary",
    "revenue_forecast",
    "top_revenue_orders",
    "regional_revenue",
    "market_share",
    "events_tumbling_window",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_pairs",
    "text_quality",
    "text_token_counts",
    "ann_topk_cosine",
    "asof_join",
    "dedup_ngram_spans",
    "text_unigram_logprob",
    "events_funnel",
    # the flagship LLM path, timed end-to-end (not just its stages)
    "dedup_apply",
    "curation_pipeline",
    # round-3 additions: LM-prep chunking + PQ ANN with rerank
    "text_chunk_documents",
    "ann_pq",
    # round-3 continuation: non-equi range join, segment dedup, DSIR
    "events_range_join",
    "dedup_segments",
    "text_dsir_weights",
    "events_engagement",
    # late-r3: parallel-ntile decile ranking + the basket self-join
    "events_pareto_share",
    "basket_part_pairs",
    # round-4 additions: sparse TF-IDF similarity join, segment-dedup
    # apply tier, matryoshka cascade, attribution via window count
    "text_similar_docs",
    "dedup_apply_segments",
    "ann_matryoshka",
    "events_attribution_linear",
    # one real Structured Streaming run (availableNow), special-cased
    "streaming_screen_availablenow",
    # r5: the r3-plan curation reference (prededup_exact=False),
    # special-cased — NOT a registry query; exists so the trend table
    # separates the documented pre-pass cost from noise
    "curation_pipeline_noprepass",
    # r5 headliners: the round's flagship ops
    "dedup_substring_spans",
    "text_bpe_encode",
    "pretrain_pipeline",
    # late-r5 headliners: PassJoin edit-distance join, HITS, spherical
    # k-means, TextRank — the session's fixed-iteration/blocking ops
    "dedup_edit_distance",
    "graph_hits_fixed",
    "embedding_kmeans_fixed",
    "text_textrank_keywords",
    # session-3 r5 headliners: association rules (exchange-reuse pair
    # plan), the parallel-cumsum ABC classifier, fixed-iteration
    # logistic GD, weekly PSI drift (graph_link_prediction is NOT
    # here by design: its wedge volume is answer-sized — 30-60s at
    # sf0.1 — and belongs to the 10x smoke, not the per-round bench)
    "basket_association_rules",
    "part_abc_classification",
    "events_logistic_fixed",
    "events_psi_weekly",
    # r6 headliners: the pivot-LSH search and the unrolled fixed-k MMR
    # (both oracle-checked; the round's certificate additions)
    "ann_lsh_pivot",
    "ann_mmr_fixed",
    # r7 headliners: the incremental-dedup lifecycle composition (the
    # round's flagship composite) and the quantile-sketch certificate
    # (the mergeable-sketch family's representative)
    "incremental_dedup_pipeline",
    "sketch_quantile_value",
    # late-r7 headliners: the linkage lifecycle composite (the
    # session's flagship family) and the theta set-operation
    # certificates (the KMV tier's representative)
    "linkage_pipeline",
    "sketch_theta_set_ops",
    # second-session r7 headliners: the layout data-skipping
    # certificate (the round's 100 TB-layout story) and the k-center
    # coreset (the unrolled-selection family's representative)
    "layout_zorder_certificate",
    "sample_kcenter",
)

# The regression-gate set: the 16 headliners benched every round since
# r2 (SURVEY §6.1 trend table).  Gate: subtotal must not regress r3's
# 12.32s beyond shared-VM noise.
SHARED16 = (
    "pricing_summary", "revenue_forecast", "top_revenue_orders",
    "regional_revenue", "market_share", "events_tumbling_window",
    "events_sessionize", "dedup_exact", "dedup_minhash_pairs",
    "text_quality", "text_token_counts", "ann_topk_cosine", "asof_join",
    "dedup_ngram_spans", "text_unigram_logprob", "events_funnel",
)


def bench_streaming_screen(spark, sf_dir: str) -> float:
    """One availableNow streaming run, wall-clock: the near-dup screen
    of the documents corpus (file-source micro-batches) against its
    own frozen MinHash band index — B stream-static joins, zero
    streaming state, parquet sink with checkpoint.  This is the
    production shape for screening new crawl data against a frozen
    deduplicated corpus."""
    import shutil
    import tempfile

    from fuel_spark.ops.dedup import with_minhash_bands
    from fuel_spark.streaming import serve as sserve

    src = os.path.join(sf_dir, "documents.parquet")
    docs = spark.read.parquet(src).select("doc_id", "text")
    index = with_minhash_bands(docs, "doc_id", "text").select(
        "band_id", "band_key")
    work = tempfile.mkdtemp(prefix="fuel_spark_bench_stream_")
    try:
        # the file source needs a DIRECTORY; the testdata table is a
        # single parquet file — stage it behind a symlink dir
        src_dir = os.path.join(work, "src")
        os.makedirs(src_dir)
        os.symlink(src, os.path.join(src_dir, "documents.parquet"))
        t0 = time.perf_counter()
        stream = spark.readStream.schema(docs.schema).parquet(src_dir)
        clean = sserve.near_dup_stream(stream, index)
        q = (
            clean.writeStream.format("parquet")
            .option("path", os.path.join(work, "sink"))
            .option("checkpointLocation", os.path.join(work, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        q.stop()  # fully quiesce the streaming engine (no task races)
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json"),
        help="side file for the FULL result (incl. per-rep spreads); "
        "the stdout line stays compact so artifact capture never "
        "truncates the gate fields (BENCH_r05 lesson).  The default "
        "path is gitignored scratch (the driver's per-round run lands "
        "there without dirtying the tree — the r6 VERDICT ownership "
        "fix); committed quiesced readings are explicit snapshots "
        "named bench_full_r{N}.json")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from fuel_spark.session import get_spark

    spark = get_spark("fuel_spark-bench",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # The quiesce()'s System.gc() lets ContextCleaner reap accumulators
    # of already-collected jobs while their straggler tasks (running
    # past a collect's early exit) are still completing; each such
    # completion logs a benign ERROR 'attempted to access non-existent
    # accumulator' stack trace from DAGScheduler — thousands per run,
    # and the last few land in the captured artifact tail ahead of the
    # stdout JSON line (BENCH_r04/r06).  Every real failure we care
    # about surfaces as a Python exception from collect(), not via this
    # logger, so turn exactly this one logger off for the bench process.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.OFF,
        )
    except Exception:
        pass  # log4j internals moved: cosmetic guard only, keep benching

    SPECIAL = ("streaming_screen_availablenow", "curation_pipeline_noprepass")
    # Load-aware start (VERDICT r8 ask #4, budget raised per r9 ask
    # #4): three rounds running, the driver's bench artifact ran on a
    # hot shared VM (+12-16% vs the quiesced snapshots with zero plan
    # changes) and one 90s wait against an all-day-hot host did
    # nothing.  Retry budget is now up to 6 waits with exponential
    # backoff (90/150/240/300/300/300s ≈ 23 min worst case) — if the
    # host quiets at any point we start immediately.  The check runs
    # only at start — once the bench itself is running, our own
    # 32-thread load dominates getloadavg and a per-rep check would
    # self-trigger.
    load_waits = 0
    _backoff = (90, 150, 240, 300, 300, 300)
    while (
        os.getloadavg()[0] / max(os.cpu_count() or 1, 1) > 0.25
        and load_waits < len(_backoff)
    ):
        wait = _backoff[load_waits]
        load_waits += 1
        print(
            f"bench: load_avg {os.getloadavg()[0]:.1f} on "
            f"{os.cpu_count()} cpus — hot machine, waiting {wait}s "
            f"(retry {load_waits}/{len(_backoff)})",
            file=sys.stderr,
        )
        time.sleep(wait)
    qs = entry_mod.queries()
    names = args.queries or [
        n for n in HEADLINERS if n in qs or n in SPECIAL
    ]

    from pyspark.sql import functions as F

    def force(df):
        # checksum over every output column: nothing can be pruned.
        # bit_xor (not sum): summing 64-bit hashes overflows ANSI longs.
        df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("chk")).collect()

    def quiesce():
        # steady-state hygiene between queries: drop cached plans and
        # let the JVM collect shuffle/broadcast debris so query N's
        # garbage doesn't tax query N+1's measurement
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    # Load sentinel (VERDICT r9 ask #3b, the load-robust gate): a
    # FIXED, never-changing scan+hash over lineitem's four key
    # columns, benched in the same process bracketing the query loop.
    # Its plan predates every gated query and never changes, so
    # shared16_subtotal / sentinel_sec normalizes out host contention:
    # a hot VM slows both numerator and denominator, a real plan
    # regression moves only the numerator.  The gate reads the RATIO
    # (reference recorded in bench_quiesced_ref.json) instead of
    # trusting the wall-clock on a machine state that never occurs.
    def bench_sentinel(n_reps: int = 5) -> float:
        li = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
        cols = ("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        df = li.select(F.bit_xor(F.xxhash64(*cols)).alias("chk"))
        df.collect()  # warmup
        best = float("inf")
        for _ in range(n_reps):
            quiesce()
            t0 = time.perf_counter()
            df.collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    sentinel_pre = bench_sentinel()
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in names:
        if name == "streaming_screen_availablenow":
            quiesce()
            timings[name] = round(bench_streaming_screen(spark, args.sf_dir), 3)
            continue
        if name == "curation_pipeline_noprepass":
            fn = lambda s, d: entry_mod.q_curation_pipeline(
                s, d, prededup_exact=False)
        else:
            fn = qs[name]
        force(fn(spark, args.sf_dir))  # warmup (codegen, scan caches)
        reps = []
        # shared16 is the round-over-round regression gate: two extra
        # reps tighten the best-of-N minimum against shared-VM noise
        # (the r4 gate read +4.5% on evidence the judge called noise —
        # more samples is the honest fix, ~25s extra bench wall)
        n_reps = args.reps + 2 if name in SHARED16 else args.reps
        for _ in range(n_reps):
            quiesce()
            t0 = time.perf_counter()
            force(fn(spark, args.sf_dir))
            reps.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(reps)
        spreads[name] = reps

    sentinel_post = bench_sentinel()
    sentinel = min(sentinel_pre, sentinel_post)
    shared16 = round(sum(timings[n] for n in SHARED16 if n in timings), 3)

    # Self-labeling vs the committed quiesced reference (VERDICT r9
    # ask #4): compare this run's per-query bests against
    # bench_quiesced_ref.json (per-query best-of across the committed
    # quiesced snapshots).  A hot run flags itself with the evidence
    # inline — no forensics needed to read the artifact.
    vs_quiesced = None
    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_quiesced_ref.json")
    try:
        with open(ref_path) as fh:
            ref = json.load(fh)
        ratios = sorted(
            timings[n] / ref["queries"][n]
            for n in timings
            if n in ref.get("queries", {}) and ref["queries"][n] > 0
        )
        if ratios:
            med = ratios[len(ratios) // 2]
            p90 = ratios[min(len(ratios) - 1, int(len(ratios) * 0.9))]
            vs_quiesced = {
                "n_compared": len(ratios),
                "median_ratio": round(med, 3),
                "p90_ratio": round(p90, 3),
                "ref": ref.get("ref", "?"),
                "hot": bool(med > 1.2),
            }
    except (OSError, ValueError, KeyError, ZeroDivisionError):
        pass  # no reference committed yet — skip self-labeling

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "shared16_subtotal": shared16,
        # load-robust gate fields (VERDICT r9 ask #3b): the fixed
        # sentinel's best and the shared16/sentinel ratio — contention
        # cancels in the ratio, a plan regression does not
        "sentinel_sec": sentinel,
        "sentinel_pre": sentinel_pre,
        "sentinel_post": sentinel_post,
        "shared16_over_sentinel": round(shared16 / sentinel, 2)
        if sentinel > 0 else None,
        "vs_quiesced": vs_quiesced,
        "sf": os.path.basename(args.sf_dir.rstrip("/")),
        # Machine-load context (VERDICT r7 ask #6): the r7 driver
        # reading ran on a hot machine (+12% vs quiesced snapshots
        # with zero plan changes).  Recording the 1/5/15-min load
        # average lets the judge separate "code got slower" from
        # "machine was busy" without re-running anything.
        "load_avg": [round(x, 2) for x in os.getloadavg()],
        "cpus": os.cpu_count(),
        # how many 90s hot-machine waits the load-aware start burned
        # before benching (0 = machine was quiet at launch)
        "load_waits": load_waits,
    }
    # Full result (with the per-rep spreads map) goes to a side file;
    # the stdout line stays compact.  BENCH_r05 lesson: the spreads map
    # pushed the single stdout line past the artifact capture's tail
    # buffer, truncating away shared16_subtotal — the exact field the
    # regression gate reads.  Side file is committed alongside.
    try:
        with open(args.out, "w") as fh:
            json.dump({**result, "spreads": spreads}, fh, indent=1,
                      sort_keys=True)
            fh.write("\n")
    except OSError as exc:  # never let the side file kill the artifact
        print(f"bench: could not write {args.out}: {exc}", file=sys.stderr)
    line = json.dumps(result)
    # Shut the session down BEFORE printing: a task completing during
    # the clearCache+gc quiesce can race accumulator cleanup and land
    # a benign 'attempted to access non-existent accumulator' trace on
    # stderr AFTER the result (the BENCH_r04 tail).  Stopping first
    # guarantees the JSON line is the artifact's last output.
    # BENCH_r06 showed the race can also fire DURING stop() (a late
    # task completing against the stopping context logs the trace
    # ahead of our print) — every action has already returned and the
    # trace is pure cleanup noise, so turn the JVM logger OFF for the
    # stop window; nothing we want logged can happen after this point.
    try:
        spark.sparkContext.setLogLevel("OFF")
    except Exception:
        pass
    try:
        spark.stop()
    except Exception:
        pass
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
