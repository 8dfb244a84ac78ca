"""Command-line tools — analogue of fuel's bin scripts
(reference ``fuel/bin/fuel_convert.py``, ``fuel_info.py``,
``fuel_download.py``).

fuel converts downloads into HDF5 and prints dataset metadata; here
``convert`` ingests csv/json/text/parquet into a partitioned parquet
dataset (the engine's native store) and ``info`` prints table shapes
for a dataset directory.

Usage:
    python -m fuel_spark info <dir>
    python -m fuel_spark convert --input f.csv --format csv \
        --output out_dir [--partition-by col] [--header]
"""

from __future__ import annotations

import argparse
import glob
import os

from fuel_spark.session import get_spark
from fuel_spark.sources.sink import write_dataset


def cmd_info(args) -> int:
    spark = get_spark("fuel_spark-info")
    spark.sparkContext.setLogLevel("ERROR")
    paths = sorted(glob.glob(os.path.join(args.path, "*.parquet")))
    if os.path.isfile(args.path) or not paths:
        paths = [args.path]
    for p in paths:
        df = spark.read.parquet(p)
        name = os.path.basename(p).replace(".parquet", "")
        cols = ", ".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema)
        print(f"{name}\trows={df.count()}\t{cols}")
    return 0


def cmd_convert(args) -> int:
    spark = get_spark("fuel_spark-convert")
    spark.sparkContext.setLogLevel("ERROR")
    reader = spark.read
    if args.format == "csv":
        df = reader.option("header", str(args.header).lower()).option(
            "inferSchema", "true"
        ).csv(args.input)
    elif args.format == "json":
        df = reader.json(args.input)
    elif args.format == "text":
        df = reader.text(args.input).withColumnRenamed("value", "line")
    elif args.format == "parquet":
        df = reader.parquet(args.input)
    elif args.format == "hdf5":
        from fuel_spark.sources.hdf5 import hdf5_to_parquet

        rows = hdf5_to_parquet(spark, args.input, args.output)
        print(f"wrote {args.output} ({rows} rows)")
        return 0
    else:
        raise SystemExit(f"unknown format: {args.format}")
    write_dataset(df, args.output, partition_by=args.partition_by or None)
    print(f"wrote {args.output} ({df.count()} rows)")
    return 0


def cmd_profile(args) -> int:
    """Per-column data-quality profile of a parquet table (the
    ``fuel-info`` idea upgraded from shapes to content statistics)."""
    from fuel_spark.ops.profile import profile_columns

    spark = get_spark("fuel_spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.path)
    cols = args.columns or None
    prof = profile_columns(df, cols, exact_distinct=not args.approx)
    for r in prof.collect():
        mean = "" if r.mean is None else f"\tmean={r.mean}"
        print(
            f"{r.column}\trows={r.n_rows}\tnulls={r.n_null}\t"
            f"distinct={r.n_distinct}\tmin={r.min_value}\tmax={r.max_value}{mean}"
        )
    return 0


def cmd_compact(args) -> int:
    """Small-file compaction: rewrite a parquet dir into ~target-mb
    files (metadata-only sizing, one repartition pass)."""
    from fuel_spark.sources.sink import compact_dataset

    spark = get_spark("fuel_spark-compact")
    spark.sparkContext.setLogLevel("ERROR")
    n = compact_dataset(spark, args.input, args.output, target_mb=args.target_mb)
    print(f"wrote {args.output} ({n} files)")
    return 0


def cmd_zorder(args) -> int:
    """Rewrite a parquet dir Z-ordered on the given columns for
    multi-column min-max data skipping."""
    from fuel_spark.sources.sink import write_zordered

    spark = get_spark("fuel_spark-zorder")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.input)
    write_zordered(df, args.output, args.by, target_partitions=args.files or None)
    print(f"wrote {args.output} (zorder by {', '.join(args.by)})")
    return 0


def cmd_dedup(args) -> int:
    """End-to-end near-dup dedup of a parquet corpus: exact pre-pass
    → MinHash LSH → jaccard verify → survivor policy → write.  The
    one-command version of the apply_dedup pipeline."""
    from fuel_spark.ops.dedup import apply_dedup
    from fuel_spark.sources.sink import write_dataset

    spark = get_spark("fuel_spark-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.input)
    before = df.count()
    out = apply_dedup(
        df, args.id_col, args.text_col, threshold=args.threshold,
        keep=args.keep, max_bucket=args.max_bucket,
    )
    write_dataset(out, args.output)
    after = spark.read.parquet(args.output).count()
    print(
        f"wrote {args.output} ({after} rows; dropped {before - after} "
        f"near-duplicates at jaccard>={args.threshold}, keep={args.keep})"
    )
    return 0


def cmd_substrdedup(args) -> int:
    """One-command ExactSubstr dedup (Lee et al. 2022): cut every
    >= min-len-word substring duplicated across documents from the
    higher-id doc of its pair, write the cleaned corpus.  The
    substring-granular companion to ``dedup``; run ``dedup`` (exact
    tier) first on twin-heavy corpora (the documented composition)."""
    from fuel_spark.ops.dedup import exact_substring_apply
    from fuel_spark.sources.sink import write_dataset

    spark = get_spark("fuel_spark-substrdedup")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.input)
    out = exact_substring_apply(
        df, args.id_col, args.text_col,
        min_len=args.min_len, seed_k=args.seed_k,
    )
    write_dataset(out, args.output)
    from pyspark.sql import functions as F

    stats = (
        spark.read.parquet(args.output)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_words_removed").alias("cut"),
            F.sum(F.when(F.col("n_words_removed") > 0, 1).otherwise(0))
            .alias("touched"),
        )
        .collect()[0]
    )
    print(
        f"wrote {args.output} ({stats['docs']} docs; cut "
        f"{stats['cut']} duplicated words from {stats['touched']} docs "
        f"at span>={args.min_len})"
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fuel_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_info = sub.add_parser("info", help="print table shapes for a dataset dir")
    p_info.add_argument("path")
    p_info.set_defaults(fn=cmd_info)

    p_conv = sub.add_parser("convert", help="ingest csv/json/text into parquet")
    p_conv.add_argument("--input", required=True)
    p_conv.add_argument("--format", default="csv",
                        choices=["csv", "json", "text", "parquet", "hdf5"])
    p_conv.add_argument("--output", required=True)
    p_conv.add_argument("--partition-by", nargs="*", default=None)
    p_conv.add_argument("--header", action="store_true")
    p_conv.set_defaults(fn=cmd_convert)

    p_prof = sub.add_parser("profile", help="per-column data-quality profile")
    p_prof.add_argument("path")
    p_prof.add_argument("--columns", nargs="*", default=None)
    p_prof.add_argument("--approx", action="store_true",
                        help="approx distinct counts (cheaper at scale)")
    p_prof.set_defaults(fn=cmd_profile)

    p_comp = sub.add_parser("compact", help="compact small parquet files")
    p_comp.add_argument("--input", required=True)
    p_comp.add_argument("--output", required=True)
    p_comp.add_argument("--target-mb", type=int, default=256)
    p_comp.set_defaults(fn=cmd_compact)

    p_z = sub.add_parser("zorder", help="rewrite parquet Z-ordered on columns")
    p_z.add_argument("--input", required=True)
    p_z.add_argument("--output", required=True)
    p_z.add_argument("--by", nargs="+", required=True)
    p_z.add_argument("--files", type=int, default=None)
    p_z.set_defaults(fn=cmd_zorder)

    p_d = sub.add_parser("dedup", help="near-dup dedup a parquet corpus")
    p_d.add_argument("--input", required=True)
    p_d.add_argument("--output", required=True)
    p_d.add_argument("--id-col", default="doc_id")
    p_d.add_argument("--text-col", default="text")
    p_d.add_argument("--threshold", type=float, default=0.8)
    p_d.add_argument("--keep", default="min_id", choices=["min_id", "longest"])
    p_d.add_argument("--max-bucket", type=int, default=512)
    p_d.set_defaults(fn=cmd_dedup)

    p_s = sub.add_parser(
        "substrdedup",
        help="cut cross-document duplicated substrings (ExactSubstr)",
    )
    p_s.add_argument("--input", required=True)
    p_s.add_argument("--output", required=True)
    p_s.add_argument("--id-col", default="doc_id")
    p_s.add_argument("--text-col", default="text")
    p_s.add_argument("--min-len", type=int, default=10)
    p_s.add_argument("--seed-k", type=int, default=5)
    p_s.set_defaults(fn=cmd_substrdedup)

    args = ap.parse_args(argv)
    return args.fn(args)
