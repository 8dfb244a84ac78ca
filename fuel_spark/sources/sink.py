"""Dataset sinks — the write side of the engine.

fuel's converters (reference ``fuel/converters/``) materialize
datasets into HDF5 files on one machine; the Spark-native sink is a
partitioned parquet dataset: hive-partitioned by low-cardinality
columns for partition pruning, optionally bucketed by join key so
downstream joins skip their shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Write a parquet dataset laid out for 100 TB reads.

    - ``partition_by``: hive partitioning on low-cardinality columns
      (date, language, source shard) → downstream filters prune whole
      directories before any IO.
    - ``max_records_per_file`` bounds file sizes so a single file never
      exceeds one task's memory budget; combined with zstd (session
      default) this lands near the 128 MB–1 GB sweet spot.
    """
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 64,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table: joins/aggs keyed on
    ``bucket_col`` read co-located buckets and skip their Exchange —
    the storage-level answer to repeated fact⋈fact joins.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name, format="parquet")


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 8,
    target_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet laid out on a Z-order (Morton) curve over
    ``zorder_by`` — multi-column data skipping: row-group/file min-max
    stats stay narrow on EVERY curve column at once, so selective
    filters on any of them prune most files before IO (a plain sort
    gives that for its leading column only).

    In-plan fit: one approx-percentile pass per column yields
    ``2^bits`` equal-frequency rank buckets (broadcast 1-row cutpoint
    relation, no driver round-trip); the Z value interleaves the
    bucket bits JVM-side; one range shuffle on Z + in-partition sort
    orders the write.  Columns must be numeric (cast timestamps to
    epoch first).
    """
    from pyspark.sql import functions as F

    m = len(zorder_by)
    if m == 0:
        raise ValueError("zorder_by must name at least one column")
    probs = ", ".join(str(i / (1 << bits)) for i in range(1, 1 << bits))
    cuts = df.agg(
        *[
            F.expr(f"approx_percentile({c}, array({probs}), 1000)").alias(f"_cuts_{i}")
            for i, c in enumerate(zorder_by)
        ]
    )
    d = df.crossJoin(F.broadcast(cuts))
    for i, c in enumerate(zorder_by):
        d = d.withColumn(
            f"_rank_{i}",
            F.size(F.filter(f"_cuts_{i}", lambda x: x <= F.col(c))).cast("long"),
        )
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i in range(m):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col(f"_rank_{i}"), j).bitwiseAND(F.lit(1)),
                    j * m + i,
                )
            )
    d = d.withColumn("_z", z).drop(
        *[f"_cuts_{i}" for i in range(m)], *[f"_rank_{i}" for i in range(m)]
    )
    n = target_partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        d.repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_dataset(
    spark,
    path_in: str,
    path_out: str,
    target_mb: int = 256,
    mode: str = "overwrite",
) -> int:
    """Rewrite a parquet directory into ~``target_mb`` files — the
    small-file compaction pass every long-lived ingest needs (streams
    and per-batch writes accrete kilobyte files; each costs a task +
    a footer read forever after).

    Sizing uses the Hadoop FileSystem listing (driver-side metadata
    only, no data read); the rewrite itself is one round-robin
    repartition.  Returns the output file count."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path_in)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n = max(1, int(total // (target_mb * 1024 * 1024)) + (1 if total % (target_mb * 1024 * 1024) else 0))
    spark.read.parquet(path_in).repartition(n).write.mode(mode).parquet(path_out)
    return n


def upsert_dataset(
    spark,
    new_rows: DataFrame,
    path: str,
    key_cols: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """Key-based upsert into an existing parquet dataset: rows whose
    keys match are REPLACED by the new version, unmatched old rows
    survive, unmatched new rows append — the maintenance write behind
    ``corpus_diff``'s changed+added feed (without a table format,
    parquet upsert is a rewrite; with Delta/Iceberg in the
    environment, swap this for MERGE INTO — the call-site contract is
    identical).

    The rewrite stages to ``<path>__staging`` first and swaps only
    after a successful write: the old dataset is renamed aside to
    ``<path>__old``, the staging dir renamed into place, and only
    then is the old copy deleted — so a crash at ANY step leaves a
    complete dataset on disk (at ``path`` or, in the one-rename crash
    window, at ``path__old``; never neither, which a naive
    rmtree-then-rename swap cannot guarantee).  On entry the swap
    state is first repaired: if ``path__old`` exists WITHOUT ``path``
    (crash inside the one-rename window), the aside copy is renamed
    back into place before any read or delete — it is the only
    surviving copy at that point.  Cost: one left_anti
    of old against the (typically small, broadcastable) new key set +
    one full rewrite of surviving rows — at 100 TB prefer hive
    partitioning on ``partition_by`` and upsert partition-aligned
    batches so only touched partitions rewrite.

    LOCAL PATHS ONLY: the swap uses os.rename/shutil, so ``path``
    must be a local filesystem path.  Object-store URIs (s3://,
    hdfs://) are rejected up front — on those, use a table format
    (Delta/Iceberg MERGE INTO) whose commit protocol provides the
    same atomicity.
    """
    import os
    import shutil

    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"upsert_dataset swaps via os.rename and supports only local "
            f"paths; got {path!r} — use a table format (MERGE INTO) on "
            f"object stores"
        )
    path = path.removeprefix("file://")
    staging = path + "__staging"
    old_aside = path + "__old"
    if os.path.exists(old_aside):
        if not os.path.exists(path):
            # Crash landed between rename(path, old_aside) and
            # rename(staging, path): old_aside holds the ONLY complete
            # copy.  Restore it before anything else — deleting it
            # here (the pre-r6 behavior) would destroy the dataset and
            # silently rewrite it as just new_rows.
            os.rename(old_aside, path)
        else:
            # path is complete; old_aside is a superseded leftover
            shutil.rmtree(old_aside)
    if os.path.exists(path):
        old = spark.read.parquet(path)
        keys = new_rows.select(*key_cols).distinct()
        survivors = old.join(keys, key_cols, "left_anti")
        merged = survivors.unionByName(new_rows)
    else:
        merged = new_rows
    write_dataset(merged, staging, partition_by=partition_by)
    if os.path.exists(path):
        os.rename(path, old_aside)
    os.rename(staging, path)
    if os.path.exists(old_aside):
        shutil.rmtree(old_aside)


def dataset_fingerprint(df: DataFrame) -> DataFrame:
    """Order-insensitive content fingerprint of a DataFrame: one row
    with the row count and the SUM (mod 2^64) of per-row xxhash64
    over every column — a content-addressable dataset identity for
    cache keys, cross-cluster regression checks, or post-migration
    verification.

    Guarantee direction: equal multiset of rows ⇒ equal fingerprint
    (the converse is only probabilistic — 64-bit collisions exist, so
    a match certifies identity with error ≈ 2^-64, it does not prove
    it).  Sum, not xor: a plain xor of row hashes cancels any
    even-multiplicity row, so e.g. {A,A,B} and {C,C,B} would collide
    deterministically; modular sum keeps every multiplicity
    contribution distinct.

    One map-side-combinable agg; + is commutative/associative, so the
    fingerprint is independent of partitioning and row order — the
    same identity on any cluster.  The per-row hash is accumulated in
    DECIMAL(38,0) (exact up to ~10^38, i.e. ≥10^18 rows before any
    precision question) and reduced mod 2^64 at the end; fingerprint
    is returned as DECIMAL(20,0) in [0, 2^64).
    """
    from pyspark.sql import functions as F

    # 2^64 exceeds py4j's long, so spell it as a SQL DECIMAL literal
    two64 = F.expr("CAST(18446744073709551616 AS DECIMAL(38,0))")
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.pmod(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")), two64
        ).cast("decimal(20,0)").alias("fingerprint"),
    )


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
) -> DataFrame:
    """Row-level diff of two dataset snapshots keyed on ``id_col``:
    per id, status ``added`` (only in b), ``removed`` (only in a),
    ``changed`` (both, any shared non-id column differs under
    null-safe equality), ``unchanged``.  The companion to
    :func:`dataset_fingerprint` — the fingerprint says WHETHER two
    snapshots differ; this says WHERE, without hashing (column
    comparison is exact, including array columns, so embedding
    re-encodes are caught element-for-element).

    One id-keyed full-outer shuffle join, then a per-row CASE — no
    window, no collect; at 100 TB both sides bucket/partition by the
    id and AQE picks the join.  Columns are compared by NAME over the
    intersection of the two schemas (minus the id), so a snapshot
    that gained a column diffs on the shared ones.

    Output: id, status — feed to groupBy(status).count() for the
    summary, or join back by id for the changed-row payloads.
    """
    from pyspark.sql import functions as F

    shared = [c for c in a.columns if c in set(b.columns) and c != id_col]
    la = a.select(
        F.col(id_col).alias("_ida"),
        *[F.col(c).alias(f"_a_{c}") for c in shared],
    )
    lb = b.select(
        F.col(id_col).alias("_idb"),
        *[F.col(c).alias(f"_b_{c}") for c in shared],
    )
    j = la.join(lb, la["_ida"] == lb["_idb"], "full_outer")
    same = F.lit(True)
    for c in shared:
        same = same & F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
    return j.select(
        F.coalesce(F.col("_ida"), F.col("_idb")).alias(id_col),
        F.when(F.col("_ida").isNull(), F.lit("added"))
        .when(F.col("_idb").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def shard_manifest(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    content_cols: list[str] | None = None,
    seed: int | str = "man7",
) -> DataFrame:
    """Per-shard publication manifest — the verification artifact a
    1000-executor writer publishes beside its output so every
    downstream consumer (or a re-run) can check a shard without
    re-reading its neighbors: shard id (portable md5-mod of the
    distribution key), row count, and an ORDER-INDEPENDENT content
    checksum (per-row md5-derived 31-bit value summed exactly in
    DECIMAL(38,0), reduced mod 2^31 once — the
    :func:`dataset_fingerprint` overflow discipline, so the checksum
    is identical on any cluster and any partitioning).  The manifest
    is the shard-grain version of :func:`dataset_fingerprint`
    (one row per shard instead of one per dataset): a re-crawl that
    changed only shard 17 is visible without a corpus-wide diff.

    ``content_cols`` should be integer/string columns (the default is
    every non-float column): float columns format differently across
    engines/locales and belong in a rounded projection first.

    One map-side-combinable aggregation keyed on the shard id — at
    100 TB each task contributes ≤ n_shards partial rows.

    Output: shard, n_rows, checksum.
    """
    from pyspark.sql import functions as F

    from fuel_spark.functions import hash_mod

    if content_cols is None:
        content_cols = [
            c for c, t in df.dtypes
            if t in ("bigint", "int", "smallint", "tinyint", "string",
                     "boolean", "date")
        ]
    payload = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in content_cols]
    )
    two31 = F.lit(1 << 31).cast("decimal(38,0)")
    return (
        df.select(
            hash_mod(seed, F.col(key_col), n_shards).alias("shard"),
            hash_mod(f"{seed}c", payload, 1 << 31).alias("_chk"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.pmod(F.sum(F.col("_chk").cast("decimal(38,0)")), two31)
            .cast("bigint")
            .alias("checksum"),
        )
    )
