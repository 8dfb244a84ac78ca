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
