"""Compressed text-corpus ingestion: gzip shards and tar archives.

Completes the reference's format-utility surface
(fuel/utils/formats.py:10 ``open_`` — gzip-aware text open — and
:31 ``tar_open``) at cluster scale: gzip text goes through Spark's
NATIVE per-file codec (``spark.read.text`` decompresses ``.gz``
transparently, so the read is a plain distributed scan); tar archives
are read as binary files and unpacked on the EXECUTORS with an
Arrow-batched ``mapInPandas`` — one task per archive, members
streamed from the in-memory archive bytes, never through the driver.

Scale notes, stated because they are the contract:

- gzip is not a splittable codec: each ``.gz`` shard is one task.
  That is the standard sharded-corpus layout (thousands of ~100 MB
  shards); one giant ``.gz`` file serializes the scan and should be
  re-sharded first.
- each tar archive is materialized in executor memory once
  (binaryFile semantics), so archives should be sized like gzip
  shards (100 MB-class).  Parallelism is across archives.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

TAR_SCHEMA = "archive string, member string, text string, error string"


def read_text_corpus(
    spark: SparkSession,
    path: str,
    wholetext: bool = False,
    line_ids: bool = False,
) -> DataFrame:
    """Distributed line-per-document text read, gzip-transparent.

    The TextFile analogue (fuel/datasets/text.py:7 reads line by line
    on the driver; fuel/utils/formats.py:10 ``open_`` adds gzip) —
    here one distributed scan whose per-file decompression Spark
    handles natively.  ``wholetext=True`` yields one row per FILE
    instead of per line (document-per-file corpora).

    Output: ``value`` (the line/file text) plus ``source_file``.
    ``line_ids=True`` adds a 0-based ``line_id`` unique within each
    file — OPT-IN because it costs one hash shuffle of the corpus
    keyed by file (balanced: one key per shard, no hub key, and the
    window is per-file, never global); within a non-splittable ``.gz``
    shard the monotonic id order equals file order, so the ids are
    stable line numbers.
    """
    df = spark.read.text(path, wholetext=wholetext)
    df = df.withColumn("source_file", F.input_file_name())
    if wholetext or not line_ids:
        return df
    from pyspark.sql import Window

    w = Window.partitionBy("source_file").orderBy(
        F.monotonically_increasing_id()
    )
    return df.withColumn(
        "line_id", (F.row_number().over(w) - F.lit(1)).cast("bigint")
    )


def read_tar_corpus(
    spark: SparkSession,
    path: str,
    encoding: str = "utf-8",
    on_error: str = "quarantine",
) -> DataFrame:
    """Distributed tar/tar.gz text-archive read (the ``tar_open``
    analogue).  ``path`` globs tar files; each archive is unpacked on
    an executor via an Arrow-batched ``mapInPandas`` over the binary
    payloads (``tarfile`` auto-detects gzip/bz2/xz with ``r:*``).

    One output row per regular member: archive path, member name,
    decoded text, and ``error`` (NULL on success).  Undecodable
    members and corrupt archives land as quarantine rows
    (``error`` set, ``text`` NULL) instead of failing the scan —
    PERMISSIVE-mode semantics, matching ``read_jsonl_corpus``;
    ``on_error='fail'`` raises instead.
    """
    if on_error not in ("quarantine", "fail"):
        raise ValueError(f"on_error must be quarantine|fail, got {on_error!r}")
    binary = spark.read.format("binaryFile").load(path)

    def unpack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: list[tuple] = []
            for arc_path, payload in zip(pdf["path"], pdf["content"]):
                try:
                    tf = tarfile.open(fileobj=io.BytesIO(bytes(payload)), mode="r:*")
                except tarfile.TarError as e:
                    if on_error == "fail":
                        raise
                    out.append((arc_path, None, None, f"bad archive: {e}"))
                    continue
                with tf:
                    for member in tf.getmembers():
                        if not member.isreg():
                            continue
                        raw = tf.extractfile(member).read()
                        try:
                            out.append(
                                (arc_path, member.name, raw.decode(encoding), None)
                            )
                        except UnicodeDecodeError as e:
                            if on_error == "fail":
                                raise
                            out.append(
                                (arc_path, member.name, None, f"bad text: {e}")
                            )
            yield pd.DataFrame(
                out, columns=["archive", "member", "text", "error"]
            )

    return binary.select("path", "content").mapInPandas(unpack, TAR_SCHEMA)


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a :func:`read_tar_corpus` frame into (good, quarantined)."""
    return (
        df.where(F.col("error").isNull()).drop("error"),
        df.where(F.col("error").isNotNull()),
    )


def write_orc_dataset(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Write an ORC dataset — the columnar alternative for Hive/Trino
    estates standardized on ORC rather than parquet (same hive
    partition-pruning layout contract as
    :func:`fuel_spark.sources.sink.write_dataset`).  ORC support is
    built into Spark's JVM; no extra package.
    """
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc_dataset(spark, path: str) -> DataFrame:
    """Read an ORC dataset with the same predicate-pushdown/column-
    pruning behavior as the parquet path (Spark's OrcScan supports
    PushedFilters and ReadSchema pruning identically)."""
    return spark.read.orc(path)
