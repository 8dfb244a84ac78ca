"""JSON-lines corpus ingestion — the de-facto LLM training-data
interchange format (one JSON document per line, sharded into many
files).

The reference ingests text corpora line-by-line on the driver
(fuel/datasets/text.py:7 TextFile); at 100 TB the corpus must be read
as a distributed scan with an EXPLICIT schema — schema inference runs
a full extra pass over every byte, so it is opt-in here, never the
default.  Corrupt lines land in a quarantine column instead of
failing the job (PERMISSIVE mode), which is what a multi-TB ingest
needs: bad shards are diagnosed from the quarantine count, not from a
dead pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Distributed JSONL read with a pinned schema.

    ``keep_corrupt=True`` retains the quarantine column so callers can
    split good rows from bad (``corrupt_split``); otherwise malformed
    lines are dropped after counting them is the caller's job.
    """
    full_schema = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def corrupt_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a ``keep_corrupt=True`` read into (good, quarantined).

    Spark forbids plans whose only referenced column from a raw JSON
    scan is the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — e.g.
    ``bad.count()``; its documented remedy is caching the parsed scan,
    applied here.  At 100 TB prefer materializing the split once to
    storage (``write_dataset``) over relying on executor cache; the
    quarantine side keeps the full row — partially-parsed fields are
    the diagnostic.
    """
    df = df.cache()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull())
    return good, bad


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write a corpus back out as sharded JSONL (one file per
    partition — size shards with ``partitions`` or upstream
    repartition; at scale prefer maxRecordsPerFile on the writer)."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    keep_corrupt: bool = False,
    delimiter: str = ",",
    header: bool = True,
) -> DataFrame:
    """Distributed CSV/TSV read with a pinned schema and the same
    quarantine contract as :func:`read_jsonl_corpus` — crawl dumps
    and vendor feeds arrive as delimited text as often as JSONL, and
    the malformed-row story must be identical (PERMISSIVE parse,
    corrupt rows into a side column, ``corrupt_split`` to fork them).

    ``multiLine`` stays off: single-line records keep the file
    splittable, so a 1 TB CSV scans at cluster width instead of one
    task per file.
    """
    full_schema = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )
    if keep_corrupt:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
