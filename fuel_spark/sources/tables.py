"""Parquet star-schema loader for the benchmark tables.

The Spark-native replacement for fuel's file-backed datasets
(``fuel/datasets/hdf5.py:95`` H5PYDataset et al.): columnar files read
lazily, with column pruning and predicate pushdown reaching the scan.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; lazy scan, no materialization.

    ``events.ts`` is TIMESTAMP(NANOS) in the source parquet; Spark
    reads it as int64 ns (legacy.parquet.nanosAsLong) and we truncate
    to microsecond timestamps — the same truncation DuckDB applies, so
    the oracle agrees.
    """
    # Defensive: the caller's session may not be ours (driver harness).
    # Both confs are runtime-settable and define engine semantics:
    # ns-timestamp ingestion and UTC determinism.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) source read via nanosAsLong.  Exact
            # integer division: floor(col/1000) goes through a
            # double, and epoch-nanosecond magnitudes (~1.7e18) exceed
            # 2^53, so the bigint->double cast can round by ~±100ns
            # and floor to the wrong microsecond at boundaries.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # µs timestamps without isAdjustedToUTC read as
            # TIMESTAMP_NTZ under inferTimestampNTZ (Spark 4 default).
            # Normalize to session-local (UTC-pinned above) timestamps
            # so epoch casts/window arithmetic behave identically
            # across source flavors; wall-clock values are unchanged.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


class Tables(Mapping):
    """Lazy star schema: each table's parquet footer is read on first
    access only.  A query touching 2 of 10 tables pays 2 schema
    reads, not 10 — measurable per-query setup savings for the
    correctness/bench harnesses, zero semantic difference."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._cache:
            if name not in TABLE_NAMES:
                raise KeyError(name)
            self._cache[name] = load_table(self._spark, self._sf_dir, name)
        return self._cache[name]

    def __iter__(self):
        return iter(TABLE_NAMES)

    def __len__(self):
        return len(TABLE_NAMES)


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register: bool = False
) -> Mapping:
    """Lazy star schema mapping; optionally register temp views (which
    forces loading every table)."""
    tables = Tables(spark, sf_dir)
    if register:
        for name in TABLE_NAMES:
            tables[name].createOrReplaceTempView(name)
    return tables
