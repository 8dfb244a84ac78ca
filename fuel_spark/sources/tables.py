"""Parquet star-schema loader for the benchmark tables.

The Spark-native replacement for fuel's file-backed datasets
(``fuel/datasets/hdf5.py:95`` H5PYDataset et al.): columnar files read
lazily, with column pruning and predicate pushdown reaching the scan.
"""

from __future__ import annotations

import os

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
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register: bool = False
) -> dict[str, DataFrame]:
    """Load the full star schema; optionally register temp views for SQL."""
    tables = {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
    if register:
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
    return tables
