"""In-memory datasets — analogue of fuel's IterableDataset /
IndexableDataset (reference ``fuel/datasets/base.py:244`` and ``:316``).

fuel keeps indexables as driver-side dicts of arrays; here small
in-memory data becomes a distributed DataFrame immediately, so the
same transformer chain applies whether the source is a literal list or
a 100 TB parquet lake.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def from_rows(
    spark: SparkSession,
    data: Iterable[Mapping] | Iterable[Sequence],
    schema=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Create a DataFrame from driver-side rows (dicts or tuples).

    ``schema`` may be a DDL string ("a bigint, b string") or StructType.
    Use only for test fixtures / small lookup data — real inputs come
    from :mod:`fuel_spark.sources.tables`.
    """
    df = spark.createDataFrame(list(data), schema=schema)
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    return df
