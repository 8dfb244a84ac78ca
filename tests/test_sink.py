import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from fuel_spark.sources import from_rows
from fuel_spark.sources.sink import write_bucketed_table, write_dataset


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="fuel_spark_sink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_write_partitioned_dataset_prunes(spark, outdir):
    df = from_rows(
        spark,
        [(i, "en" if i % 2 else "fr", float(i)) for i in range(100)],
        schema="k bigint, lang string, v double",
    )
    path = os.path.join(outdir, "ds")
    write_dataset(df, path, partition_by=["lang"])
    assert os.path.isdir(os.path.join(path, "lang=en"))
    back = spark.read.parquet(path).where(F.col("lang") == "en")
    assert back.count() == 50
    # partition pruning: only the lang=en directory is scanned
    scan = back._jdf.queryExecution().executedPlan().toString()
    assert "lang=fr" not in scan


def test_bucketed_table_join_skips_shuffle(spark, outdir):
    # managed tables land in the session's spark-warehouse dir
    # (warehouse.dir is a static conf); tables are dropped in finally
    df = from_rows(
        spark, [(i, float(i)) for i in range(1000)], schema="k bigint, v double"
    )
    write_bucketed_table(df, "t_bucketed_a", "k", num_buckets=4)
    write_bucketed_table(df, "t_bucketed_b", "k", num_buckets=4)
    a = spark.table("t_bucketed_a")
    b = spark.table("t_bucketed_b").withColumnRenamed("v", "v2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() == 1000
        # co-located buckets: the join needs no Exchange at all
        assert "Exchange" not in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")
