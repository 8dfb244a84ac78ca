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


def test_zorder_write_narrows_minmax_on_both_columns(spark, outdir):
    """Z-order promise: per-file min-max stays narrow on EVERY curve
    column; a plain sort narrows only its leading column."""
    import glob

    import pyarrow.parquet as pq

    rng_rows = [
        (i, float((i * 7919) % 1000), float((i * 104729) % 1000))
        for i in range(20000)
    ]
    df = from_rows(spark, rng_rows, schema="k bigint, u double, v double")
    from fuel_spark.sources.sink import write_zordered

    zpath = os.path.join(outdir, "zorder")
    write_zordered(df, zpath, ["u", "v"], bits=8, target_partitions=16)
    spath = os.path.join(outdir, "plain_sort")
    df.repartitionByRange(16, "u").sortWithinPartitions("u").write.parquet(spath)

    def avg_ranges(path):
        ru, rv, n = 0.0, 0.0, 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.read_metadata(f)
            lo_u = min(md.row_group(g).column(1).statistics.min for g in range(md.num_row_groups))
            hi_u = max(md.row_group(g).column(1).statistics.max for g in range(md.num_row_groups))
            lo_v = min(md.row_group(g).column(2).statistics.min for g in range(md.num_row_groups))
            hi_v = max(md.row_group(g).column(2).statistics.max for g in range(md.num_row_groups))
            ru += hi_u - lo_u
            rv += hi_v - lo_v
            n += 1
        return ru / n / 1000.0, rv / n / 1000.0  # fraction of global range

    zu, zv = avg_ranges(zpath)
    su, sv = avg_ranges(spath)
    # plain sort: u razor-thin, v spans most of the range
    assert su < 0.2 and sv > 0.6
    # z-order: BOTH columns well under the full range, and v
    # materially narrower than the plain sort leaves it
    assert zu < 0.6 and zv < 0.6
    assert zv < sv - 0.2
    # round-trips all rows
    assert spark.read.parquet(zpath).count() == 20000


def test_compact_dataset_reduces_file_count(spark, outdir):
    from fuel_spark.sources.sink import compact_dataset

    df = from_rows(
        spark, [(i, float(i)) for i in range(5000)], schema="k bigint, v double"
    )
    src = os.path.join(outdir, "fragmented")
    df.repartition(64).write.parquet(src)
    import glob

    assert len(glob.glob(os.path.join(src, "*.parquet"))) == 64
    dst = os.path.join(outdir, "compacted")
    compact_dataset(spark, src, dst, target_mb=256)
    out_files = glob.glob(os.path.join(dst, "*.parquet"))
    assert len(out_files) == 1
    back = spark.read.parquet(dst)
    assert back.count() == 5000
    assert back.agg(F.sum("k")).collect()[0][0] == sum(range(5000))


def test_upsert_dataset_replace_keep_append(spark, tmp_path):
    from fuel_spark.sources.sink import upsert_dataset

    path = str(tmp_path / "ds")
    base = from_rows(
        spark,
        [(1, "old-1"), (2, "old-2"), (3, "old-3")],
        schema="k bigint, v string",
    )
    upsert_dataset(spark, base, path, ["k"])  # initial create
    delta = from_rows(
        spark,
        [(2, "new-2"), (9, "new-9")],
        schema="k bigint, v string",
    )
    upsert_dataset(spark, delta, path, ["k"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "old-1", 2: "new-2", 3: "old-3", 9: "new-9"}
    import os

    assert not os.path.exists(path + "__staging")
    assert not os.path.exists(path + "__old")


def test_upsert_dataset_rejects_object_store_uris(spark):
    import pytest

    from fuel_spark.sources.sink import upsert_dataset

    df = from_rows(spark, [(1, "x")], schema="k bigint, v string")
    with pytest.raises(ValueError, match="local"):
        upsert_dataset(spark, df, "s3://bucket/ds", ["k"])


def test_upsert_dataset_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between rename-aside and rename-into-place leaves the
    dataset at path__old; the next upsert must clear the leftover and
    still land the merge correctly."""
    import os

    from fuel_spark.sources.sink import upsert_dataset

    path = str(tmp_path / "ds")
    base = from_rows(spark, [(1, "a")], schema="k bigint, v string")
    upsert_dataset(spark, base, path, ["k"])
    os.makedirs(path + "__old")  # simulate debris from a crashed swap
    delta = from_rows(spark, [(2, "b")], schema="k bigint, v string")
    upsert_dataset(spark, delta, path, ["k"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b"}
    assert not os.path.exists(path + "__old")


def test_upsert_dataset_restores_old_aside_when_path_missing(spark, tmp_path):
    """The one-rename crash window: a crash BETWEEN rename(path, __old)
    and rename(staging, path) leaves the only complete dataset at
    __old and nothing at path.  The next upsert must restore __old as
    the base (NOT delete it — pre-r6 that rmtree silently reduced the
    dataset to just new_rows) and then merge normally."""
    import os
    import shutil

    from fuel_spark.sources.sink import upsert_dataset

    path = str(tmp_path / "ds")
    base = from_rows(spark, [(1, "a"), (2, "b")], schema="k bigint, v string")
    upsert_dataset(spark, base, path, ["k"])
    # simulate the mid-swap crash: the real data sits ONLY at __old
    os.rename(path, path + "__old")
    assert not os.path.exists(path)
    delta = from_rows(spark, [(2, "B"), (3, "c")], schema="k bigint, v string")
    upsert_dataset(spark, delta, path, ["k"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    # old row 1 must SURVIVE (it lived only in __old), key 2 replaced
    assert got == {1: "a", 2: "B", 3: "c"}
    assert not os.path.exists(path + "__old")
    shutil.rmtree(path, ignore_errors=True)


def test_dataset_fingerprint_order_invariant_and_sensitive(spark):
    from fuel_spark.sources.sink import dataset_fingerprint

    a = from_rows(spark, [(1, "x"), (2, "y"), (3, "z")], schema="k bigint, v string")
    b = from_rows(spark, [(3, "z"), (1, "x"), (2, "y")], schema="k bigint, v string").repartition(3)
    fa = dataset_fingerprint(a).first()
    fb = dataset_fingerprint(b).first()
    assert (fa.n_rows, fa.fingerprint) == (fb.n_rows, fb.fingerprint)
    c = from_rows(spark, [(1, "x"), (2, "y"), (3, "Z")], schema="k bigint, v string")
    fc = dataset_fingerprint(c).first()
    assert fc.fingerprint != fa.fingerprint


def test_dataset_fingerprint_even_multiplicity_not_cancelled(spark):
    """A xor-based fingerprint deterministically collides on any
    even-multiplicity row swap ({A,A,B} vs {C,C,B} both reduce to
    hash(B)); the modular-sum fingerprint must distinguish them, and
    must still see multiplicity ({A,B} vs {A,A,B})."""
    from fuel_spark.sources.sink import dataset_fingerprint

    aab = from_rows(spark, [(1, "A"), (1, "A"), (2, "B")], schema="k bigint, v string")
    ccb = from_rows(spark, [(3, "C"), (3, "C"), (2, "B")], schema="k bigint, v string")
    ab = from_rows(spark, [(1, "A"), (2, "B")], schema="k bigint, v string")
    f_aab = dataset_fingerprint(aab).first()
    f_ccb = dataset_fingerprint(ccb).first()
    f_ab = dataset_fingerprint(ab).first()
    assert f_aab.n_rows == f_ccb.n_rows
    assert f_aab.fingerprint != f_ccb.fingerprint
    assert f_aab.fingerprint != f_ab.fingerprint
    # in range [0, 2^64)
    assert 0 <= int(f_aab.fingerprint) < 2 ** 64


def test_snapshot_diff_statuses_and_nullsafe(spark):
    """Every status on one tiny pair of snapshots: added / removed /
    changed (array element change AND scalar change) / unchanged —
    and a NULL compared against NULL is unchanged (null-safe
    equality, where a plain = would make it 'changed')."""
    from fuel_spark.sources.sink import snapshot_diff

    schema = "id bigint, v array<float>, tag string"
    a = from_rows(
        spark,
        [
            (1, [1.0, 2.0], "x"),
            (2, [3.0, 4.0], None),
            (3, [5.0, 6.0], "z"),
            (4, [7.0, 8.0], "w"),
        ],
        schema=schema,
    )
    b = from_rows(
        spark,
        [
            (1, [1.0, 2.5], "x"),   # array element changed
            (2, [3.0, 4.0], None),  # unchanged (NULL == NULL null-safely)
            (4, [7.0, 8.0], "W"),   # scalar changed
            (5, [9.0, 0.0], "n"),   # added
        ],                           # id 3 removed
        schema=schema,
    )
    got = {r.id: r.status for r in snapshot_diff(a, b, "id").collect()}
    assert got == {
        1: "changed", 2: "unchanged", 3: "removed",
        4: "changed", 5: "added",
    }


def test_snapshot_diff_compares_shared_columns_only(spark):
    """A snapshot that gained a column diffs on the shared ones: same
    shared values read unchanged even though B carries an extra
    column."""
    from fuel_spark.sources.sink import snapshot_diff

    a = from_rows(spark, [(1, "t")], schema="id bigint, v string")
    b = from_rows(
        spark, [(1, "t", 9)], schema="id bigint, v string, extra int"
    )
    assert snapshot_diff(a, b, "id").first().status == "unchanged"


def test_shard_manifest_order_invariant_and_sensitive(spark):
    """The manifest is identical under any row order/partitioning and
    changes when exactly one shard's content changes — only that
    shard's row differs."""
    from fuel_spark.sources.sink import shard_manifest

    rows = [(i, f"v{i % 7}") for i in range(200)]
    a = from_rows(spark, rows, schema="k bigint, v string")
    b = from_rows(spark, list(reversed(rows)),
                  schema="k bigint, v string").repartition(7)
    ma = {r.shard: (r.n_rows, r.checksum)
          for r in shard_manifest(a, "k", 8).collect()}
    mb = {r.shard: (r.n_rows, r.checksum)
          for r in shard_manifest(b, "k", 8).collect()}
    assert ma == mb and len(ma) == 8

    # mutate one row -> only its shard's checksum moves, counts hold
    c = a.withColumn(
        "v", F.when(F.col("k") == 5, F.lit("CHANGED")).otherwise(F.col("v"))
    )
    mc = {r.shard: (r.n_rows, r.checksum)
          for r in shard_manifest(c, "k", 8).collect()}
    diff = [s for s in ma if ma[s] != mc[s]]
    assert len(diff) == 1
    assert all(ma[s][0] == mc[s][0] for s in ma)
