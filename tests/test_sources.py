"""Sources: splits, toys, text corpus ingestion."""

import pytest

from fuel_spark.sources import SplitDataset, from_rows, spiral, swiss_roll


def test_split_ranges(spark):
    df = from_rows(spark, [(i,) for i in range(50)], schema="k bigint")
    ds = (
        SplitDataset(df, "k")
        .add_split("train", 0, 40)
        .add_split("valid", 40, 50)
    )
    assert set(ds.splits) == {"train", "valid"}
    assert ds.get_split("train").count() == 40
    valid = sorted(r.k for r in ds.get_split("valid").collect())
    assert valid == list(range(40, 50))


def test_hash_split_disjoint_cover(spark):
    df = from_rows(spark, [(i,) for i in range(200)], schema="k bigint")
    ds = (
        SplitDataset(df, "k")
        .add_hash_split("train", seed=3, lo=0.0, hi=0.8)
        .add_hash_split("valid", seed=3, lo=0.8, hi=1.0)
    )
    tr = {r.k for r in ds.get_split("train").collect()}
    va = {r.k for r in ds.get_split("valid").collect()}
    assert tr | va == set(range(200))
    assert not (tr & va)


def test_spiral_deterministic(spark):
    a = spiral(spark, 100, classes=2, noise=0.1, seed=5).collect()
    b = spiral(spark, 100, classes=2, noise=0.1, seed=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    labels = {r.label for r in a}
    assert labels == {0, 1}


def test_read_text_lines(spark, tmp_path):
    from fuel_spark.sources import read_text_lines

    p = tmp_path / "corpus.txt"
    p.write_text("hello world\nsecond line\n")
    df = read_text_lines(spark, str(p))
    assert df.columns == ["line"]
    assert sorted(r.line for r in df.collect()) == ["hello world", "second line"]


def test_swiss_roll_shape(spark):
    rows = swiss_roll(spark, 50, seed=1).collect()
    assert len(rows) == 50
    assert all(hasattr(r, c) for r in rows[:1] for c in ("x", "y", "z", "t"))


def test_index_split_list_and_dataframe(spark):
    df = from_rows(spark, [(i, i * 10) for i in range(20)], schema="k bigint, v bigint")
    ds = SplitDataset(df, "k")
    ds.add_index_split("picked", [3, 7, 11, 99])  # 99 absent: semi-join ignores
    got = sorted(r.k for r in ds.get_split("picked").collect())
    assert got == [3, 7, 11]
    # DataFrame-of-keys form (the 100 TB path: keys live in storage)
    keys_df = from_rows(spark, [(7,), (11,)], schema="key bigint")
    ds.add_index_split("picked2", keys_df)
    assert sorted(r.k for r in ds.get_split("picked2").collect()) == [7, 11]
    assert set(ds.splits) >= {"picked", "picked2"}


def test_hdf5_bridge_gated_without_h5py(spark, tmp_path):
    try:
        import h5py  # noqa: F401
        have = True
    except ImportError:
        have = False
    from fuel_spark.sources import hdf5 as h5mod

    if not have:
        import pytest as _pytest

        with _pytest.raises(ImportError, match="h5py"):
            h5mod.hdf5_to_parquet(spark, "/nonexistent.h5", str(tmp_path / "o"))
        return
    # real roundtrip when h5py exists: 2-D features + 1-D targets + splits
    import numpy as np

    p = str(tmp_path / "ds.h5")
    with h5py.File(p, "w") as f:
        f["features"] = np.arange(20, dtype="float64").reshape(10, 2)
        f["targets"] = np.arange(10, dtype="int64")
        dt = h5py.special_dtype(vlen=bytes)
        split = np.array(
            [(b"train", b"features", 0, 8), (b"test", b"features", 8, 10)],
            dtype=[("split", dt), ("source", dt), ("start", "<i8"), ("stop", "<i8")],
        )
        f.attrs["split"] = split
    out = str(tmp_path / "out")
    n = h5mod.hdf5_to_parquet(spark, p, out, chunk_rows=4)
    assert n == 10
    df = spark.read.parquet(out)
    assert df.count() == 10 and set(df.columns) == {"features", "targets"}
    splits = spark.read.parquet(out + "_splits.parquet")
    ds = h5mod.split_dataset_from_hdf5_splits(df, splits, "targets")
    assert ds.get_split("train").count() == 8
    assert ds.get_split("test").count() == 2


def test_hdf5_distributed_bridge(spark, tmp_path):
    """Executor-parallel tier: gated without h5py; where h5py exists,
    the manifest → mapInPandas path must roundtrip identically to the
    driver-side tier (same rows, same splits metadata)."""
    from fuel_spark.sources import hdf5 as h5mod

    try:
        import h5py
    except ImportError:
        import pytest as _pytest

        with _pytest.raises(ImportError, match="h5py"):
            h5mod.hdf5_to_parquet_distributed(
                spark, "/nonexistent.h5", str(tmp_path / "o")
            )
        return
    import numpy as np

    p = str(tmp_path / "ds.h5")
    with h5py.File(p, "w") as f:
        f["features"] = np.arange(20, dtype="float64").reshape(10, 2)
        f["targets"] = np.arange(10, dtype="int64")
    out = str(tmp_path / "out_dist")
    n = h5mod.hdf5_to_parquet_distributed(spark, p, out, chunk_rows=3)
    assert n == 10
    df = spark.read.parquet(out)
    assert df.count() == 10 and set(df.columns) == {"features", "targets"}
    assert sorted(r.targets for r in df.collect()) == list(range(10))


def test_hdf5_spark_type_mapping():
    """Pure dtype → (DDL, conversion-mode) mapping, testable without
    h5py for all non-object dtypes."""
    import numpy as np

    from fuel_spark.sources.hdf5 import _node_conversion

    assert _node_conversion(np.dtype("int32"), 1) == ("bigint", "plain")
    assert _node_conversion(np.dtype("float32"), 2) == ("array<double>", "nested")
    assert _node_conversion(np.dtype("uint8"), 3) == (
        "array<array<bigint>>", "nested"
    )
    assert _node_conversion(np.dtype("bool"), 1) == ("boolean", "plain")
    assert _node_conversion(np.dtype("S8"), 1) == ("string", "str")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported"):
        _node_conversion(np.dtype("complex64"), 1)


def test_hdf5_vlen_dtype_mapping():
    """h5py vlen dtypes (numpy object dtype underneath) must map to
    array<base> with per-element conversion, NOT stringify to numpy
    reprs; vlen str stays a string column.  h5py-gated."""
    h5py = pytest.importorskip("h5py")
    import numpy as np

    from fuel_spark.sources.hdf5 import _node_conversion

    assert _node_conversion(h5py.vlen_dtype(np.dtype("float64")), 1) == (
        "array<double>", "vlen"
    )
    assert _node_conversion(h5py.vlen_dtype(np.dtype("int32")), 1) == (
        "array<bigint>", "vlen"
    )
    assert _node_conversion(h5py.string_dtype(), 1) == ("string", "str")
    with pytest.raises(ValueError, match="unsupported"):
        _node_conversion(np.dtype("O"), 1)  # plain object: not vlen


def test_split_rehydrate_honors_indices_rows(spark):
    """Splits-table rows carrying an ``indices`` list (H5PYDataset's
    indices-reference form, reference fuel/datasets/hdf5.py:235) must
    rehydrate as index splits — not be misread as (start, stop)
    ranges, which for such rows hold a meaningless [0, 0)."""
    from fuel_spark.sources import hdf5 as h5mod

    df = from_rows(spark, [(i,) for i in range(10)], schema="k bigint")
    splits = from_rows(
        spark,
        [("train", "k", 0, 8, None), ("picked", "k", 0, 0, [2, 5, 9])],
        schema="split string, source string, start bigint, stop bigint, "
               "indices array<bigint>",
    )
    ds = h5mod.split_dataset_from_hdf5_splits(df, splits, "k")
    assert ds.get_split("train").count() == 8
    assert sorted(r.k for r in ds.get_split("picked").collect()) == [2, 5, 9]


def test_read_text_corpus_gzip_transparent(spark, tmp_path):
    """Plain and gzipped shards read through ONE distributed scan
    (fuel/utils/formats.py:10 open_ parity: .gz is transparent)."""
    import gzip

    (tmp_path / "a.txt").write_text("alpha\nbravo\n")
    with gzip.open(tmp_path / "b.txt.gz", "wt") as f:
        f.write("charlie\ndelta\necho\n")
    from fuel_spark.sources import read_text_corpus

    df = read_text_corpus(spark, str(tmp_path))
    rows = df.collect()
    assert {r.value for r in rows} == {
        "alpha", "bravo", "charlie", "delta", "echo"
    }
    by_file = {}
    for r in rows:
        by_file.setdefault(r.source_file.rsplit("/", 1)[-1], set()).add(r.value)
    assert by_file["b.txt.gz"] == {"charlie", "delta", "echo"}

    with_ids = read_text_corpus(spark, str(tmp_path), line_ids=True).collect()
    gz = sorted(
        (r.line_id, r.value)
        for r in with_ids
        if r.source_file.endswith("b.txt.gz")
    )
    assert gz == [(0, "charlie"), (1, "delta"), (2, "echo")]


def test_read_text_corpus_wholetext(spark, tmp_path):
    import gzip

    with gzip.open(tmp_path / "doc.txt.gz", "wt") as f:
        f.write("line one\nline two\n")
    from fuel_spark.sources import read_text_corpus

    rows = read_text_corpus(spark, str(tmp_path), wholetext=True).collect()
    assert len(rows) == 1 and rows[0].value == "line one\nline two\n"


def test_read_tar_corpus_members_and_quarantine(spark, tmp_path):
    """tar + tar.gz archives unpack on executors; a binary member
    quarantines instead of failing the scan (PERMISSIVE semantics,
    fuel/utils/formats.py:31 tar_open parity)."""
    import tarfile

    def add(tf, name, data: bytes):
        import io as _io

        info = tarfile.TarInfo(name)
        info.size = len(data)
        tf.addfile(info, _io.BytesIO(data))

    with tarfile.open(tmp_path / "one.tar", "w") as tf:
        add(tf, "docs/a.txt", b"hello tar")
        add(tf, "docs/bad.bin", b"\xff\xfe\x00binary")
    with tarfile.open(tmp_path / "two.tar.gz", "w:gz") as tf:
        add(tf, "b.txt", b"hello targz")

    from fuel_spark.sources import quarantine_split, read_tar_corpus

    df = read_tar_corpus(spark, str(tmp_path / "*.tar*"))
    good, bad = quarantine_split(df)
    got = {(r.member, r.text) for r in good.collect()}
    assert got == {("docs/a.txt", "hello tar"), ("b.txt", "hello targz")}
    quarantined = bad.collect()
    assert len(quarantined) == 1
    assert quarantined[0].member == "docs/bad.bin"
    assert "bad text" in quarantined[0].error


def test_read_tar_corpus_corrupt_archive_quarantines(spark, tmp_path):
    (tmp_path / "broken.tar").write_bytes(b"this is not a tar archive")
    from fuel_spark.sources import read_tar_corpus

    rows = read_tar_corpus(spark, str(tmp_path / "broken.tar")).collect()
    assert len(rows) == 1
    assert rows[0].member is None and "bad archive" in rows[0].error


def test_orc_roundtrip_partition_pruning_and_schema(spark, tmp_path):
    """ORC tier: hive-partitioned roundtrip preserves rows; the scan
    prunes partitions AND the read schema exactly like the parquet
    path (the 100 TB layout contract is format-independent)."""
    from fuel_spark.sources.formats import read_orc_dataset, write_orc_dataset

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_orc")
    write_orc_dataset(d, path, partition_by=["lang"])
    back = read_orc_dataset(spark, path)
    assert back.count() == d.count()
    assert set(back.columns) == set(d.columns)
    ex = back.where(back.lang == "en").select("doc_id")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in ex
    read_schema = ex.split("ReadSchema:")[1].split("\n")[0]
    assert "text" not in read_schema  # column pruning reaches the scan
