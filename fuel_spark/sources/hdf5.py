"""HDF5 → parquet migration bridge.

The reference stores every dataset as HDF5: converters fill 2-D
arrays under named nodes (``fuel/converters/base.py`` fill_hdf5_file)
and H5PYDataset reads them back with a split dict in
``attrs['split']`` (``fuel/datasets/hdf5.py:95``, create_split_array
:235).  A fuel user migrates by converting each .hdf5 file to parquet
once; from then on every fuel_spark operator applies.

h5py is not installed in this build container, so the reader is
gated behind an import-try (the conversion logic itself is plain
chunked iteration and is exercised by a skip-marked test wherever
h5py exists).  Conversion is driver-side by design: HDF5 is not a
splittable format Spark executors can scan, so the one-time bridge
streams bounded row-chunks through ``createDataFrame`` and appends
them to a parquet dataset that *is* distributed from then on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _require_h5py():
    try:
        import h5py
    except ImportError as e:  # pragma: no cover - h5py absent here
        raise ImportError(
            "hdf5_to_parquet requires h5py (not installed in this "
            "environment); run the conversion where h5py is available "
            "— the resulting parquet is what the engine consumes"
        ) from e
    return h5py


def hdf5_to_parquet(
    spark: SparkSession,
    h5_path: str,
    out_path: str,
    sources: list[str] | None = None,
    chunk_rows: int = 65536,
) -> int:
    """Convert a fuel-style HDF5 file into one parquet dataset.

    Each HDF5 node becomes a column; rows are streamed in
    ``chunk_rows`` slices so peak driver memory is one chunk
    regardless of file size.  Multi-dimensional sources flatten to
    nested list columns (fuel's (n, …) example-major layout maps to
    one row per example).  Returns the number of rows written.

    If the file carries H5PYDataset's ``split`` attribute, the named
    ranges are also written to ``<out_path>_splits.parquet`` with
    columns (split, source, start, stop) so :class:`SplitDataset`
    ranges reproduce fuel's named splits exactly.
    """
    h5py = _require_h5py()
    import pandas as pd

    with h5py.File(h5_path, "r") as f:
        names = sources or [k for k in f.keys() if hasattr(f[k], "shape")]
        if not names:
            raise ValueError(f"no datasets found in {h5_path}")
        n = f[names[0]].shape[0]
        for name in names:
            if f[name].shape[0] != n:
                raise ValueError(
                    f"source {name!r} has {f[name].shape[0]} rows, expected {n}"
                )
        total = 0
        for start in range(0, n, chunk_rows):
            stop = min(start + chunk_rows, n)
            cols = {}
            for name in names:
                block = f[name][start:stop]
                if getattr(block, "ndim", 1) > 1:
                    cols[name] = [row.tolist() for row in block]
                else:
                    cols[name] = block.tolist()
            pdf = pd.DataFrame(cols)
            mode = "overwrite" if start == 0 else "append"
            spark.createDataFrame(pdf).write.mode(mode).parquet(out_path)
            total += stop - start

        split_attr = f.attrs.get("split")
        if split_attr is not None:
            rows = []
            for entry in split_attr:
                # create_split_array (reference fuel/datasets/hdf5.py:235)
                # writes 7 fields; two change the meaning of (start, stop):
                # available=False marks a placeholder (no data for this
                # split/source pair) and a non-null `indices` reference
                # means the subset is an explicit index list, NOT a range.
                # Writing either as a plain (start, stop) row would
                # silently corrupt the migrated split.
                fields = getattr(getattr(entry, "dtype", None), "names", None) or ()
                if "available" in fields and not bool(entry["available"]):
                    continue
                idx_list = None
                if "indices" in fields:
                    ref = entry["indices"]
                    if ref:  # null h5py.Reference is falsy
                        idx_list = [int(i) for i in f[ref][()]]
                rows.append(
                    (
                        _to_str(entry["split"]),
                        _to_str(entry["source"]),
                        int(entry["start"]),
                        int(entry["stop"]),
                        idx_list,
                    )
                )
            spark.createDataFrame(
                rows,
                "split string, source string, start bigint, stop bigint, "
                "indices array<bigint>",
            ).write.mode("overwrite").parquet(out_path + "_splits.parquet")
    return total


def _to_str(v) -> str:
    return v.decode() if isinstance(v, bytes) else str(v)


def split_dataset_from_hdf5_splits(
    df: DataFrame, splits_df: DataFrame, order_key: str, source: str | None = None
):
    """Rehydrate a :class:`SplitDataset` from a converted splits table
    (the H5PYDataset split dict, reference fuel/datasets/hdf5.py:130
    get_all_splits).  Range rows become range splits; rows carrying an
    ``indices`` list (H5PYDataset's indices-reference form) become
    index splits, preserving the reference's exact subset semantics.
    The splits table is tiny metadata, so the collect is bounded."""
    from fuel_spark.sources.splits import SplitDataset

    ds = SplitDataset(df, order_key)
    has_indices = "indices" in splits_df.columns
    for r in splits_df.collect():
        if source is not None and r.source != source:
            continue
        if has_indices and r.indices is not None:
            ds.add_index_split(r.split, [int(i) for i in r.indices])
        else:
            ds.add_split(r.split, int(r.start), int(r.stop))
    return ds
