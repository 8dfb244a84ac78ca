"""Named splits over a dataset — analogue of H5PYDataset's split dict
(reference ``fuel/datasets/hdf5.py:95``, ``create_split_array`` :235).

fuel stores (split, source, start, stop, indices) ranges inside the
HDF5 file; here a split is a *predicate over a deterministic row
index*, so selecting a split is a filter Catalyst can push down, and
the split definition scales to any table size (no driver-side index
arrays).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, Window


class SplitDataset:
    """A DataFrame plus named row-range splits.

    Ranges are interpreted against ``row_number() - 1`` ordered by
    ``order_key`` — the distributed, reproducible equivalent of fuel's
    positional ``subset`` slices.  For scale, prefer key-hash splits
    (:meth:`add_hash_split`) which need no global sort.
    """

    def __init__(self, df: DataFrame, order_key: str):
        self.df = df
        self.order_key = order_key
        self._range_splits: dict[str, tuple[int, int]] = {}
        self._hash_splits: dict[str, Column] = {}
        self._index_splits: dict[str, DataFrame] = {}

    def add_split(self, name: str, start: int, stop: int) -> "SplitDataset":
        """Positional split [start, stop) — H5PYDataset semantics."""
        self._range_splits[name] = (start, stop)
        return self

    def add_index_split(self, name: str, keys) -> "SplitDataset":
        """Non-contiguous key-list split — H5PYDataset's ``indices``
        subsets (reference fuel/datasets/hdf5.py:235 create_split_array
        ``indices`` field; fuel/utils/__init__.py:30 Subset list-based
        fancy indexing).

        ``keys`` is a Python sequence of key values or a single-column
        DataFrame of them.  Membership is a broadcast semi-join
        against the keys table — the key set stays one small relation
        (never a giant ``isin`` literal in the plan), and a key table
        too large to broadcast still works as a plain semi-join.
        """
        if isinstance(keys, DataFrame):
            keys_df = keys.select(F.col(keys.columns[0]).alias(self.order_key))
        else:
            key_type = self.df.schema[self.order_key].dataType.simpleString()
            keys_df = self.df.sparkSession.createDataFrame(
                [(k,) for k in keys], f"{self.order_key} {key_type}"
            )
        self._index_splits[name] = keys_df
        return self

    def add_hash_split(
        self, name: str, seed: int, lo: float, hi: float
    ) -> "SplitDataset":
        """Scale path: membership by deterministic hash bucket of the key
        — no global sort, stable under growth/repartitioning."""
        bucket = (
            F.abs(F.xxhash64(F.col(self.order_key), F.lit(seed))) % 10000
        ) / 10000.0
        self._hash_splits[name] = (bucket >= lo) & (bucket < hi)
        return self

    @property
    def splits(self) -> tuple[str, ...]:
        return (
            tuple(self._range_splits)
            + tuple(self._hash_splits)
            + tuple(self._index_splits)
        )

    def get_split(self, name: str) -> DataFrame:
        if name in self._index_splits:
            return self.df.join(
                F.broadcast(self._index_splits[name]), self.order_key, "semi"
            )
        if name in self._hash_splits:
            return self.df.where(self._hash_splits[name])
        start, stop = self._range_splits[name]
        # positions from the parallel partition-offset scheme — a
        # global row_number window would single-task the whole dataset
        # (fuel's (start, stop) ranges address the full corpus)
        from fuel_spark.ops.core import with_positions

        return (
            with_positions(self.df, self.order_key, pos_col="__pos", base=0)
            .where((F.col("__pos") >= start) & (F.col("__pos") < stop))
            .drop("__pos")
        )
