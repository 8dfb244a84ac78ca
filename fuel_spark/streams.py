"""DataStream facade — fuel's user-facing iteration API on Spark.

Reference parity: ``fuel/streams.py:122`` DataStream,
``fuel/iterator.py`` DataIterator, epoch semantics of
``AbstractDataStream.iterate_epochs`` (streams.py:104-120).

This is the switch-over surface for a fuel user: wrap any DataFrame,
pick an iteration scheme, and iterate epochs of numpy minibatches —
``next(epoch)`` yields ``{source_name: np.ndarray}`` exactly like
fuel's ``as_dict`` iterators.  Underneath, batch identity is computed
distributed (fuel_spark.schemes) and rows stream to the driver through
``toLocalIterator`` (one partition in flight, Arrow-encoded) — the
training loop consumes 100 TB without the driver ever holding more
than a batch.

Shuffled epochs re-key per epoch (seed + epoch), matching fuel's
fresh-permutation-per-epoch contract without any driver-side index
state.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame

from fuel_spark import schemes


class DataStream:
    """Iterate a DataFrame as epochs of fixed-size numpy minibatches.

    Parameters
    ----------
    df : DataFrame — the dataset; columns are the stream's sources.
    key : str — deterministic ordering key (fuel's example index).
    batch_size : int — examples per minibatch (fuel ConstantScheme).
    shuffled : bool — fresh seeded permutation each epoch
        (fuel ShuffledScheme; reference schemes.py:195).
    seed : int — base seed; epoch ``e`` uses ``seed + e``.
    """

    def __init__(
        self,
        df: DataFrame,
        key: str,
        batch_size: int,
        shuffled: bool = False,
        seed: int = 42,
    ):
        self.df = df
        self.key = key
        self.batch_size = batch_size
        self.shuffled = shuffled
        self.seed = seed
        self._epoch = 0

    @property
    def sources(self) -> tuple[str, ...]:
        return tuple(self.df.columns)

    def _epoch_df(self, epoch: int) -> DataFrame:
        if self.shuffled:
            planned = schemes.shuffled_batches(
                self.df, self.key, self.batch_size, seed=self.seed + epoch
            )
        else:
            planned = schemes.sequential_batches(self.df, self.key, self.batch_size)
        return planned.orderBy("pos").drop("pos", "batch_id")

    def get_epoch_iterator(self, as_dict: bool = True) -> Iterator:
        """One pass over the data in this epoch's order, batched."""
        epoch = self._epoch
        self._epoch += 1
        cols = self.df.columns

        def gen():
            buf: list[tuple] = []
            for row in self._epoch_df(epoch).toLocalIterator(prefetchPartitions=True):
                buf.append(tuple(row))
                if len(buf) == self.batch_size:
                    yield self._to_batch(buf, cols, as_dict)
                    buf = []
            if buf:
                yield self._to_batch(buf, cols, as_dict)

        return gen()

    def iterate_epochs(self, as_dict: bool = True) -> Iterator[Iterator]:
        while True:
            yield self.get_epoch_iterator(as_dict=as_dict)

    def reset(self) -> None:
        self._epoch = 0

    @staticmethod
    def _to_batch(rows: list[tuple], cols: list[str], as_dict: bool):
        arrays = [np.asarray(col) for col in zip(*rows)]
        if as_dict:
            return dict(zip(cols, arrays))
        return tuple(arrays)
