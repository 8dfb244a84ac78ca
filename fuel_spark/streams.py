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

    def _planned(self, epoch: int) -> DataFrame:
        if self.shuffled:
            return schemes.shuffled_batches(
                self.df, self.key, self.batch_size, seed=self.seed + epoch
            )
        return schemes.sequential_batches(self.df, self.key, self.batch_size)

    def _epoch_df(self, epoch: int, from_batch: int = 0) -> DataFrame:
        planned = self._planned(epoch)
        if from_batch:
            # batch ids are a deterministic function of (key, seed,
            # epoch), so "resume at batch k" is a plain filter Catalyst
            # pushes toward the scan — no driver-side iterator state to
            # pickle (fuel serializes the in-flight iterator instead:
            # reference fuel/iterator.py:8, tests/test_serialization.py).
            planned = planned.where(planned["batch_id"] >= from_batch)
        return planned.orderBy("pos").drop("pos", "batch_id")

    def _batched_iter(self, epoch: int, from_batch: int, as_dict: bool) -> Iterator:
        cols = self.df.columns

        def gen():
            buf: list[tuple] = []
            df = self._epoch_df(epoch, from_batch)
            for row in df.toLocalIterator(prefetchPartitions=True):
                buf.append(tuple(row))
                if len(buf) == self.batch_size:
                    yield self._to_batch(buf, cols, as_dict)
                    buf = []
            if buf:
                yield self._to_batch(buf, cols, as_dict)

        return gen()

    def get_epoch_iterator(self, as_dict: bool = True) -> Iterator:
        """One pass over the data in this epoch's order, batched."""
        epoch = self._epoch
        self._epoch += 1
        return self._batched_iter(epoch, 0, as_dict)

    def resume(
        self, epoch: int, batch_index: int, as_dict: bool = True
    ) -> Iterator:
        """Mid-epoch resume: the remainder of epoch ``epoch`` starting
        at minibatch ``batch_index`` — identical batches, in order, to
        what an uninterrupted epoch iterator would have produced from
        that point (fuel's checkpoint/restore contract, without
        serializing an iterator: the cursor IS the state).

        Also re-aims the stream so the next ``get_epoch_iterator``
        yields epoch ``epoch + 1`` — resuming a training job mid-epoch
        then continuing is seamless.
        """
        self._epoch = epoch + 1
        return self._batched_iter(epoch, batch_index, as_dict)

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
